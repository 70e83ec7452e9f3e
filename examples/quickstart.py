"""Quickstart: emulate global 21-cm signals end-to-end.

The script equivalent of the reference's ``notebooks/sample_notebook.ipynb``
walkthrough (load → predict → evaluate → band errors), runnable headless.
By default it trains a small model on the built-in synthetic dataset so it
works fully offline; point ``--dataset`` at a real ``dataset_21cmVAE.h5``
(download via ``tpu21cmvae.data.download_dataset``) to reproduce the
published-accuracy workflow.

Usage:
    python examples/quickstart.py                     # synthetic, offline
    python examples/quickstart.py --pretrained        # shipped checkpoint, no training
    python examples/quickstart.py --dataset /path/to/dataset_21cmVAE.h5
    python examples/quickstart.py --checkpoint model.npz   # reuse a model
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpu21cmvae import DirectEmulator
from tpu21cmvae.data import load_dataset, synthetic_dataset
from tpu21cmvae.utils.config import TrainConfig


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", help="path to dataset_21cmVAE.h5 (else synthetic)")
    ap.add_argument("--checkpoint", help="load/save model checkpoint (.npz)")
    ap.add_argument("--pretrained", action="store_true",
                    help="use the shipped pretrained/direct_synthetic.npz")
    ap.add_argument("--epochs", type=int, default=60)
    args = ap.parse_args()
    if args.pretrained:
        if args.checkpoint:
            ap.error("--pretrained and --checkpoint are mutually exclusive")
        args.checkpoint = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "pretrained", "direct_synthetic.npz",
        )
        if not os.path.exists(args.checkpoint):
            ap.error(f"shipped checkpoint not found: {args.checkpoint}")

    data = (
        load_dataset(args.dataset)
        if args.dataset
        else synthetic_dataset(n_train=4096, n_val=512, n_test=512, seed=0)
    )
    print(f"dataset: {data.par_train.shape[0]} train / "
          f"{data.par_val.shape[0]} val / {data.par_test.shape[0]} test")

    if args.checkpoint and os.path.exists(args.checkpoint):
        model = DirectEmulator.from_checkpoint(args.checkpoint, data)
        print(f"loaded {args.checkpoint}")
    else:
        model = DirectEmulator(data)
        print(f"training {args.epochs} epochs (reference recipe, shortened)...")
        loss, val_loss = model.train(
            train_config=TrainConfig(epochs=args.epochs), verbose=True
        )
        print(f"final val_loss={val_loss[-1]:.3e} after {len(val_loss)} epochs")
        if args.checkpoint:
            model.save(args.checkpoint)
            print(f"saved {args.checkpoint}")

    # single signal: a 7-parameter draw → 451-bin δT(z) curve in mK
    one = model.predict(data.par_test[0])
    print(f"single predict: shape {one.shape}, "
          f"trough {one.min():.1f} mK at z={model.redshifts[one.argmin()]:.1f}")

    # full-test-set error, the paper's Eq. 1 metric
    rel = model.test_error(relative=True)
    abs_mk = model.test_error(relative=False)
    print(f"test error: mean {rel.mean():.3f}% / median {np.median(rel):.3f}% "
          f"(abs: {abs_mk.mean():.3f} mK)")

    # band-restricted error, e.g. the EDGES band 50-100 MHz
    band = model.test_error(relative=False, flow=50.0, fhigh=100.0)
    print(f"50-100 MHz band: mean {band.mean():.3f} mK")

    # Fisher forecast at a fiducial: exact forward-mode Jacobians give
    # the Cramér–Rao 1-σ bounds for a σ=5 mK-per-bin experiment —
    # something the gradient-free reference cannot compute
    _, sigma = model.fisher_forecast(data.par_test[0], noise_var=25.0)
    print("Fisher 1-σ forecast:",
          ", ".join(f"{l}={s:.3g}" for l, s in zip(model.par_labels, sigma)))


if __name__ == "__main__":
    main()
