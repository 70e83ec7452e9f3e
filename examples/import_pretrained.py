"""Import the reference's pretrained Keras ``.h5`` models.

The reference ships pretrained weights (``models/emulator.h5`` for the
direct emulator, three files for the AE-based emulator — reference
``emulator.py:319-337, 667-699``). This framework reads them with h5py
directly (no TensorFlow needed) into JAX pytrees
(:mod:`tpu21cmvae.models.io_keras`), then re-saves them as native
checkpoints that bundle the normalization constants — after which the
original training data is no longer needed for inference.

Usage:
    python examples/import_pretrained.py --models-dir /path/to/models \
        --dataset dataset_21cmVAE.h5 --out ae_emulator.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from tpu21cmvae import AutoEncoderEmulator, DirectEmulator
from tpu21cmvae.data import load_dataset, synthetic_dataset


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--models-dir",
        default="/root/reference/VeryAccurateEmulator/models",
        help="the reference's models/ directory",
    )
    ap.add_argument("--dataset", help="dataset_21cmVAE.h5 for the true "
                    "normalization constants (else synthetic surrogate)")
    ap.add_argument("--out", default="imported_ae_emulator.npz")
    args = ap.parse_args()

    # The normalization statistics are NOT stored in the Keras h5 files —
    # the reference recomputes them from the training split on every call
    # (reference preprocess.py:88-101). With the real dataset the imported
    # model reproduces the published predictions exactly; with the
    # synthetic surrogate only the wiring is demonstrated.
    data = (
        load_dataset(args.dataset)
        if args.dataset
        else synthetic_dataset(n_train=1024, n_val=128, n_test=128, seed=0)
    )

    ae_dir = os.path.join(args.models_dir, "autoencoder_based_emulator")
    model = AutoEncoderEmulator.from_keras_h5(
        os.path.join(ae_dir, "ae_emulator.h5"),
        os.path.join(ae_dir, "encoder.h5"),
        os.path.join(ae_dir, "decoder.h5"),
        data=data,
    )
    print(f"imported AE emulator: latent_dim={model.config.latent_dim}, "
          f"em={model.config.em_hidden_dims}")
    pred = model.predict(data.par_test[:4])
    print(f"predict OK: {pred.shape}, finite={np.isfinite(pred).all()}")

    model.save(args.out)
    print(f"re-saved as native checkpoint (weights + normalizer): {args.out}")
    reloaded = AutoEncoderEmulator.from_checkpoint(args.out)
    assert np.allclose(reloaded.predict(data.par_test[:4]), pred)
    print("checkpoint round trip verified (no training data needed)")

    direct_h5 = os.path.join(args.models_dir, "emulator.h5")
    if os.path.exists(direct_h5):
        direct = DirectEmulator.from_keras_h5(direct_h5, data=data)
        print(f"imported direct emulator: {direct.config.hidden_dims}")
    else:
        print(f"(direct emulator.h5 not present at {direct_h5} — skipped)")


if __name__ == "__main__":
    main()
