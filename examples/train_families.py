"""Training recipes for all three emulator families.

The script equivalent of the reference's ``notebooks/Training.ipynb``:
the exact published recipes (Adam learning rates, EarlyStopping +
ReduceLROnPlateau settings, epoch budgets — reference Training.ipynb
cells 4-5 and 10-11) are the framework's default ``TrainConfig`` presets,
so each family trains with one call. Adds the VAE family the reference
names but never shipped (SURVEY.md §0).

Usage:
    python examples/train_families.py direct --epochs 100
    python examples/train_families.py ae
    python examples/train_families.py vae --beta 0.01
    python examples/train_families.py direct --dataset dataset_21cmVAE.h5 \
        --checkpoint-dir ckpts/   # preemption-safe; rerun resumes
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from tpu21cmvae import AutoEncoderEmulator, DirectEmulator, VAEEmulator
from tpu21cmvae.data import load_dataset, synthetic_dataset
from tpu21cmvae.utils.config import (
    AE_EMULATOR_TRAIN_DEFAULT,
    AE_TRAIN_DEFAULT,
    DIRECT_TRAIN_DEFAULT,
    VAEConfig,
)


def get_data(args):
    return (
        load_dataset(args.dataset)
        if args.dataset
        else synthetic_dataset(n_train=4096, n_val=512, n_test=512, seed=0)
    )


def run_direct(args):
    data = get_data(args)
    model = DirectEmulator(data)
    cfg = dataclasses.replace(DIRECT_TRAIN_DEFAULT, epochs=args.epochs)
    model.train(
        train_config=cfg,
        verbose=not args.device_loop,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.checkpoint_dir is not None,
        device_loop=args.device_loop,
    )
    report(model.test_error(), "direct")
    if args.save:
        model.save(args.save)


def run_ae(args):
    data = get_data(args)
    model = AutoEncoderEmulator(data)
    ae_cfg = dataclasses.replace(AE_TRAIN_DEFAULT, epochs=args.epochs)
    em_cfg = dataclasses.replace(AE_EMULATOR_TRAIN_DEFAULT, epochs=args.epochs)
    model.train(ae_train_config=ae_cfg, em_train_config=em_cfg,
                verbose=not args.device_loop, device_loop=args.device_loop)
    report(model.test_error(), "ae-emulator")
    report(model.test_error(use_autoencoder=True), "ae-reconstruction")
    if args.save:
        model.save(args.save)


def run_vae(args):
    data = get_data(args)
    cfg = VAEConfig() if args.beta is None else VAEConfig(beta=args.beta)
    model = VAEEmulator(data, config=cfg)
    vae_cfg = dataclasses.replace(AE_TRAIN_DEFAULT, epochs=args.epochs)
    em_cfg = dataclasses.replace(AE_EMULATOR_TRAIN_DEFAULT, epochs=args.epochs)
    model.train(vae_train_config=vae_cfg, em_train_config=em_cfg,
                verbose=not args.device_loop, device_loop=args.device_loop)
    report(model.test_error(), "vae-emulator")
    report(model.test_error(use_vae=True), "vae-reconstruction")
    # the interpretable-latent-space analysis the VAE exists for:
    import jax

    traversal = model.latent_traversal(dim=0, values=np.linspace(-2, 2, 5))
    print(f"latent-0 traversal: 5 curves, trough range "
          f"[{traversal.min(axis=1).min():.1f}, {traversal.min(axis=1).max():.1f}] mK")
    samples = model.sample_signals(jax.random.key(0), 4)
    print(f"prior samples: {samples.shape}")
    if args.save:
        model.save(args.save)


def report(err, name):
    print(f"{name}: mean {err.mean():.3f}% / median {np.median(err):.3f}% "
          f"/ max {err.max():.3f}%")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family", choices=["direct", "ae", "vae"])
    ap.add_argument("--dataset", help="path to dataset_21cmVAE.h5 (else synthetic)")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--beta", type=float, default=None,
                    help="VAE KL weight (default: the tuned VAEConfig value; beta >= 0.1 collapses the posterior — see utils/config.py)")
    ap.add_argument("--save", help="save trained model checkpoint (.npz)")
    ap.add_argument("--checkpoint-dir", help="periodic checkpoints + resume (direct)")
    ap.add_argument("--device-loop", action="store_true",
                    help="train as ONE XLA program (no per-epoch host syncs)")
    args = ap.parse_args()
    {"direct": run_direct, "ae": run_ae, "vae": run_vae}[args.family](args)


if __name__ == "__main__":
    main()
