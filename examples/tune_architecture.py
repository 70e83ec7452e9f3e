"""Architecture search with the hyperparameter tuner.

The capability the reference advertises ("modules for hyperparameter
tuning", reference ``README.rst:13``) but ships no code for — this is how
the 7→288→352→288→224→451 flagship architecture was found in the paper.

Usage:
    python examples/tune_architecture.py --trials 10
    python examples/tune_architecture.py --family ae --trials 8
"""

from __future__ import annotations

import argparse

import numpy as np

from tpu21cmvae.data import load_dataset, synthetic_dataset
from tpu21cmvae.tuner import (
    LatentSearchSpace,
    SearchSpace,
    retrain_best,
    tune_autoencoder,
    tune_autoencoder_halving,
    tune_direct,
    tune_direct_halving,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", choices=["direct", "ae"], default="direct")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--dataset", help="path to dataset_21cmVAE.h5 (else synthetic)")
    ap.add_argument("--retrain", action="store_true",
                    help="retrain the winner with the full recipe")
    ap.add_argument("--halving", action="store_true",
                    help="successive halving instead of plain random search")
    args = ap.parse_args()

    data = (
        load_dataset(args.dataset)
        if args.dataset
        else synthetic_dataset(n_train=4096, n_val=512, n_test=512, seed=0)
    )

    if args.family == "direct":
        if args.halving:
            result = tune_direct_halving(
                data, n_initial=args.trials, verbose=True
            )
        else:
            result = tune_direct(
                data, n_trials=args.trials, space=SearchSpace(), verbose=True
            )
    else:
        if args.halving:
            result = tune_autoencoder_halving(
                data, n_initial=args.trials, verbose=True
            )
        else:
            result = tune_autoencoder(
                data, n_trials=args.trials, space=LatentSearchSpace(), verbose=True
            )

    print("\nleaderboard:")
    print(result.leaderboard())
    print(f"\nbest: {result.best.config}")

    if args.retrain:
        model = retrain_best(result, data)
        err = model.test_error()
        print(f"retrained winner: mean test error {np.mean(err):.3f}%")


if __name__ == "__main__":
    main()
