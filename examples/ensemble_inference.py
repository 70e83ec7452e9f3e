"""Uncertainty-aware posterior inference with a deep ensemble.

A single emulator's posterior is overconfident: it treats the network's
own emulation error as zero. The :class:`~tpu21cmvae.DeepEnsemble`
marginalizes that error — its likelihood is the equal-weight MIXTURE
over seed replicas (``logsumexp_m logL_m − log M``), so wherever the
members disagree the target flattens and the credible regions honestly
widen. The reference has no uncertainty channel at all (reference
``emulator.py:409-439`` only reports test-set statistics), let alone an
inference stack that propagates it.

This script samples the SAME observation twice — once under member 0
alone, once under the shipped 3-member mixture — and reports the
per-parameter posterior-width ratio. The member axis rides a ``vmap``
inside the likelihood, so the mixture chain costs ~M× the matmul FLOPs
of the single-model chain but the same number of device calls.

Usage:
    python examples/ensemble_inference.py --walkers 1024 --steps 300
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from tpu21cmvae import DeepEnsemble
from tpu21cmvae.data.synthetic import synthetic_params

ENSEMBLE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "ensemble_direct",
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ensemble", default=ENSEMBLE_DIR,
                    help="directory of member_*.npz checkpoints")
    ap.add_argument("--walkers", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=150)
    ap.add_argument("--noise-mk", type=float, default=5.0,
                    help="per-bin observation noise σ in mK")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ens = DeepEnsemble.load(args.ensemble)
    member = ens.members[0]
    labels = list(ens.par_labels)

    rng = np.random.default_rng(args.seed + 1)
    truth = synthetic_params(1, rng)[0].astype(np.float32)
    obs = ens.predict(truth) + rng.normal(0, args.noise_mk, 451)
    obs = np.asarray(obs, np.float32)
    noise_var = float(args.noise_mk) ** 2

    kwargs = dict(
        sampler="mh", n_walkers=args.walkers, n_steps=args.steps,
        n_warmup=args.warmup, thin=5, seed=args.seed,
    )
    runs = {}
    for name, model in (("member-0", member), ("mixture", ens)):
        t0 = time.perf_counter()
        res = model.sample_posterior(obs, noise_var, **kwargs)
        res.flat  # block on the chain
        runs[name] = res
        print(f"{name}: accept {float(res.accept_rate.mean()):.2f}, "
              f"{time.perf_counter() - t0:.1f} s")

    single = runs["member-0"].flat
    mix = runs["mixture"].flat
    print(f"\n{'parameter':>10} {'truth':>10} {'member-0':>22} "
          f"{'mixture':>22} {'σ ratio':>8}")
    for j, lab in enumerate(labels):
        s_m, s_x = single[:, j].std(), mix[:, j].std()
        print(f"{lab:>10} {truth[j]:>10.3g} "
              f"{single[:, j].mean():>11.3g} ± {s_m:<8.3g} "
              f"{mix[:, j].mean():>11.3g} ± {s_x:<8.3g} "
              f"{s_x / s_m:>8.2f}")
    print("\nσ ratio > 1: the mixture posterior has widened by the "
          "emulation error the member spread measures (ratios near 1 "
          "mean the members agree there — the data, not the emulator, "
          "sets the width).")


if __name__ == "__main__":
    main()
