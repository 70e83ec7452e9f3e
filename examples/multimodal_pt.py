"""Multimodal posteriors: parallel tempering vs single-temperature MH.

21-cm parameter posteriors can be genuinely multimodal — e.g. a
reflection/exchange degeneracy where two distinct astrophysical
scenarios fit the observed spectrum equally well. Single-temperature
chain samplers (MH / stretch-move / HMC) then go METASTABLE: each
walker stays in whichever basin initialization dropped it in, so the
recovered mode *weights* are the initialization split, not the
posterior's. The reference leaves sampling to external packages
entirely (reference ``README.rst:9-11``, ~25 likelihood evals/s).

This demo constructs a controlled two-mode posterior from the real
emulator likelihood — the true mode plus a mirrored replica of itself
in the tau axis, down-weighted ×4 (an 80/20 split) — and shows:

* plain MH freezes near the 50/50 initialization split;
* ``sample_pt`` (a geometric temperature ladder with likelihood-free
  replica exchange every sweep, all on device) recovers the 80/20
  weights, because hot rungs cross the barrier freely and exchange
  transports those states down to the cold chain.

Both samplers consume the SAME fused likelihood; the custom two-mode
``loglik(params, x)`` shows the samplers accept any JAX-traceable
log-density, not just the built-in emulator ones.

Usage:
    python examples/multimodal_pt.py --walkers 512 --steps 400
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_params
from tpu21cmvae.sampling import sample_mh, sample_pt

from hmc_inference import load_model  # shipped-checkpoint-or-toy loader

TAU = 3  # index of tau in the 7-parameter vector


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--walkers", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1200,
                    help="mode-weight convergence is transport-limited "
                         "(~O(1000) sweeps); seconds on TPU, minutes "
                         "on CPU")
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--rungs", type=int, default=32)
    ap.add_argument("--retrain", action="store_true",
                    help="train a toy model inline instead of loading "
                         "the shipped checkpoint")
    ap.add_argument("--train-epochs", type=int, default=40)
    args = ap.parse_args()

    model = load_model(args.retrain, args.train_epochs)

    rng = np.random.default_rng(1)
    lo = PAR_RANGES[:, 0].astype(np.float32)
    hi = PAR_RANGES[:, 1].astype(np.float32)
    truth = synthetic_params(1, rng)[0].astype(np.float32)
    # keep the mirror mode well inside the box AND well separated
    truth[TAU] = lo[TAU] + 0.25 * (hi[TAU] - lo[TAU])
    obs = jnp.asarray(
        model.predict(truth) + rng.normal(0, 2.0, 451), jnp.float32
    )
    base = model.loglik_fn(obs, noise_var=4.0)

    mirror_sum = lo[TAU] + hi[TAU]
    w_true = 0.8  # true weight of the un-mirrored mode

    def loglik(params, x):
        """Two-mode posterior: L(x) + (1/4)·L(x mirrored in tau)."""
        xm = x.at[:, TAU].set(mirror_sum - x[:, TAU])
        return jnp.logaddexp(
            jnp.log(w_true) + base(params, x),
            jnp.log(1.0 - w_true) + base(params, xm),
        )

    bounds = np.stack([lo, hi], axis=1)
    mid_tau = 0.5 * mirror_sum

    def mode_split(flat):
        return float((flat[:, TAU] < mid_tau).mean())

    common = dict(
        n_walkers=args.walkers, n_steps=args.steps, n_warmup=args.warmup,
        thin=10, bounds=bounds, seed=0,
    )

    print(f"true mode split: {w_true:.2f} / {1 - w_true:.2f} "
          f"(mirror in tau around {mid_tau:.4f})")

    mh = sample_mh(loglik, model.params, **common)
    print(f"plain MH:  split {mode_split(mh.flat):.3f} "
          f"(frozen near the ~0.5 init split — metastable)")

    pt = sample_pt(loglik, model.params, n_rungs=args.rungs, **common)
    # the split is transport-limited early; score the second half
    late = pt.chain[pt.chain.shape[0] // 2:].reshape(-1, lo.shape[0])
    print(f"PT ({args.rungs} rungs): split {mode_split(late):.3f} "
          f"(true {w_true:.2f}; the toy emulator's own likelihood "
          f"leaks ~2 % across the midpoint, so ~0.79 is exact here)")
    print(f"  per-edge swap rates: "
          f"{np.array2string(pt.swap_rate, precision=2)}")
    if pt.swap_rate.min() < 0.05:
        print("  WARNING: a ladder edge barely swaps — add rungs "
              "(--rungs) or lower beta_min.")


if __name__ == "__main__":
    main()
