"""Constrained inference and signal reconstruction: an external
Gaussian prior (Planck-style tau constraint) through the full stack,
then the posterior-predictive credible band of the 21-cm signal.

Real 21-cm analyses rarely run flat-box-only posteriors — optical depth
is pinned by CMB data, and the reconstructed signal with its credible
band is the headline figure. The reference leaves both to the user's
hand-rolled sampler glue (its emulator is the bare forward model,
reference ``README.rst:9-11``); here they are one spec and two calls:

1. :class:`tpu21cmvae.priors.GaussianBoxPrior` — one prior spec feeds
   every consumer: the smooth ``log_prior`` density for the chain
   samplers and the MAP fitter, and the unit-cube ``prior_transform``
   (MultiNest/dynesty convention) for nested-sampling evidence.
2. :func:`tpu21cmvae.sampling.posterior_predictive` (via
   ``model.posterior_predictive``) — flat chain in, per-frequency-bin
   quantile band of the emulated signal out.

Usage:
    python examples/priors_and_bands.py --walkers 1024 --steps 300
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_params
from tpu21cmvae.priors import GaussianBoxPrior

from hmc_inference import load_model  # shipped-checkpoint-or-toy loader

TAU = 3  # parameter index of the optical depth

def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--walkers", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--tau-sigma", type=float, default=0.004,
                    help="Gaussian prior width on tau (Planck 2018 "
                         "quotes tau = 0.054 +/- 0.007)")
    ap.add_argument("--retrain", action="store_true",
                    help="train a toy model inline instead of loading "
                         "the shipped checkpoint")
    ap.add_argument("--train-epochs", type=int, default=40)
    args = ap.parse_args()

    model = load_model(args.retrain, args.train_epochs)

    rng = np.random.default_rng(7)
    truth = synthetic_params(1, rng)[0].astype(np.float32)
    obs = model.predict(truth) + rng.normal(0, 5.0, 451)
    noise_var = 25.0

    # One prior spec, centered on the true tau to mimic an external
    # measurement of this synthetic sky; every consumer below reuses it.
    prior = GaussianBoxPrior.for_params(
        {TAU: (float(truth[TAU]), args.tau_sigma)}, bounds=PAR_RANGES
    )

    # ---- posterior with and without the constraint -------------------
    common = dict(
        sampler="mh", bounds=PAR_RANGES, n_walkers=args.walkers,
        n_steps=args.steps, n_warmup=args.warmup, thin=10, seed=1,
    )
    t0 = time.perf_counter()
    flat_res = model.sample_posterior(obs, noise_var, **common)
    con_res = model.sample_posterior(
        obs, noise_var, log_prior=prior.log_prior, **common
    )
    print(f"two posteriors in {time.perf_counter() - t0:.2f}s "
          f"(incl. compile)")
    f, c = flat_res.flat, con_res.flat
    print(f"tau truth {truth[TAU]:.4f}; flat-prior posterior "
          f"{f[:, TAU].mean():.4f} ± {f[:, TAU].std():.4f}; "
          f"constrained {c[:, TAU].mean():.4f} ± {c[:, TAU].std():.4f}")

    # ---- evidence under the informative prior -------------------------
    # nested sampling consumes the TRANSFORM view: exploration happens
    # in the unit cube where the Gaussian prior is uniform, keeping the
    # volume bookkeeping exact
    t0 = time.perf_counter()
    ev_flat = model.log_evidence(obs, noise_var, bounds=PAR_RANGES, seed=2)
    ev_con = model.log_evidence(
        obs, noise_var, bounds=PAR_RANGES, seed=2,
        prior_transform=prior.prior_transform,
    )
    print(f"evidence in {time.perf_counter() - t0:.2f}s: "
          f"flat prior logZ = {ev_flat.logz:.2f} ± {ev_flat.logz_err:.2f}, "
          f"tau-constrained logZ = {ev_con.logz:.2f} ± "
          f"{ev_con.logz_err:.2f}")

    # ---- reconstructed-signal credible band ---------------------------
    band = model.posterior_predictive(con_res.flat)
    true_sig = model.predict(truth)
    cover = float(((true_sig >= band.bands[0]) &
                   (true_sig <= band.bands[2])).mean())
    width = float((band.bands[2] - band.bands[0]).mean())
    print(f"posterior-predictive 68% band: mean width {width:.2f} mK, "
          f"covers the true curve over {100 * cover:.0f}% of bins")
    # with observation noise folded in, the band describes the DATA
    noisy = model.posterior_predictive(
        con_res.flat, noise_var=noise_var, seed=3
    )
    print(f"with observation noise: mean width "
          f"{float((noisy.bands[2] - noisy.bands[0]).mean()):.2f} mK")


if __name__ == "__main__":
    main()
