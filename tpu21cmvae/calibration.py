"""Simulation-based calibration of the on-device inference stack.

SBC (Talts et al. 2018, arXiv:1804.06788) is the end-to-end correctness
test for a Bayesian pipeline: draw parameters from the prior, simulate
observations through the forward model, sample each posterior, and rank
the true parameter among the posterior draws. If — and only if — the
sampler targets the correct posterior, the ranks are uniform for EVERY
statistic; a biased likelihood tier, a broken prior term, or an
unconverged sampler all show up as rank-histogram slopes/humps. The
reference has nothing like this (its users' sampler correctness rests
on emcee + hand-glued likelihoods; reference ``README.rst:9-11``).

The usual obstacle is cost — hundreds of full posterior runs. Here the
whole study is TWO device programs: one batched predict for the
simulated observations, one stacked-observation chain
(:meth:`DirectEmulator.sample_posterior_batch` /
:func:`tpu21cmvae.ops.loglik.make_loglik_multi`) that advances all
``n_sims`` posteriors' walkers in every fused likelihood batch — the
mega-batch shape the MXU wants. Ranks use each simulation's FINAL kept
step across walkers: the MH/HMC ensembles evolve walkers independently
(no cross-walker moves), so after warmup those are approximately
independent posterior draws, which is exactly what SBC's uniformity
statement assumes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["SBCResult", "sbc"]


@dataclasses.dataclass
class SBCResult:
    """Rank statistics from one SBC study.

    ``ranks``: ``(n_sims, n_params)`` integer rank of the true
    parameter among ``n_posterior`` posterior draws — uniform on
    ``{0, …, n_posterior}`` iff the pipeline is calibrated.
    ``pvalues``: per-parameter KS test of the (tie-broken, normalized)
    ranks against U(0,1); with a calibrated pipeline these are
    themselves uniform, so a single small value among 7 parameters is
    expected noise — act on systematic smallness. ``thetas`` /
    ``n_posterior`` record the study inputs."""

    ranks: np.ndarray
    n_posterior: int
    pvalues: np.ndarray
    thetas: np.ndarray

    @property
    def normalized(self) -> np.ndarray:
        """Ranks mapped to (0, 1) with deterministic mid-tie placement
        (rank + 0.5) / (n + 1) — the KS-test input."""
        return (self.ranks + 0.5) / (self.n_posterior + 1.0)

    def summary(self, labels=None) -> str:
        labels = labels or [f"p{i}" for i in range(self.ranks.shape[1])]
        lines = [
            f"  {lab:>8}: KS p = {p:.3f}"
            for lab, p in zip(labels, self.pvalues)
        ]
        verdict = (
            "calibrated (no parameter rejects uniformity at 0.01)"
            if (self.pvalues > 0.01).all()
            else "NOT calibrated — investigate the flagged parameters"
        )
        return (
            f"SBC over {self.ranks.shape[0]} simulations, "
            f"{self.n_posterior} posterior draws each: {verdict}\n"
            + "\n".join(lines)
        )


def _ks_uniform_pvalue(u: np.ndarray) -> float:
    """One-sample KS test p-value against U(0,1) (asymptotic Kolmogorov
    distribution — standard SBC sample counts are far past its n≳35
    validity range)."""
    u = np.sort(np.asarray(u, np.float64))
    n = len(u)
    grid = np.arange(1, n + 1) / n
    d = float(np.max(np.maximum(grid - u, u - (grid - 1.0 / n))))
    t = (np.sqrt(n) + 0.12 + 0.11 / np.sqrt(n)) * d
    j = np.arange(1, 101)
    p = 2.0 * np.sum((-1.0) ** (j - 1) * np.exp(-2.0 * (j * t) ** 2))
    return float(min(max(p, 0.0), 1.0))


def sbc(
    model,
    *,
    n_sims: int = 128,
    n_walkers: int = 64,
    n_steps: int = 300,
    n_warmup: int = 300,
    thin: int = 10,
    noise_var: float = 25.0,
    bounds=None,
    sampler: str = "mh",
    seed: int = 0,
    prior=None,
    **kwargs,
) -> SBCResult:
    """Run an SBC study against ``model``'s own forward model.

    ``model``: anything exposing ``predict`` and
    ``sample_posterior_batch`` (the direct family). Truth draws are
    uniform over ``bounds`` (the flat box prior the samplers target;
    defaults to the 21cmGEM-shaped ranges), observations are
    ``predict(θ) + N(0, noise_var)`` — the same noise the likelihood
    assumes, closing the self-consistency loop SBC tests. ``n_walkers``
    is per simulation; ranks use the final kept step's walkers (see
    module docstring), so ``n_walkers`` sets the rank resolution.
    ``kwargs`` forward to :meth:`sample_posterior_batch` (e.g.
    ``mesh=`` to shard the ``n_sims · n_walkers`` stacked walker axis).

    ``prior``: optional :class:`tpu21cmvae.priors.GaussianBoxPrior` —
    truths are then drawn FROM that prior (via its exact unit-cube
    transform) and the chains target ``L·π`` (its ``log_prior`` is
    passed to the sampler), so the study certifies the informative-
    prior machinery end to end: a prior used for drawing but not
    sampling (or vice versa) shows up as sloped rank histograms.
    """
    import jax
    import jax.numpy as jnp

    from tpu21cmvae.sampling import _resolve_bounds

    lo, hi = _resolve_bounds(bounds)
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    if bounds is None:
        bounds = np.stack([lo, hi], axis=1)
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n_sims, lo.shape[0]))
    if prior is not None:
        thetas = np.asarray(
            jax.jit(prior.prior_transform)(jnp.asarray(u, jnp.float32)),
            np.float32,
        )
        kwargs.setdefault("log_prior", prior.log_prior)
    else:
        thetas = (lo + (hi - lo) * u).astype(np.float32)
    clean = np.atleast_2d(np.asarray(model.predict(thetas)))
    obs = clean + rng.normal(0.0, np.sqrt(noise_var), clean.shape)

    res = model.sample_posterior_batch(
        obs, noise_var, sampler=sampler, n_walkers=n_walkers,
        bounds=bounds, n_steps=n_steps, n_warmup=n_warmup, thin=thin,
        seed=seed + 1, **kwargs,
    )
    if res.chain.shape[0] == 0:
        raise ValueError("sbc needs a stored chain; run with thin > 0")
    draws = res.chain[-1]  # (n_sims, n_walkers, n_params) — final step
    ranks = (draws < thetas[:, None, :]).sum(axis=1)
    u = (ranks + 0.5) / (n_walkers + 1.0)
    pvalues = np.array([_ks_uniform_pvalue(u[:, j])
                        for j in range(u.shape[1])])
    return SBCResult(
        ranks=ranks, n_posterior=n_walkers, pvalues=pvalues, thetas=thetas
    )
