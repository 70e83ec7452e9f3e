"""Automatic-differentiation variational inference (ADVI) — fast
approximate posteriors over the same fused value+gradient path the HMC
sampler and ML fitter ride.

The reference community's workflow is hours of emcee around 40 ms
``predict`` calls (reference ``README.rst:9-11``); the MCMC stack here
already collapses that to seconds. ADVI is the next rung down in
latency: a full-rank Gaussian posterior approximation fitted by
stochastic gradient ascent on the ELBO (Kucukelbir et al. 2017, JMLR
18) — hundreds of optimizer steps, each one batched
``valgrad`` call, giving a mean + covariance (and cheap iid draws) in a
fraction of a chain's wall time. Use it for quick-look posteriors,
Laplace-quality error bars away from hard box edges, and warm starts
(``sample_posterior(..., x0=res.sample(n_walkers))``); use the chain
samplers when the posterior may be non-Gaussian in the whitened space.

TPU shape: the whole fit is ONE ``lax.scan`` device program; each step
evaluates ``n_mc`` reparameterized draws through the fused
value+gradient kernel — the same mega-batch economics as everything
else in this framework (a 512-draw step costs microseconds at the
measured ~4×10⁷ ∇logL evals/s, docs/PERF.md).

Design notes (mirrors :func:`tpu21cmvae.sampling.fit_map` /
``sample_hmc``):

* The Gaussian lives in the sigmoid-whitened UNBOUNDED space
  ``y = logit((x − lo)/span)`` — draws can never leave the prior box,
  and the Jacobian ``Σ log(span·s·(1−s))`` is part of the target (this
  is exactly Stan's ADVI transform for box constraints).
* Gradients are reparameterized (``y = μ + Lε``): the integrand's
  y-gradient needs only the FIRST-order ``valgrad`` — no
  differentiating through the emulator twice.
* ``L`` is parameterized as ``tril(A, −1) + diag(exp(d))`` so the
  entropy is ``Σ d + const`` and positivity is structural.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.sampling import (
    _resolve_bounds,
    _whitened_center,
    _whitened_vi_target,
)

__all__ = ["ADVIResult", "fit_advi"]


@dataclasses.dataclass
class ADVIResult:
    """Fitted full-rank Gaussian posterior approximation (whitened
    space) from :func:`fit_advi`.

    ``mu`` / ``chol``: variational mean and Cholesky factor in the
    whitened space (diagnostic); ``elbo``: per-step ELBO estimates —
    a flat tail means converged, a climbing tail means raise
    ``n_steps``. User-facing views are in RAW parameter units:
    :meth:`sample` (iid draws — no autocorrelation, no thinning),
    :meth:`mean` / :meth:`std` (moments of the drawn cloud).
    """

    mu: np.ndarray
    chol: np.ndarray
    elbo: np.ndarray
    _lo: np.ndarray
    _hi: np.ndarray

    def sample(self, n: int, seed: int = 0) -> np.ndarray:
        """``n`` iid raw-parameter draws from the fitted posterior."""
        rng = np.random.default_rng(seed)
        eps = rng.standard_normal((n, self.mu.shape[0]))
        y = self.mu + eps @ self.chol.T
        s = 1.0 / (1.0 + np.exp(-y))
        return (self._lo + (self._hi - self._lo) * s).astype(np.float32)

    def mean(self, n: int = 65536, seed: int = 0) -> np.ndarray:
        return self.sample(n, seed).mean(0)

    def std(self, n: int = 65536, seed: int = 0) -> np.ndarray:
        return self.sample(n, seed).std(0)


def fit_advi(
    valgrad,
    params,
    *,
    n_steps: int = 600,
    n_mc: int = 512,
    bounds=None,
    learning_rate: float = 0.05,
    seed: int = 0,
    x0=None,
    log_prior=None,
) -> ADVIResult:
    """Fit a full-rank Gaussian posterior approximation by ADVI.

    ``valgrad(params, raw) → (logL, ∇logL)`` — the fused
    value+gradient path (``model.loglik_and_grad_fn``). ``x0``:
    optional raw-space center to initialize the variational mean at
    (e.g. ``fit_map(...).best`` — an ML warm start typically halves
    the steps to convergence); default is the box center. ``log_prior``
    adds a smooth prior to the target (the fit approximates ``L·π``).
    Returns an :class:`ADVIResult`.
    """
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    span = hi - lo
    if x0 is not None:
        mu0 = _whitened_center(x0, lo, hi)
    else:
        mu0 = jnp.zeros((n_params,), jnp.float32)
    # start wide (sigmoid(±1.5) spans ~60% of the box) so early steps
    # see the whole landscape, not one basin wall
    d0 = jnp.full((n_params,), jnp.log(1.5), jnp.float32)
    a0 = jnp.zeros((n_params, n_params), jnp.float32)
    key = jax.random.key(seed)

    # shared variational integrand (span-Jacobian convention): target
    # value + FIRST-order y-gradient via the reparameterization trick
    integrand = _whitened_vi_target(
        valgrad, lo, span, log_prior, span_jac=True
    )

    b1, b2, eps_adam = 0.9, 0.999, 1e-8
    tril_mask = jnp.tril(jnp.ones((n_params, n_params), jnp.float32), -1)

    def step(state, tk):
        t, k = tk
        mu, a, d, m, v = state
        L = a * tril_mask + jnp.diag(jnp.exp(d))
        eps = jax.random.normal(k, (n_mc, n_params), jnp.float32)
        y = mu + eps @ L.T
        f, g = integrand(params, y)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        # reparameterized ELBO gradients (entropy terms analytic)
        g_mu = g.mean(axis=0)
        g_full = (g[:, :, None] * eps[:, None, :]).mean(axis=0)
        g_a = g_full * tril_mask
        g_d = jnp.diagonal(g_full) * jnp.exp(d) + 1.0  # +1: entropy Σd
        elbo = f.mean() + jnp.sum(d)  # + const
        # one Adam over the concatenated parameters
        flat = (g_mu, g_a, g_d)
        m = jax.tree_util.tree_map(
            lambda mm, gg: b1 * mm + (1 - b1) * gg, m, flat
        )
        v = jax.tree_util.tree_map(
            lambda vv, gg: b2 * vv + (1 - b2) * gg * gg, v, flat
        )
        lr = learning_rate * (0.05 + 0.95 * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (t - 1.0) / n_steps)
        ))

        def upd(p, mm, vv):
            return p + lr * (mm / (1 - b1**t)) / (
                jnp.sqrt(vv / (1 - b2**t)) + eps_adam
            )

        mu = upd(mu, m[0], v[0])
        a = upd(a, m[1], v[1])
        d = upd(d, m[2], v[2])
        return (mu, a, d, m, v), elbo

    @jax.jit
    def run(mu, a, d, keys):
        zeros = (jnp.zeros_like(mu), jnp.zeros_like(a), jnp.zeros_like(d))
        state = (mu, a, d, zeros, zeros)
        (mu, a, d, _, _), elbo = jax.lax.scan(
            step, state,
            (jnp.arange(1, n_steps + 1, dtype=jnp.float32), keys),
        )
        return mu, a * tril_mask + jnp.diag(jnp.exp(d)), elbo

    mu, L, elbo = run(mu0, a0, d0, jax.random.split(key, n_steps))
    return ADVIResult(
        mu=np.asarray(mu),
        chol=np.asarray(L),
        elbo=np.asarray(elbo),
        _lo=np.asarray(lo, np.float64),
        _hi=np.asarray(hi, np.float64),
    )
