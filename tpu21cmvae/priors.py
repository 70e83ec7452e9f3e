"""Informative priors for the on-device inference stack.

The samplers in :mod:`tpu21cmvae.sampling` default to the flat box
prior (the 21cmGEM prior shape), but real 21-cm analyses constrain some
astrophysical parameters externally — e.g. Planck's optical-depth
measurement is a Gaussian prior on ``tau`` — and the reference leaves
all of this to the user's external sampler setup (its emulator is just
the forward model inside emcee, reference ``README.rst:9-11``). This
module provides the two prior representations the stack consumes:

* ``log_prior(x) → (B,)`` — a log-density over RAW parameters, added to
  the log-likelihood by the chain samplers and the fitter
  (:func:`~tpu21cmvae.sampling.sample_mh` /
  :func:`~tpu21cmvae.sampling.sample_ensemble` /
  :func:`~tpu21cmvae.sampling.sample_hmc` /
  :func:`~tpu21cmvae.sampling.fit_map` /
  :func:`~tpu21cmvae.sampling.log_evidence`). Normalization is
  optional: sampler output and evidence are invariant to a constant
  shift (evidence is defined under the normalized prior — expectations
  under sampled prior points self-normalize).
* ``prior_transform(u) → (B, P)`` — the MultiNest/dynesty convention
  for :func:`tpu21cmvae.nested.nested_sampling`: a map from the unit
  cube to parameter space such that uniform ``u`` gives prior-
  distributed ``θ``. Nested sampling then never needs the density —
  constrained exploration stays uniform-in-``u`` with the plain
  ``logL > L*`` rule, which is what keeps its volume bookkeeping exact.

:class:`GaussianBoxPrior` builds both views from one spec — independent
per-parameter truncated Gaussians inside the prior box, with ``sigma``
``None``/``inf`` marking a parameter as flat. Both views are traceable
jnp functions (each row independent, as the samplers require).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["GaussianBoxPrior"]

_SQRT2 = 1.4142135623730951


def _ndtr(z):
    return 0.5 * (1.0 + jax.lax.erf(z / _SQRT2))


@dataclasses.dataclass(frozen=True)
class GaussianBoxPrior:
    """Independent truncated-Gaussian priors inside the prior box.

    ``mean`` / ``sigma``: per-parameter center and width in RAW units;
    a ``sigma`` of ``None`` (or ``inf``/``nan``) keeps that parameter's
    prior flat over the box. ``bounds``: the ``(P, 2)`` box (defaults to
    the 21cmGEM-shaped ranges). Example — a Planck-style ±0.006
    constraint on ``tau`` (parameter 3), everything else flat::

        prior = GaussianBoxPrior.for_params(
            {3: (0.054, 0.006)}, n_params=7)
        res = em.sample_posterior(obs, nv, log_prior=prior.log_prior)
        ev = em.log_evidence(obs, nv, prior_transform=prior.prior_transform)
    """

    mean: np.ndarray
    sigma: np.ndarray
    lo: np.ndarray
    hi: np.ndarray

    @classmethod
    def build(
        cls,
        mean: Sequence[Optional[float]],
        sigma: Sequence[Optional[float]],
        bounds=None,
    ) -> "GaussianBoxPrior":
        from tpu21cmvae.sampling import _resolve_bounds

        lo, hi = _resolve_bounds(bounds)
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        p = lo.shape[0]
        m = np.array(
            [np.nan if v is None else float(v) for v in mean], np.float64
        )
        s = np.array(
            [np.inf if v is None else float(v) for v in sigma], np.float64
        )
        if m.shape != (p,) or s.shape != (p,):
            raise ValueError(
                f"mean and sigma must have length {p}; got "
                f"{m.shape} / {s.shape}"
            )
        s = np.where(np.isnan(s), np.inf, s)
        gauss = np.isfinite(s)
        if (s[gauss] <= 0).any():
            raise ValueError("Gaussian sigmas must be positive")
        if np.isnan(m[gauss]).any():
            raise ValueError("Gaussian parameters need a finite mean")
        return cls(mean=m, sigma=s, lo=lo, hi=hi)

    @classmethod
    def for_params(
        cls, constraints: dict, n_params: int = 7, bounds=None
    ) -> "GaussianBoxPrior":
        """Build from ``{index: (mean, sigma)}``; other params flat."""
        mean = [None] * n_params
        sigma = [None] * n_params
        for idx, (m, s) in constraints.items():
            mean[int(idx)] = m
            sigma[int(idx)] = s
        return cls.build(mean, sigma, bounds)

    # -- the two consumer views --------------------------------------------

    def log_prior(self, x) -> jnp.ndarray:
        """Traceable log-density ``(B, P) → (B,)`` over RAW parameters
        (up to a constant; rows independent). Gaussian dims contribute
        ``−½((x−m)/s)²``, flat dims 0 — the box indicator itself is
        enforced by the samplers' bounds handling, not here, so the
        function stays smooth for HMC."""
        gauss = np.isfinite(self.sigma)
        if not gauss.any():
            def flat(x):
                x = jnp.asarray(x)
                return jnp.zeros(x.shape[:-1], x.dtype)

            return flat(x)
        m = jnp.asarray(np.where(gauss, self.mean, 0.0), jnp.float32)
        inv_s = jnp.asarray(
            np.where(gauss, 1.0 / np.where(gauss, self.sigma, 1.0), 0.0),
            jnp.float32,
        )
        z = (jnp.asarray(x) - m) * inv_s
        return -0.5 * jnp.sum(z * z, axis=-1)

    def log_box_mean(self, lo=None, hi=None) -> float:
        """``log E_flat[exp(log_prior)]`` over the box — the constant
        that converts a raw-density integral against the NORMALIZED
        flat measure (``∫ f·π_raw dx / V``) into one against the box-
        normalized prior (``∫ f dπ̃``). Analytic: per Gaussian dim
        ``log[s·√(2π)·(Φ(b)−Φ(a)) / span]``, flat dims 0. Consumed by
        :func:`tpu21cmvae.sampling.laplace_evidence` so its ``logz``
        shares the ladder/SMC/nested convention (evidence under the
        box-normalized prior). ``lo``/``hi`` override the box (the
        evidence call's bounds may differ from the prior's)."""
        import math

        lo = self.lo if lo is None else np.asarray(lo, np.float64)
        hi = self.hi if hi is None else np.asarray(hi, np.float64)
        gauss = np.isfinite(self.sigma)
        total = 0.0
        for j in np.nonzero(gauss)[0]:
            s, m = float(self.sigma[j]), float(self.mean[j])
            a = 0.5 * (1.0 + math.erf((lo[j] - m) / (s * _SQRT2)))
            b = 0.5 * (1.0 + math.erf((hi[j] - m) / (s * _SQRT2)))
            mass = s * math.sqrt(2.0 * math.pi) * (b - a)
            total += math.log(mass) - math.log(float(hi[j] - lo[j]))
        return total

    def prior_transform(self, u) -> jnp.ndarray:
        """Traceable unit-cube map ``(B, P) → (B, P)``: uniform ``u``
        gives prior-distributed θ (exact truncated-Gaussian inverse CDF
        on Gaussian dims, affine on flat dims) — the representation
        :func:`tpu21cmvae.nested.nested_sampling` consumes."""
        gauss = np.isfinite(self.sigma)
        lo = jnp.asarray(self.lo, jnp.float32)
        hi = jnp.asarray(self.hi, jnp.float32)
        u = jnp.asarray(u, jnp.float32)
        flat_x = lo + (hi - lo) * u
        if not gauss.any():
            return flat_x
        m = np.where(gauss, self.mean, 0.0)
        s = np.where(gauss, self.sigma, 1.0)
        a = _ndtr(jnp.asarray((self.lo - m) / s, jnp.float32))
        b = _ndtr(jnp.asarray((self.hi - m) / s, jnp.float32))
        # clamp the re-mapped quantile off the exact tails so ndtri
        # stays finite at u ∈ {0, 1}
        q = jnp.clip(a + (b - a) * u, 1e-7, 1.0 - 1e-7)
        gauss_x = jnp.asarray(m, jnp.float32) + jnp.asarray(
            s, jnp.float32
        ) * ndtri(q)
        return jnp.where(jnp.asarray(gauss), gauss_x, flat_x)


def ndtri(q):
    """Inverse standard-normal CDF (Φ⁻¹) via erfinv."""
    return _SQRT2 * jax.lax.erf_inv(2.0 * q - 1.0)
