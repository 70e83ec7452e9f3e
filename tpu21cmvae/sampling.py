"""On-device posterior samplers over the emulator likelihood.

The reference's intended use is as the forward model inside an MCMC
sampler (reference ``README.rst:9-11``; Bye et al. 2022 §4), but it
ships no sampling support — users glue ~40 ms-per-signal ``predict``
calls into emcee. Here the whole sampler IS the device program: every
walker-step of Metropolis-Hastings or HMC runs inside one ``lax.scan``
with zero host round trips, consuming the bench-selected likelihood
paths (:func:`tpu21cmvae.ops.loglik.make_loglik` /
:func:`~tpu21cmvae.ops.loglik.make_loglik_and_grad` — measured tiers in
docs/PERF.md: ~6×10⁷ MH likelihood evals/s, ~4×10⁷ HMC value+gradient
evals/s on one v5e chip).

Design notes:

* Priors are flat boxes (the 21cmGEM prior shape). MH proposes in raw
  parameter space and clips to the box; HMC samples in an unbounded
  ``y``-space with a sigmoid map into the box — the log-Jacobian term
  keeps the flat prior exact, and the map doubles as a diagonal
  preconditioner (each parameter's scale is its prior span). The box
  must lie inside the model's valid domain — in particular the first
  three parameters are log-transformed (reference ``preprocess.py:74``),
  so their lower bounds must be positive (both samplers also
  self-recover walkers whose log-posterior goes non-finite).
* HMC warmup adapts the step size by dual averaging (Hoffman & Gelman
  2014, Alg. 5) toward a target acceptance rate — entirely inside the
  warmup scan's carry; the sampling phase runs at the adapted step.
* Approximate fast-tier gradients are safe by construction: leapfrog
  with any deterministic force field is reversible and
  volume-preserving, so the Metropolis accept step (which uses the
  accuracy-gated VALUE tier) keeps the posterior exact — gradient-tier
  error only costs acceptance rate (bench_mcmc.py gate rationale).
* Samplers return thinned chains as device-shaped arrays plus final
  state, so a long run can be continued by passing the state back in.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SampleResult",
    "make_emcee_log_prob",
    "sample_hmc",
    "sample_mh",
]


@dataclasses.dataclass
class SampleResult:
    """Posterior samples and diagnostics from one sampler run.

    ``chain``: thinned post-warmup samples, shape
    ``(n_kept, n_walkers, n_params)`` in RAW parameter units (empty
    first axis when ``thin=0`` — final state only). ``final``: the last
    walker positions ``(n_walkers, n_params)``. ``logp``: final
    log-posterior per walker. ``accept_rate``: per-step mean acceptance
    over the sampling phase. ``step_size``: the (adapted) HMC step, or
    the MH proposal scale.
    """

    chain: np.ndarray
    final: np.ndarray
    logp: np.ndarray
    accept_rate: np.ndarray
    step_size: float

    @property
    def flat(self) -> np.ndarray:
        """Chain flattened to ``(n_kept · n_walkers, n_params)``."""
        return self.chain.reshape(-1, self.chain.shape[-1])

    def rhat(self) -> np.ndarray:
        """Split-R̂ per parameter (Gelman–Rubin with split chains;
        Vehtari et al. 2021 eq. 4) treating each walker as a chain.
        Values near 1 indicate the walkers have mixed; needs a stored
        chain with ≥ 4 kept steps (``thin > 0``)."""
        n = self.chain.shape[0]
        if n < 4:
            raise ValueError(
                f"rhat needs >= 4 kept steps, have {n}; run with thin > 0"
            )
        half = n // 2
        # (2·n_walkers) split chains × half steps × n_params
        c = np.concatenate([self.chain[:half], self.chain[half: 2 * half]],
                           axis=1).astype(np.float64)
        m = c.mean(axis=0)  # per-chain mean
        w = c.var(axis=0, ddof=1).mean(axis=0)  # within-chain
        b = half * m.var(axis=0, ddof=1)  # between-chain
        var_plus = (half - 1) / half * w + b / half
        return np.sqrt(var_plus / np.maximum(w, 1e-300))

    def ess(self) -> np.ndarray:
        """Effective sample size per parameter across all walkers:
        walker-averaged autocorrelations with Geyer's initial-positive-
        sequence truncation (Vehtari et al. 2021 §3.2). Needs a stored
        chain (``thin > 0``); autocorrelation is measured at the thinned
        cadence, so this is the ESS of the RETURNED samples."""
        n, n_walkers, n_params = self.chain.shape
        if n < 4:
            raise ValueError(
                f"ess needs >= 4 kept steps, have {n}; run with thin > 0"
            )
        c = self.chain.astype(np.float64)
        c = c - c.mean(axis=0, keepdims=True)
        out = np.empty(n_params)
        for j in range(n_params):
            # FFT autocovariance per walker, averaged
            x = c[:, :, j]
            f = np.fft.rfft(x, n=2 * n, axis=0)
            acov = np.fft.irfft(f * np.conj(f), axis=0)[:n].mean(axis=1)
            acov /= np.arange(n, 0, -1)  # unbiased normalization
            rho = acov / max(acov[0], 1e-300)
            # Geyer: sum consecutive pairs while positive
            tau = 1.0
            for t in range(1, n - 1, 2):
                pair = rho[t] + rho[t + 1]
                if pair <= 0:
                    break
                tau += 2.0 * pair
            out[j] = n * n_walkers / tau
        return out

    def summary(self, labels=None) -> str:
        samples = self.flat if self.chain.size else self.final
        mean, std = samples.mean(0), samples.std(0)
        labels = labels or [f"p{i}" for i in range(samples.shape[-1])]
        lines = [
            f"  {l:>8}: {m:12.5g} ± {s:10.4g}"
            for l, m, s in zip(labels, mean, std)
        ]
        return (
            f"accept rate {float(np.mean(self.accept_rate)):.2f}, "
            f"step {self.step_size:.3g}\n" + "\n".join(lines)
        )


def _resolve_bounds(bounds) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if bounds is None:
        from tpu21cmvae.data.synthetic import PAR_RANGES

        bounds = PAR_RANGES
    b = np.asarray(bounds, np.float32)
    return jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1])


def _init_walkers(key, n_walkers, lo, hi):
    u = jax.random.uniform(key, (n_walkers, lo.shape[0]), jnp.float32)
    return lo + (hi - lo) * u


def make_emcee_log_prob(loglik, params, bounds=None):
    """Adapter for external ensemble samplers (emcee et al.): wrap a
    jitted batched likelihood as a numpy-in/numpy-out log-probability
    with a flat box prior.

    The reference's published analyses drive it from emcee at ~25
    likelihood evaluations/s (reference ``README.rst:11``); existing
    emcee setups migrate by swapping their log-prob function::

        sampler = emcee.EnsembleSampler(
            nwalkers, 7,
            make_emcee_log_prob(em.loglik_fn(obs, noise_var), em.params),
            vectorize=True,   # ONE device call per ensemble move
        )

    ``vectorize=True`` matters: it hands the whole ``(nwalkers, 7)``
    coordinate block to one jitted device call (fixed shape → one
    compile). Rows outside the box score ``-inf`` without touching the
    device (the emulator's log-transform is undefined for negative
    values there). For fully on-device chains prefer
    :func:`sample_mh` / :func:`sample_hmc` — no per-step host round
    trips at all.
    """
    lo, hi = _resolve_bounds(bounds)
    lo_np = np.asarray(lo, np.float32)
    hi_np = np.asarray(hi, np.float32)
    mid = (lo_np + hi_np) / 2.0

    def log_prob(coords):
        arr = np.atleast_2d(np.asarray(coords, np.float32))
        single = np.ndim(coords) == 1
        inside = ((arr >= lo_np) & (arr <= hi_np)).all(axis=1)
        safe = np.where(inside[:, None], arr, mid)  # keep device row valid
        lp = np.asarray(loglik(params, jnp.asarray(safe)))
        lp = np.where(inside, lp, -np.inf)
        return float(lp[0]) if single else lp

    return log_prob


def _dual_averaging_consts(init: float):
    """(mu, gamma, t0, kappa) — Hoffman & Gelman (2014) Alg. 5 defaults,
    shared by the HMC step and the MH proposal-scale adaptation."""
    return jnp.log(10.0 * init), 0.05, 10.0, 0.75


def sample_mh(
    loglik,
    params,
    *,
    n_walkers: int = 8192,
    n_steps: int = 500,
    n_warmup: int = 200,
    bounds=None,
    step_frac: float = 0.01,
    target_accept: float = 0.3,
    adapt: bool = True,
    thin: int = 10,
    seed: int = 0,
    x0=None,
) -> SampleResult:
    """Metropolis-Hastings ensemble over ``loglik(params, raw) → (B,)``.

    ``loglik`` is any jittable batched log-likelihood — typically
    ``DirectEmulator.loglik_fn(obs, noise_var)`` (the bench-selected
    gram/bf16x3 tier). Proposals are isotropic Gaussians scaled per
    parameter by ``step_frac`` of the prior span, clipped to the box
    (the clip is a valid reversible proposal for a flat-box prior
    target that is zero outside the box). During warmup the GLOBAL
    scale multiplier adapts by dual averaging toward ``target_accept``
    (0.3 ≈ random-walk-optimal in moderate dimension); ``adapt=False``
    pins ``step_frac``. ``thin > 0`` keeps every ``thin``-th
    post-warmup step. Runs as two ``lax.scan`` programs (warmup,
    sampling) — zero host round trips inside the chains.
    """
    lo, hi = _resolve_bounds(bounds)
    base_scale = step_frac * (hi - lo)
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = (
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi)
    )

    def mh_step(x, lp, mult, k):
        k1, k2 = jax.random.split(k)
        prop = jnp.clip(
            x + mult * base_scale * jax.random.normal(k1, x.shape, x.dtype),
            lo, hi,
        )
        lp_prop = loglik(params, prop)
        acc = jnp.log(jax.random.uniform(k2, (x.shape[0],))) < lp_prop - lp
        # a walker whose current lp is non-finite (e.g. started outside
        # the model's valid domain) would otherwise stick forever: every
        # NaN comparison rejects. Always step it onto a finite proposal.
        acc = acc | (~jnp.isfinite(lp) & jnp.isfinite(lp_prop))
        x = jnp.where(acc[:, None], prop, x)
        lp = jnp.where(acc, lp_prop, lp)
        return x, lp, jnp.mean(acc)

    mu, gamma, t0, kappa = _dual_averaging_consts(1.0)

    def warm_step(state, ik):
        i, k = ik
        x, lp, log_m, log_m_bar, h_bar = state
        x, lp, a = mh_step(x, lp, jnp.exp(log_m), k)
        t = i + 1.0
        h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (target_accept - a) / (t + t0)
        log_m = jnp.where(adapt, mu - jnp.sqrt(t) / gamma * h_bar, log_m)
        w = t ** (-kappa)
        log_m_bar = jnp.where(
            adapt, w * log_m + (1.0 - w) * log_m_bar, log_m_bar
        )
        return (x, lp, log_m, log_m_bar, h_bar), a

    def run_step(state, k):
        x, lp, mult = state
        x, lp, a = mh_step(x, lp, mult, k)
        return (x, lp, mult), (a, x if thin else None)

    @jax.jit
    def run(x, warm_ik, run_keys):
        lp = loglik(params, x)
        # n_warmup is static: with 0, skip the warmup scan entirely
        # (continuation runs via x0 must not take hidden extra steps)
        if n_warmup > 0:
            state = (
                x, lp, jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)
            )
            state, _ = jax.lax.scan(warm_step, state, warm_ik)
            x, lp, _, log_m_bar, _ = state
            mult = jnp.exp(log_m_bar)
        else:
            mult = jnp.float32(1.0)
        (x, lp, mult), (rates, kept) = jax.lax.scan(
            run_step, (x, lp, mult), run_keys
        )
        return x, lp, rates, kept, mult

    warm_ik = (
        jnp.arange(max(n_warmup, 1), dtype=jnp.float32),
        jax.random.split(k_warm, max(n_warmup, 1)),
    )
    run_keys = jax.random.split(k_run, n_steps)
    x, lp, rates, kept, mult = run(x, warm_ik, run_keys)
    chain = (
        np.asarray(kept)[thin - 1:: thin]
        if thin
        else np.empty((0,) + x.shape, np.float32)
    )
    return SampleResult(
        chain=chain,
        final=np.asarray(x),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(mult) * float(np.asarray(base_scale).mean()),
    )


def sample_hmc(
    valgrad,
    params,
    *,
    n_walkers: int = 4096,
    n_steps: int = 200,
    n_warmup: int = 100,
    n_leapfrog: int = 8,
    bounds=None,
    target_accept: float = 0.8,
    init_step: float = 0.01,
    thin: int = 5,
    seed: int = 0,
    x0=None,
) -> SampleResult:
    """HMC ensemble over ``valgrad(params, raw) → (logL, dlogL/draw)``.

    ``valgrad`` is typically ``DirectEmulator.loglik_and_grad_fn(obs,
    noise_var)`` (bench-selected fused value+gradient kernel on TPU).
    Sampling happens in the sigmoid-whitened ``y``-space (flat box prior
    exact via the Jacobian term); warmup adapts the leapfrog step by
    dual averaging toward ``target_accept``, then the sampling phase
    runs at the adapted step. Both phases are single ``lax.scan``
    programs.
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = (
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi)
    )
    frac = jnp.clip((x - lo) / span, 1e-4, 1.0 - 1e-4)
    y = jnp.log(frac / (1.0 - frac))

    def to_params(y):
        return lo + span * jax.nn.sigmoid(y)

    def logp_and_grad(y):
        ll, g_raw = valgrad(params, to_params(y))
        s = jax.nn.sigmoid(y)
        lp = ll + jnp.sum(
            jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
        )
        glp = g_raw * (span * s * (1.0 - s)) + (1.0 - 2.0 * s)
        return lp, glp

    def hmc_step(y, lp, glp, eps, k):
        kp, ku = jax.random.split(k)
        p0 = jax.random.normal(kp, y.shape, y.dtype)
        p = p0 + 0.5 * eps * glp
        q = y
        g = glp
        for _ in range(n_leapfrog - 1):
            q = q + eps * p
            _, g = logp_and_grad(q)
            p = p + eps * g
        q = q + eps * p
        lp_new, g_new = logp_and_grad(q)
        p = p + 0.5 * eps * g_new
        dh = (lp_new - lp) - 0.5 * (jnp.sum(p**2, -1) - jnp.sum(p0**2, -1))
        acc = jnp.log(jax.random.uniform(ku, (y.shape[0],))) < dh
        # recover walkers with a non-finite current lp (see sample_mh)
        acc = acc | (~jnp.isfinite(lp) & jnp.isfinite(lp_new))
        y = jnp.where(acc[:, None], q, y)
        lp = jnp.where(acc, lp_new, lp)
        glp = jnp.where(acc[:, None], g_new, glp)
        # mean Metropolis probability (capped at 1) drives adaptation
        return y, lp, glp, jnp.mean(jnp.minimum(1.0, jnp.exp(dh)))

    # dual averaging (Hoffman & Gelman 2014, Alg. 5) — all in-carry
    mu = jnp.log(10.0 * init_step)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warm_step(state, ik):
        i, k = ik
        y, lp, glp, log_eps, log_eps_bar, h_bar = state
        y, lp, glp, a_mean = hmc_step(y, lp, glp, jnp.exp(log_eps), k)
        t = i + 1.0
        h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
            target_accept - a_mean
        ) / (t + t0)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        return (y, lp, glp, log_eps, log_eps_bar, h_bar), a_mean

    def run_step(state, k):
        y, lp, glp, eps = state
        y, lp, glp, a_mean = hmc_step(y, lp, glp, eps, k)
        return (y, lp, glp, eps), (a_mean, to_params(y) if thin else None)

    @jax.jit
    def run(y, warm_ik, run_keys):
        lp, glp = logp_and_grad(y)
        if n_warmup > 0:  # static — no hidden warmup step on continuation
            state = (y, lp, glp, jnp.log(init_step), jnp.log(init_step),
                     jnp.float32(0.0))
            state, _ = jax.lax.scan(warm_step, state, warm_ik)
            y, lp, glp, _, log_eps_bar, _ = state
            eps = jnp.exp(log_eps_bar)
        else:
            eps = jnp.float32(init_step)
        (y, lp, glp, eps), (rates, kept) = jax.lax.scan(
            run_step, (y, lp, glp, eps), run_keys
        )
        return y, lp, rates, kept, eps

    warm_ik = (
        jnp.arange(max(n_warmup, 1), dtype=jnp.float32),
        jax.random.split(k_warm, max(n_warmup, 1)),
    )
    run_keys = jax.random.split(k_run, n_steps)
    y, lp, rates, kept, eps = run(y, warm_ik, run_keys)
    chain = (
        np.asarray(kept)[thin - 1:: thin]
        if thin
        else np.empty((0, y.shape[0], y.shape[1]), np.float32)
    )
    return SampleResult(
        chain=chain,
        final=np.asarray(to_params(y)),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(eps),
    )
