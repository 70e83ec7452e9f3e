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
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BatchSampleResult",
    "ChEESSampleResult",
    "EvidenceComparison",
    "EvidenceResult",
    "FitResult",
    "LaplaceResult",
    "NUTSSampleResult",
    "PTSampleResult",
    "PredictiveBand",
    "ProfileResult",
    "SampleResult",
    "compare_evidence",
    "fit_map",
    "laplace_evidence",
    "laplace_evidence_multi",
    "log_evidence",
    "make_emcee_log_prob",
    "posterior_predictive",
    "profile_likelihood",
    "run_batched_chain",
    "sample_chees",
    "sample_ensemble",
    "sample_hmc",
    "sample_nuts",
    "sample_mh",
    "sample_pt",
    "sample_to_ess",
    "valgrad_from_loglik",
    "WeightedPosterior",
    "reweight",
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
    the MH proposal scale — the mean over adaptation blocks when
    ``adapt_blocks > 1``, with the per-block values in
    ``block_step_sizes`` (shape ``(adapt_blocks,)``; ``None`` for
    samplers without block adaptation).
    """

    chain: np.ndarray
    final: np.ndarray
    logp: np.ndarray
    accept_rate: np.ndarray
    step_size: float
    block_step_sizes: Optional[np.ndarray] = None

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

    def autocorr_time(self) -> np.ndarray:
        """Integrated autocorrelation time per parameter, in units of
        STORED (thinned) steps — emcee's ``get_autocorr_time``
        convention, derived from the same Geyer-truncated estimate as
        :meth:`ess` (``τ = kept_steps · n_walkers / ESS``; multiply by
        ``thin`` for raw chain steps). Rule of thumb: trust moments
        once the stored chain is ≳ 50·τ long."""
        n, n_walkers, _ = self.chain.shape
        return n * n_walkers / self.ess()

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


@dataclasses.dataclass
class BatchSampleResult:
    """``O`` independent posteriors sampled by ONE chain program over a
    stacked-observation likelihood
    (:func:`tpu21cmvae.ops.loglik.make_loglik_multi`;
    :meth:`DirectEmulator.sample_posterior_batch`).

    ``result`` is the underlying :class:`SampleResult` with the walker
    axis stacked observation-major (``O · walkers_per_obs`` rows); the
    views below unstack it. Each observation's slab adapted its own
    proposal scale / leapfrog step (``adapt_blocks=n_obs`` in
    :func:`run_batched_chain`); ``result.step_size`` reports the mean
    over blocks."""

    n_obs: int
    result: SampleResult

    @property
    def walkers_per_obs(self) -> int:
        return self.result.final.shape[0] // self.n_obs

    @property
    def chain(self) -> np.ndarray:
        """(n_kept, O, walkers_per_obs, n_params)."""
        k, _, p = self.result.chain.shape
        return self.result.chain.reshape(k, self.n_obs, -1, p)

    def flat(self, i: int) -> np.ndarray:
        """Observation ``i``'s samples, ``(n_kept · W, n_params)``."""
        return self.chain[:, i].reshape(-1, self.result.chain.shape[-1])

    def per_obs(self, i: int) -> SampleResult:
        """Observation ``i``'s chain as a standalone
        :class:`SampleResult` (R̂/ESS/summary work per observation)."""
        w = self.walkers_per_obs
        sl = slice(i * w, (i + 1) * w)
        bss = self.result.block_step_sizes
        own_step = (
            float(bss[i])
            if bss is not None and bss.shape[0] == self.n_obs
            else self.result.step_size
        )
        return SampleResult(
            chain=self.result.chain[:, sl],
            final=self.result.final[sl],
            logp=self.result.logp[sl],
            accept_rate=self.result.accept_rate,
            step_size=own_step,
        )


def run_batched_chain(
    sampler: str,
    params,
    n_obs: int,
    n_walkers: int,
    *,
    loglik_builder=None,
    valgrad_builder=None,
    bounds=None,
    **kwargs,
) -> BatchSampleResult:
    """Shared dispatcher behind every family's
    ``sample_posterior_batch``: run ``n_obs`` posteriors' walkers
    (``n_walkers`` each, observation-major) through ONE
    :func:`sample_mh` / :func:`sample_hmc` / :func:`sample_nuts`
    program over a stacked-observation likelihood. The builders are
    lazy so only the needed program is constructed. The stretch move
    is refused: its cross-walker pairing would propose across
    observations (valid MCMC — the complementary walker is a fixed
    proposal parameter — but mixing-hostile, each proposal shaped by
    the wrong posterior). ChEES is refused because its trajectory
    length is a single ensemble-adapted scalar — NUTS provides the
    adaptive-trajectory option here, with per-walker trees and a
    per-block metric.

    The samplers get ``adapt_blocks=n_obs`` (overridable via kwargs):
    each observation's walker slab adapts its OWN proposal scale /
    leapfrog step, so heterogeneous posterior widths (per-sim noise
    levels, different data) don't force every chain onto one
    compromise step — the per-block statistics are a reshape+mean,
    free next to the stacked likelihood call.
    """
    total = n_obs * n_walkers
    kwargs.setdefault("adapt_blocks", n_obs)
    if sampler == "mh":
        return BatchSampleResult(n_obs=n_obs, result=sample_mh(
            loglik_builder(), params, n_walkers=total, bounds=bounds,
            **kwargs,
        ))
    if sampler == "hmc":
        return BatchSampleResult(n_obs=n_obs, result=sample_hmc(
            valgrad_builder(), params, n_walkers=total, bounds=bounds,
            **kwargs,
        ))
    if sampler == "nuts":
        # per-block step size AND per-block metric (sample_nuts
        # adapt_blocks): per-walker trees already end each
        # observation's trajectories independently
        return BatchSampleResult(n_obs=n_obs, result=sample_nuts(
            valgrad_builder(), params, n_walkers=total, bounds=bounds,
            **kwargs,
        ))
    raise ValueError(
        "sampler must be 'mh', 'hmc' or 'nuts' for batched "
        "observations (the stretch move pairs across observations; "
        f"ChEES adapts one shared trajectory); got {sampler!r}"
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


def _shard_walkers(x, mesh):
    """Commit a walker/start array to ``mesh``'s device axes along its
    leading dimension, so GSPMD shards the ENTIRE chain program — every
    likelihood matmul runs on local walker rows, and the only
    collectives are the tiny scalar reductions the algorithms actually
    need (accept-rate means, cross-walker statistics, replica-exchange
    ``roll`` → ``ppermute`` on the rung axis). Everything else in the
    samplers is per-walker, which is exactly the sharding-friendly
    design: no code changes, the compiler partitions the one program it
    already traced. ``mesh=None`` is the single-device no-op."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    n_dev = int(mesh.devices.size)
    if x.shape[0] % n_dev:
        raise ValueError(
            f"the leading walker dimension ({x.shape[0]}) must divide "
            f"evenly across the {n_dev}-device mesh"
        )
    spec = PartitionSpec(mesh.axis_names, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def _thin_state(n_steps: int, thin: int, x):
    """Device-side thinning buffer: ``(n_keep + 1, *x.shape)`` zeros
    whose LAST row is a scratch slot non-kept steps write into.

    The naive pattern — emit ``x`` from every scan step and slice
    ``[thin-1::thin]`` on the host — materializes the FULL
    ``(n_steps, n_walkers, P)`` stack in HBM and ships it through the
    tunnel, a factor-``thin`` waste on both (at the /sample caps,
    5000×8192×7 f32 is ~1.1 GB where ~115 MB is kept). Instead the
    buffer rides the scan carry and :func:`_thin_write` updates it in
    place (``dynamic_update_slice`` in a ``while``-loop carry lowers to
    an in-place update; non-kept steps land on the scratch row). Kept
    rows are bit-identical to the host slice — step ``t`` (0-based) is
    kept iff ``(t+1) % thin == 0``."""
    n_keep = n_steps // thin if thin else 0
    return n_keep, jnp.zeros((n_keep + 1,) + x.shape, x.dtype)


def _thin_write(buf, t, x, thin: int, n_keep: int):
    """Write ``x`` into ``buf`` at its keep-slot (or the scratch row)
    for 0-based step ``t`` (int32). See :func:`_thin_state`."""
    keep = (t + 1) % thin == 0
    idx = jnp.where(keep, (t + 1) // thin - 1, n_keep)
    return jax.lax.dynamic_update_slice(
        buf, x[None], (idx,) + (0,) * x.ndim
    )


def _resolve_log_prior(log_prior):
    """None → the flat box prior (a traced zero — XLA folds the add).

    A supplied ``log_prior`` must be a traceable row-wise-independent
    log-density over RAW parameters, ``(B, P) → (B,)``, finite inside
    the prior box; normalization optional (see
    :class:`tpu21cmvae.priors.GaussianBoxPrior`). The samplers keep the
    box as a hard indicator on top of it.
    """
    if log_prior is None:
        return lambda x: jnp.zeros(jnp.asarray(x).shape[:-1], jnp.float32)
    return log_prior


def _log_prior_val_grad(log_prior, x):
    """(log π(x), ∇log π(x)) row-wise — valid because ``log_prior`` is
    required to be row-independent (the sum's gradient separates)."""
    lpr = log_prior(x)
    g = jax.grad(lambda q: jnp.sum(log_prior(q)))(x)
    return lpr, g


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


@dataclasses.dataclass
class PredictiveBand:
    """Signal-space posterior predictive summary from
    :func:`posterior_predictive`.

    ``levels``: the requested quantile levels ``(Q,)``. ``bands``: the
    per-bin signal quantiles ``(Q, n_bins)`` in mK — e.g. the default
    (0.16, 0.5, 0.84) rows are the 68 % credible band around the
    median curve. ``mean`` / ``std``: per-bin predictive mean and
    spread ``(n_bins,)``. The bin axis is the canonical redshift grid
    (:func:`tpu21cmvae.utils.frequency.default_redshifts`)."""

    levels: np.ndarray
    bands: np.ndarray
    mean: np.ndarray
    std: np.ndarray


def posterior_predictive(
    predict,
    samples,
    *,
    quantiles=(0.16, 0.5, 0.84),
    noise_var: float = 0.0,
    seed: int = 0,
    max_batch: int = 65536,
) -> PredictiveBand:
    """Push posterior parameter samples through the emulator and
    summarize the implied signal per frequency bin — the reconstructed-
    signal credible band 21-cm analyses plot next to the data (the
    reference leaves this to users gluing ~40 ms ``predict`` calls;
    here the whole flat chain goes through the batched device path).

    ``predict``: the model's ``predict`` method — or any
    ``(N, n_params) → (N, n_bins)`` callable; :class:`DeepEnsemble`'s
    method pools every member's prediction per draw, so emulation
    uncertainty widens the band (the mixture predictive). ``samples``:
    posterior draws, e.g. ``SampleResult.flat`` or
    ``NestedResult.posterior(n)``. ``noise_var``: optionally add
    observation noise (scalar variance or per-bin array, mK²) to get
    the predictive of the OBSERVED spectrum rather than of the signal.
    ``max_batch`` bounds device memory: samples stream through in
    chunks (quantiles are computed on the host over the full set).
    """
    samples = np.atleast_2d(np.asarray(samples, np.float32))
    outs = []
    for i in range(0, samples.shape[0], max_batch):
        outs.append(np.atleast_2d(np.asarray(predict(samples[i:i + max_batch]))))
    sig = np.concatenate(outs, axis=0).astype(np.float64)
    if np.any(np.asarray(noise_var) > 0):
        rng = np.random.default_rng(seed)
        sig = sig + rng.normal(0.0, 1.0, sig.shape) * np.sqrt(noise_var)
    levels = np.asarray(quantiles, np.float64)
    return PredictiveBand(
        levels=levels,
        bands=np.quantile(sig, levels, axis=0),
        mean=sig.mean(axis=0),
        std=sig.std(axis=0),
    )


@dataclasses.dataclass
class EvidenceResult:
    """Bayesian evidence estimate from :func:`log_evidence`.

    ``logz``: stepping-stone estimate of ``log Z = log ∫ L(θ) π(θ) dθ``
    with ``π`` the flat box prior (normalized — ``log Z`` of a model
    that ignores the data is the prior-averaged likelihood, directly
    comparable across models and prior boxes). ``logz_err``: split-half
    Monte-Carlo error (the two step-halves of the sampling phase
    estimated independently; half their |difference| per rung, combined
    in quadrature) — a CONVERGENCE alarm more than a confidence
    interval: values ≳ 1 mean the ladder never equilibrated and the
    estimate itself is untrustworthy (raise ``n_steps``/``n_warmup``,
    seed ``x0`` from :func:`fit_map`, or add rungs).
    ``ladder_drift``: the full-ladder estimate minus the estimate a
    HALF-density sub-ladder (every other rung, same chains — zero extra
    likelihood cost) would give. This is the alarm the split-half error
    cannot sound: an under-resolved ladder has tiny within-run variance
    but real discretization/equilibration bias, and the bias moves with
    rung density. Measured on a real trained-emulator posterior (sharp
    451-bin observation, prior-init): the TRUE error runs ~4-5× the
    quadrature of ``logz_err`` and ``|ladder_drift|`` — at the default
    budget (K=32, 400 steps) logz sat 9.5 nats below the nested-
    sampling reference with err 2.3 / drift −2.4; at K=64, 1,200 steps
    it closed to 1.5 nats with err 0.30 / drift −0.17. So: treat the
    alarms as a (optimistic) error SCALE, double ``n_rungs``/``n_steps``
    until both are ≪ 1, or use
    :func:`tpu21cmvae.nested.nested_sampling` (the robust default of
    the model-level methods). ``rung_logz`` /
    ``rung_logz_err``: the K-1 per-rung contributions (their sum is
    ``logz``; a single rung dominating means the ladder is too coarse
    there). ``betas``: the temperature ladder. ``accept_rate`` /
    ``swap_rate``: per-rung MH acceptance and per-edge replica-exchange
    acceptance over the sampling phase (swap rates ≪ 0.1 also signal a
    too-coarse ladder). ``posterior`` / ``logp``: the β=1 rung's final
    walkers — posterior samples for free.
    """

    logz: float
    logz_err: float
    ladder_drift: float
    rung_logz: np.ndarray
    rung_logz_err: np.ndarray
    betas: np.ndarray
    accept_rate: np.ndarray
    swap_rate: np.ndarray
    posterior: np.ndarray
    logp: np.ndarray

    def summary(self) -> str:
        drift_bad = abs(self.ladder_drift) > max(1.0, 3.0 * self.logz_err)
        if drift_bad:
            note = (
                f"  ** ladder_drift = {self.ladder_drift:+.1f}: NOT "
                "converged in rung count — the estimate would move by "
                "~this much under refinement; use nested_sampling "
                "(the robust path) or double n_rungs until the drift "
                "is small **"
            )
        elif self.logz_err > 1.0:
            note = (
                "  ** logz_err > 1: NOT converged — raise "
                "n_steps/n_warmup, seed x0 from fit_map, or add rungs **"
            )
        else:
            note = ""
        return (
            f"log Z = {self.logz:.4f} ± {self.logz_err:.3f}  "
            f"({len(self.betas)} rungs, drift {self.ladder_drift:+.2f}, "
            f"MH accept {float(self.accept_rate.mean()):.2f}, "
            f"swap accept {float(self.swap_rate.mean()):.2f}){note}"
        )


def log_evidence(
    loglik,
    params,
    *,
    n_rungs: int = 32,
    n_walkers: int = 256,
    n_steps: int = 400,
    n_warmup: int = 200,
    bounds=None,
    a: float = 2.0,
    beta_min: float = 1e-6,
    swap_sweeps: int = None,
    seed: int = 0,
    x0=None,
    log_prior=None,
    mesh=None,
) -> EvidenceResult:
    """Bayesian evidence ``log Z`` by stepping-stone integration over a
    parallel-tempering ladder (Xie et al. 2011; Earl & Deem 2005) —
    model comparison, the workflow 21-cm analyses run nested samplers
    (MultiNest/polychord) for, here as ONE on-device program.

    A ladder of ``n_rungs`` tempered targets ``π_k ∝ L^{β_k}·π`` —
    β=0 (the prior, sampled EXACTLY by independence refresh) plus a
    geometric ``beta_min → 1`` ladder — runs ``n_walkers`` walkers per
    rung under the shared ptemcee kernel (:func:`_pt_kernel`): tempered
    red-black affine-invariant STRETCH moves (self-scaling — no
    proposal-scale adaptation; the random-walk-MH predecessor measurably
    failed to anneal cold rungs from prior draws, see :func:`sample_pt`),
    ALL rungs advancing in two half-ensemble likelihood batches per step
    (K·W rows — the TPU doesn't care), with ``swap_sweeps``
    likelihood-free replica-exchange sweeps between adjacent rungs per
    step so hot rungs keep cold rungs mixed. The sampling phase pools
    every (step, walker) sample into the stepping-stone estimator

        log Z = Σ_k log E_{π_k}[ L^{β_{k+1}-β_k} ]

    evaluated by streaming logsumexp — and because β=0 samples the
    prior exactly and β=1 the posterior, the run also returns posterior
    samples. Proposals outside the box are rejected (target zero
    outside — exact for the flat prior; at β=0 a clipped proposal would
    pile walkers on the faces and bias the prior rung). Runtime is
    dominated by ``(n_warmup+n_steps) · n_rungs · n_walkers`` likelihood
    rows — ~5×10⁶ for the defaults, well under a second of device time
    at the measured ~6×10⁷ loglik/s (docs/PERF.md).

    ``x0``: optional ``(n_walkers, n_params)`` warm-start applied to
    EVERY rung (e.g. ``fit_map(...).params`` — see
    ``examples/fit_and_sample.py``). With the stretch-move kernel,
    prior initialization now WORKS on sharp trained-emulator
    posteriors: measured seed-to-seed logZ scatter 0.2 nats at the
    default budget (the random-walk predecessor scattered >100 nats —
    cold rungs never found the mode). What remains at the default
    budget is resolvable BIAS: measured −9.5 nats vs the nested
    reference at K=32/400 steps, −1.5 nats at K=64/1,200 steps — and
    ``logz_err``/``ladder_drift`` flag it (see
    :class:`EvidenceResult`). ALWAYS check both before using ``logz``;
    :func:`tpu21cmvae.nested.nested_sampling` remains the robust
    default the model-level ``log_evidence`` methods use (its measured
    seed spread is ~0.04 nats with no rung tuning).

    ``log_prior``: optional log-density over RAW parameters — the
    ladder becomes ``π_k ∝ L^{β_k}·π`` (β=0 samples π, prior factors
    cancel in replica exchange) and ``logz`` estimates ``log ∫ L dπ̃``
    with ``π̃`` the box-normalized version of the supplied prior
    (sampled expectations self-normalize, so an unnormalized density
    is fine). For nested sampling use the unit-cube ``prior_transform``
    view instead (:mod:`tpu21cmvae.priors`).

    ``mesh``: optional device mesh — the RUNG axis shards across it
    (``n_rungs`` must divide evenly); replica exchange's neighbor roll
    lowers to a ``ppermute`` over ICI, everything else is rung-local.
    """
    raw_log_prior = log_prior
    log_prior = _resolve_log_prior(log_prior)
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    _pt_sizes_check(n_rungs, n_walkers, n_params, a)
    n_sw = _pt_swap_sweeps(swap_sweeps, n_rungs)
    betas = jnp.asarray(_geometric_ladder(n_rungs, beta_min), jnp.float32)
    dbeta = betas[1:] - betas[:-1]  # (K-1,)
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    if x0 is not None:
        seed_rows = jnp.clip(jnp.asarray(x0, jnp.float32), lo, hi)
        if seed_rows.shape != (n_walkers, n_params):
            raise ValueError(
                f"x0 must have shape ({n_walkers}, {n_params}); "
                f"got {seed_rows.shape}"
            )
        x = jnp.broadcast_to(
            seed_rows[None], (n_rungs, n_walkers, n_params)
        )
    else:
        x = _init_walkers(
            k_init, n_rungs * n_walkers, lo, hi
        ).reshape(n_rungs, n_walkers, n_params)
    # mesh: shard the RUNG axis — per-rung work is independent except
    # the replica-exchange roll, which lowers to ppermute over ICI
    x = _shard_walkers(x, mesh)

    # half-density sub-ladder (every other rung, keeping β=1) for the
    # drift alarm — its stepping-stone estimate reuses the same chains
    coarse_idx = np.append(np.arange(0, n_rungs - 1, 2), n_rungs - 1)
    coarse_src = jnp.asarray(coarse_idx[:-1])
    coarse_dbeta = jnp.diff(betas[jnp.asarray(coarse_idx)])

    def build_run():
        eval_ll, sweep, swap_phase = _pt_kernel(
            loglik, log_prior, lo, hi, n_rungs, n_walkers, a, n_sw
        )

        def run(params, x, warm_ik, run_ik):
            def warm_step(state, ik):
                i, k = ik
                km, ks = jax.random.split(k)
                x, ll, lpr = state
                x, ll, lpr, _ = sweep(params, x, ll, lpr, betas, km)
                x, ll, lpr, _ = swap_phase(x, ll, lpr, betas, i, ks)
                return (x, ll, lpr), None

            def run_step(state, ik):
                i, k = ik
                km, ks = jax.random.split(k)
                x, ll, lpr = state
                x, ll, lpr, acc = sweep(params, x, ll, lpr, betas, km)
                x, ll, lpr, s = swap_phase(x, ll, lpr, betas, i, ks)
                # per-step stepping-stone contribution: logsumexp over
                # walkers of dβ_k · logL at rung k (pooled across steps
                # on the host)
                ss = jax.scipy.special.logsumexp(
                    dbeta[:, None] * ll[:-1], axis=1
                )
                ss_c = jax.scipy.special.logsumexp(
                    coarse_dbeta[:, None] * ll[coarse_src], axis=1
                )
                return (x, ll, lpr), (acc, s, ss, ss_c)

            ll, lpr, _ = eval_ll(params, x.reshape(-1, n_params))
            ll = ll.reshape(n_rungs, n_walkers)
            lpr = lpr.reshape(n_rungs, n_walkers)
            state = (x, ll, lpr)
            if n_warmup > 0:
                state, _ = jax.lax.scan(warm_step, state, warm_ik)
            (x, ll, lpr), (rates, srates, ss, ss_c) = jax.lax.scan(
                run_step, state, run_ik
            )
            return x, ll, rates, srates, ss, ss_c

        return jax.jit(run)

    run = _chain_program(
        loglik,
        (
            "evidence", _bounds_key(lo, hi), n_rungs, n_walkers,
            float(a), float(beta_min), n_sw, int(n_warmup),
            _fn_cache_key(raw_log_prior),
        ),
        build_run,
    )
    warm_ik = (
        jnp.arange(max(n_warmup, 1), dtype=jnp.float32),
        jax.random.split(k_warm, max(n_warmup, 1)),
    )
    run_ik = (
        jnp.arange(n_steps, dtype=jnp.float32),
        jax.random.split(k_run, n_steps),
    )
    x, ll, rates, srates, ss, ss_c = run(params, x, warm_ik, run_ik)
    ss = np.asarray(ss, np.float64)  # (n_steps, K-1)
    ss_c = np.asarray(ss_c, np.float64)
    # pool all steps × walkers: log mean = logsumexp - log(T·W)
    rung_logz = np.logaddexp.reduce(ss, axis=0) - np.log(
        n_steps * n_walkers
    )
    coarse_logz = float(
        (
            np.logaddexp.reduce(ss_c, axis=0) - np.log(n_steps * n_walkers)
        ).sum()
    )
    # split-half MC error: the two step-halves estimated independently;
    # a drifting (unequilibrated) ladder shows up as a large split
    half = n_steps // 2
    a = np.logaddexp.reduce(ss[:half], axis=0) - np.log(half * n_walkers)
    b = np.logaddexp.reduce(ss[half: 2 * half], axis=0) - np.log(
        half * n_walkers
    )
    rung_err = 0.5 * np.abs(a - b)
    return EvidenceResult(
        logz=float(rung_logz.sum()),
        logz_err=float(np.sqrt((rung_err**2).sum())),
        ladder_drift=float(rung_logz.sum()) - coarse_logz,
        rung_logz=rung_logz,
        rung_logz_err=rung_err,
        betas=np.asarray(betas),
        accept_rate=np.asarray(rates).mean(axis=0),
        swap_rate=np.asarray(srates).mean(axis=0),
        posterior=np.asarray(x[-1]),
        logp=np.asarray(ll[-1]),
    )


@dataclasses.dataclass
class FitResult:
    """Multi-start maximum-likelihood fit output (:func:`fit_map`).

    ``params``: final position of every start, ``(n_starts, n_params)``
    raw units. ``logp``: final log-likelihood per start. ``best`` /
    ``best_logp``: the single best start. Multi-modality shows up as
    clusters in ``params`` with distinct ``logp`` plateaus.
    """

    params: np.ndarray
    logp: np.ndarray
    best: np.ndarray
    best_logp: float

    def top(self, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """The ``k`` best (params, logp) rows, best first."""
        order = np.argsort(-self.logp)[:k]
        return self.params[order], self.logp[order]

    def summary(self, labels=None) -> str:
        labels = labels or [f"p{i}" for i in range(self.params.shape[-1])]
        lines = [
            f"  {l:>8}: {v:12.6g}" for l, v in zip(labels, self.best)
        ]
        return f"best logL {self.best_logp:.6g}\n" + "\n".join(lines)


def fit_map(
    valgrad,
    params,
    *,
    n_starts: int = 1024,
    n_steps: int = 300,
    bounds=None,
    learning_rate: float = 0.05,
    seed: int = 0,
    x0=None,
    log_prior=None,
    mesh=None,
) -> FitResult:
    """Multi-start maximum-likelihood fit of the astrophysical
    parameters: Adam ascent on ``valgrad(params, raw) → (logL, grad)``
    from ``n_starts`` prior draws at once, the whole optimization as one
    ``lax.scan`` on device.

    This replaces the scipy.optimize / grid-search loop reference users
    wrap around 40 ms ``predict`` calls (reference ``README.rst:9-11``
    names fitting observed spectra as the intended use; the reference
    ships no fitter). A thousand restarts cost what one costs — the
    batch rides the same fused value+gradient path the HMC sampler uses
    (docs/PERF.md: ~4×10⁷ value+gradient evals/s on one v5e chip), and
    multi-start is the practical defense against local optima in the
    7-parameter landscape.

    The ascent runs in the same sigmoid-whitened unbounded space as
    :func:`sample_hmc` (per-parameter scale = prior span; iterates can
    never leave the box) but WITHOUT the flat-prior Jacobian term — the
    optimum of the raw-space likelihood is wanted, not the mode of the
    transformed density. ``learning_rate`` is in whitened units where
    the box spans ~12 sigmoid units end to end. Use the result to seed
    samplers: ``sample_*(..., x0=result.params)``.

    ``log_prior``: optional smooth log-density over RAW parameters —
    when given, the ascent maximizes ``logL + log π`` (the raw-space
    MAP) instead of the bare likelihood. ``mesh``: optional device mesh
    — starts are embarrassingly parallel and shard across it with zero
    collectives inside the ascent (see :func:`sample_mh`).
    """
    lo, hi = _resolve_bounds(bounds)
    key = jax.random.key(seed)
    x = _shard_walkers(
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(key, n_starts, lo, hi),
        mesh,
    )
    x_fin, ll = _whitened_adam_ascent(
        valgrad, params, lo, hi, x,
        n_steps=n_steps, learning_rate=learning_rate, log_prior=log_prior,
    )
    x_np, ll_np = np.asarray(x_fin), np.asarray(ll)
    best = int(np.nanargmax(ll_np))
    return FitResult(
        params=x_np,
        logp=ll_np,
        best=x_np[best],
        best_logp=float(ll_np[best]),
    )


def _whitened_adam_ascent(
    valgrad, params, lo, hi, x,
    *, n_steps, learning_rate, log_prior, free=None, jacobian=False,
):
    """The shared constrained-ascent core of :func:`fit_map`,
    :func:`profile_likelihood` and :func:`laplace_evidence`:
    cosine-decayed Adam ascent on ``logL(+logπ)`` in the
    sigmoid-whitened box space, starting from raw rows ``x``. ``free``:
    optional (n_params,) 0/1 mask — a 0 coordinate is PINNED (no
    gradient, no movement; its init uses a tighter logit clip so the
    pinned value moves by ≤1e-7·span rather than the free coords' 1e-4,
    since nothing can pull it back). ``jacobian=True`` adds the
    sigmoid-map log-Jacobian so the target is the TRANSFORMED density
    in ``y`` (what a ``y``-space Laplace approximation needs) rather
    than the raw-space likelihood. Returns device ``(x_final, logp)``.
    """
    span = hi - lo
    frac = jnp.clip((x - lo) / span, 1e-4, 1.0 - 1e-4)
    if free is not None:
        pinned = jnp.clip((x - lo) / span, 1e-7, 1.0 - 1e-7)
        frac = jnp.where(free.astype(bool), frac, pinned)
    y0 = jnp.log(frac / (1.0 - frac))

    def ll_and_grad_y(params, y):
        s = jax.nn.sigmoid(y)
        xr = lo + span * s
        ll, g_raw = valgrad(params, xr)
        if log_prior is not None:
            lpr, g_pr = _log_prior_val_grad(log_prior, xr)
            ll = ll + lpr
            g_raw = g_raw + g_pr
        g_y = g_raw * (span * s * (1.0 - s))
        if jacobian:
            ll = ll + jnp.sum(
                jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
            )
            g_y = g_y + (1.0 - 2.0 * s)
        if free is not None:
            g_y = g_y * free
        return ll, g_y

    b1, b2, eps = 0.9, 0.999, 1e-8

    def build_run():
        def run(params, y):
            def adam_step(state, t):
                y, m, v = state
                ll, g = ll_and_grad_y(params, y)
                # dead start ≠ NaN poison
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                m = b1 * m + (1.0 - b1) * g
                v = b2 * v + (1.0 - b2) * g * g
                mh = m / (1.0 - b1 ** t)
                vh = v / (1.0 - b2 ** t)
                # cosine decay to 5% of the initial rate: large early
                # steps to cross the rugged landscape, small late steps
                # to polish the optimum below the Adam-jitter floor
                lr = learning_rate * (0.05 + 0.95 * 0.5 * (
                    1.0 + jnp.cos(jnp.pi * (t - 1.0) / n_steps)
                ))
                y = y + lr * mh / (jnp.sqrt(vh) + eps)  # ascent
                return (y, m, v), None

            state = (y, jnp.zeros_like(y), jnp.zeros_like(y))
            (y, _, _), _ = jax.lax.scan(
                adam_step, state,
                jnp.arange(1, n_steps + 1, dtype=jnp.float32),
            )
            ll, _ = ll_and_grad_y(params, y)
            return lo + span * jax.nn.sigmoid(y), ll

        return jax.jit(run)

    # cached on the valgrad closure (the sampler idiom,
    # _chain_program): repeated fits / profiles / Laplace runs / ladder
    # warm starts with the same statics reuse one compiled program —
    # through the tunnel that turns every warm call from a 5–20 s
    # retrace into milliseconds. ``params`` is a RUN argument, so a
    # retrained model's weights can never go stale in the cache.
    run = _chain_program(
        valgrad,
        (
            "ascent", _bounds_key(lo, hi), int(n_steps),
            float(learning_rate), _fn_cache_key(log_prior),
            None if free is None else np.asarray(free).tobytes(),
            bool(jacobian), tuple(np.shape(x)),
        ),
        build_run,
    )
    return run(params, y0)


@dataclasses.dataclass
class LaplaceResult:
    """Gaussian (Laplace) approximation of the posterior and evidence
    from :func:`laplace_evidence`, optionally sharpened to an
    asymptotically EXACT estimate by importance sampling.

    ``logz``: with the default ``n_is > 0``, the self-normalized
    importance-sampling estimate (draws from the fitted Gaussian,
    weights against the true whitened density — one batched likelihood
    call) with ``logz_err`` its delta-method MC error; ``logz_laplace``
    keeps the raw saddle-point value, and ``logz − logz_laplace`` is a
    direct measurement of the posterior's non-Gaussianity. With
    ``n_is=0``, ``logz`` IS the saddle point and ``logz_err`` is
    ``nan`` (systematic error only). ``is_ess``: Kish effective sample
    size of the (Pareto-smoothed) weights over all adaptive rounds —
    an ``is_ess`` far below the draw count means a poor proposal.
    ``khat``: the PSIS generalized-Pareto tail index (Vehtari et al.
    2021) — the primary reliability diagnostic: ``khat < 0.7`` means
    the smoothed estimate has finite variance and a trustworthy error
    bar; above, distrust the estimate and run ``method="nested"``. ``map_params``: the mode of the
    whitened-space density in RAW units; ``map_logp`` its whitened
    log-density; ``cov``: raw-space posterior covariance by the delta
    method; ``pd`` is False when the Hessian was not negative-definite
    at the found mode (a failed fit or a ridge — distrust ``logz``).
    ``posterior(n)`` draws from the fitted Gaussian mapped into the box
    — importance-RESAMPLED when IS ran (asymptotically exact posterior
    draws), plain Gaussian otherwise."""

    logz: float
    map_params: np.ndarray
    map_logp: float
    cov: np.ndarray
    pd: bool
    logz_err: float = float("nan")
    logz_laplace: float = float("nan")
    is_ess: float = float("nan")
    khat: float = float("nan")
    _y_map: np.ndarray = dataclasses.field(default=None, repr=False)
    _y_chol: np.ndarray = dataclasses.field(default=None, repr=False)
    _lo: np.ndarray = dataclasses.field(default=None, repr=False)
    _hi: np.ndarray = dataclasses.field(default=None, repr=False)
    _is_x: np.ndarray = dataclasses.field(default=None, repr=False)
    _is_logw: np.ndarray = dataclasses.field(default=None, repr=False)

    def posterior(self, n: int, seed: int = 0) -> np.ndarray:
        """``(n, P)`` posterior draws inside the box (same contract as
        ``NestedResult.posterior``): importance-resampled from the IS
        cloud when it exists, otherwise from the Laplace Gaussian."""
        rng = np.random.default_rng(seed)
        if self._is_x is not None:
            lw = self._is_logw - self._is_logw.max()
            p = np.exp(lw)
            p /= p.sum()
            idx = rng.choice(p.shape[0], size=n, p=p)
            return self._is_x[idx]
        z = rng.standard_normal((n, self._y_map.shape[0]))
        y = self._y_map + z @ self._y_chol.T
        s = 1.0 / (1.0 + np.exp(-y))
        return (self._lo + (self._hi - self._lo) * s).astype(np.float32)

    def summary(self, labels=None) -> str:
        sd = np.sqrt(np.maximum(np.diag(self.cov), 0.0))
        labels = labels or [f"p{i}" for i in range(sd.shape[0])]
        if np.isfinite(self.logz_err):
            head = (
                f"log Z = {self.logz:.4f} ± {self.logz_err:.4f}  "
                f"(Laplace+IS; saddle point {self.logz_laplace:.4f}, "
                f"weight ESS {self.is_ess:.0f}, khat {self.khat:.2f}; "
                f"negative-definite Hessian: {self.pd})"
            )
        else:
            head = (
                f"log Z = {self.logz:.4f}  (Laplace — systematic "
                f"error, no MC term; negative-definite Hessian: "
                f"{self.pd})"
            )
        lines = [
            head,
            f"MAP log-density {self.map_logp:.4f}",
        ] + [
            f"  {l:>8}: {m:12.5g} ± {s:10.4g}"
            for l, m, s in zip(labels, self.map_params, sd)
        ]
        if self._is_logw is not None and (
            (np.isfinite(self.khat) and self.khat > 0.7)
            or self.is_ess < 0.02 * self._is_logw.shape[0]
        ):
            lines.append(
                f"  WARNING: khat {self.khat:.2f} / weight ESS "
                f"{self.is_ess:.0f} of {self._is_logw.shape[0]} draws "
                f"— the adapted proposal is still a poor match here "
                f"(curved ridge or missed mass); the error bar is "
                f"optimistic. Confirm with method='nested'."
            )
        return "\n".join(lines)


def valgrad_from_loglik(loglik):
    """``(params, raw) → (logL, ∇logL)`` adapter over a pure VALUE
    likelihood via autodiff (row-wise VJP with a ones cotangent — exact
    because the likelihood is row-independent).

    The wrapper is a STABLE object cached on the likelihood closure
    (:func:`_chain_program`), so downstream per-closure program caches
    — the whitened-ascent program, chain programs — survive across
    calls instead of dying with a per-call lambda. Use it to feed
    gradient consumers (:func:`fit_map`, :func:`sample_hmc`,
    :func:`sample_chees`) when only a value likelihood is at hand;
    model users should prefer the bench-selected
    ``loglik_and_grad_fn`` which is faster than autodiff on TPU."""

    def build():
        def valgrad(p, xr):
            ll, vjp = jax.vjp(lambda q: loglik(p, q), xr)
            (g,) = vjp(jnp.ones_like(ll))
            return ll, g

        return valgrad

    return _chain_program(loglik, ("autodiff-valgrad",), build)


# Student-t proposal constants shared by the IS stages: df=4 keeps
# polynomial tails (the whitened target's tails are exponential — see
# laplace_evidence's IS comment), 1.3× widens the Hessian-based round-1
# proposal, 1.15× over-disperses the moment-matched adapted rounds
# (measured best compromise: pure moment match loses tail coverage on
# sharp posteriors, 1.3× over-widens already-matched ones).
_IS_DF = 4.0
_IS_SCALE0 = 1.3
_IS_SCALE_ADAPT = 1.15


def _gpd_fit(x):
    """Zhang & Stephens (2009) empirical-Bayes generalized-Pareto fit
    to sorted-ascending exceedances ``x > 0``. Returns ``(k, sigma)``
    with the paper's weak prior shrinking ``k`` toward 0.5 (the PSIS
    recommendation, Vehtari et al. 2021 §3)."""
    n = x.shape[0]
    m = 30 + int(math.sqrt(n))
    b = 1.0 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    b /= 3.0 * x[int(n / 4 + 0.5) - 1]
    b += 1.0 / x[-1]
    k = np.mean(np.log1p(-b[:, None] * x), axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        logl = n * (np.log(-b / k) - k - 1.0)
    logl = np.where(np.isfinite(logl), logl, -np.inf)
    w = 1.0 / np.exp(logl - logl[:, None]).sum(axis=1)
    w = np.where(np.isfinite(w), w, 0.0)
    if w.sum() <= 0:
        return float("nan"), float("nan")
    b_post = float(np.sum(b * w) / w.sum())
    k_post = float(np.mean(np.log1p(-b_post * x)))
    sigma = -k_post / b_post
    k_post = (n * k_post + 5.0) / (n + 10.0)
    return k_post, sigma


def _psis(logw):
    """Pareto-smoothed importance sampling (Vehtari, Simpson, Gelman &
    Yao 2021): fit a generalized Pareto to the largest ~min(20 %,
    3·√M) weights and replace them by the fit's expected order
    statistics (capped at the raw maximum). Returns ``(smoothed logw,
    k_hat)`` — ``k_hat`` is THE reliability diagnostic: below 0.7 the
    smoothed estimate has finite variance and trustworthy error bars;
    above, no IS budget rescues the proposal (escalate to nested).
    Smoothing bounds the damage of the one-lucky-draw failure mode
    where a single tail weight carries the whole estimate."""
    m0 = logw.max()
    if not np.isfinite(m0):
        return logw, float("inf")
    lw = logw - m0
    n = lw.shape[0]
    s = int(min(0.2 * n, 3.0 * math.sqrt(n)))
    if s < 5:
        return logw, float("nan")
    order = np.argsort(lw)
    tail = order[-s:]
    cut = np.exp(lw[order[-s - 1]])
    exc = np.exp(lw[tail]) - cut  # ascending, ≥ 0
    if exc[-1] <= 0:
        return logw, float("nan")
    k, sigma = _gpd_fit(np.maximum(exc, 1e-300))
    if not (np.isfinite(k) and np.isfinite(sigma) and sigma > 0):
        return logw, float("nan")
    q = (np.arange(1, s + 1) - 0.5) / s
    if abs(k) < 1e-6:
        quant = -np.log1p(-q) * sigma
    else:
        quant = sigma * np.expm1(-k * np.log1p(-q)) / k
    smoothed = np.minimum(cut + quant, np.exp(lw[order[-1]]))
    out = lw.copy()
    out[tail] = np.log(smoothed)
    return out + m0, float(k)


def _amis_sharpen(run_is, y_map, chol0, *, n_is, n_rounds, seed):
    """Adaptive multiple importance sampling (AMIS, Cornuet et al.
    2012) in the whitened space, batched over ``O`` observations.

    ``run_is(y_centers (O,P) f32, scale_mats (O,P,P) f32, key) →
    (g (O,n_is), y (O,n_is,P))`` is ONE cached device program — every
    round re-invokes it with new proposal parameters, so adaptation
    compiles nothing. Round 1 proposes from the Hessian-based Student-t
    (df=4, 1.3× scale — exactly the pre-adaptive estimator); each later
    round refits the t to the self-normalized weighted moments of ALL
    draws so far (shrunk toward the current proposal when the weight
    ESS is tiny, so a garbage refit cannot strand the sampler) and
    draws again. All rounds are combined with deterministic-mixture
    (balance-heuristic) weights ``w_i = π(y_i) / mean_r q_r(y_i)`` —
    provably robust to any single bad proposal, and measured to recover
    observations whose intermediate round collapsed to ESS ≈ 4.

    Why this exists, measured (docs/PERF.md): the Hessian curvature at
    the MAP is up to ~80× sharper than the posterior bulk on real
    emulator posteriors, so the one-shot proposal's Kish ESS sat at
    ~0.5–1.5 %; three AMIS rounds lift it ~10–100× at the same
    per-round budget.

    Returns ``(logw (O, n_rounds·n_is) f64, Y (O, n_rounds·n_is, P)
    f64)``.
    """
    df = _IS_DF
    mu = np.asarray(y_map, np.float64)
    n_obs, p = mu.shape
    props = [(mu, np.asarray(chol0, np.float64) * _IS_SCALE0)]
    gs, ys = [], []

    def logq_mix(Y):
        # (O, M) log of the equal-weight mixture of all proposals
        const = (
            math.lgamma((df + p) / 2.0) - math.lgamma(df / 2.0)
            - 0.5 * p * np.log(df * np.pi)
        )
        terms = []
        for mu_r, L_r in props:
            sld = np.linalg.slogdet(L_r)[1]  # (O,)
            d = (Y - mu_r[:, None, :]).transpose(0, 2, 1)  # (O,P,M)
            t = np.linalg.solve(L_r, d)  # (O,P,M)
            q2 = np.sum(t * t, axis=1)  # (O,M)
            terms.append(
                const - sld[:, None]
                - 0.5 * (df + p) * np.log1p(q2 / df)
            )
        return np.logaddexp.reduce(np.stack(terms), 0) - np.log(
            len(props)
        )

    for rnd in range(n_rounds):
        mu_r, L_r = props[-1]
        g, y = run_is(
            jnp.asarray(mu_r, jnp.float32),
            jnp.asarray(L_r, jnp.float32),
            jax.random.key(seed + 7919 + rnd * 104729),
        )
        gs.append(np.asarray(g, np.float64))
        ys.append(np.asarray(y, np.float64))
        if rnd == n_rounds - 1:
            break
        Y = np.concatenate(ys, axis=1)
        logw = np.concatenate(gs, axis=1) - logq_mix(Y)
        logw = np.where(np.isfinite(logw), logw, -np.inf)
        mu_next = mu_r.copy()
        L_next = L_r.copy()
        for o in range(n_obs):
            lw = _psis(logw[o])[0]  # smoothed weights for the refit
            m = lw.max()
            if not np.isfinite(m):
                continue  # keep the current proposal
            wn = np.exp(lw - m)
            wn /= wn.sum()
            ess = 1.0 / float((wn * wn).sum())
            muw = wn @ Y[o]
            d = Y[o] - muw
            covw = (wn[:, None] * d).T @ d
            # shrink toward the CURRENT proposal's moments when the
            # weight ESS is too small to trust the refit
            a = ess / (ess + 10.0)
            cov_prop = (L_r[o] @ L_r[o].T) * df / (df - 2.0)
            cov_next = a * covw + (1.0 - a) * cov_prop
            mu_next[o] = a * muw + (1.0 - a) * mu_r[o]
            ev, evec = np.linalg.eigh(0.5 * (cov_next + cov_next.T))
            ev = np.maximum(ev, max(1e-10 * ev.max(), 1e-14))
            L_next[o] = (
                (evec * np.sqrt(ev * (df - 2.0) / df)) @ evec.T
            ) * _IS_SCALE_ADAPT
        props.append((mu_next, L_next))
    Y = np.concatenate(ys, axis=1)
    logw = np.concatenate(gs, axis=1) - logq_mix(Y)
    return np.where(np.isfinite(logw), logw, -np.inf), Y


def _prior_log_box_mean(log_prior, lo, hi, *, n_mc: int = 1 << 18,
                        seed: int = 1086) -> float:
    """``log E_flat[exp(log_prior)]`` over the box ``[lo, hi]`` — the
    convention-fixing constant for the Laplace/IS evidence paths.

    The whitened-space integral those paths evaluate is
    ``∫ L·π_raw dx / V``; the ladder/SMC/nested estimators all report
    evidence under the BOX-NORMALIZED prior ``π̃ = π_raw/∫π_raw``
    (sampled prior expectations self-normalize). Subtracting this
    constant makes Laplace agree — and makes its ``logz`` invariant to
    a constant shift of ``log_prior``, as :mod:`tpu21cmvae.priors`
    promises. ``None`` → 0. A :class:`~tpu21cmvae.priors
    .GaussianBoxPrior` bound method resolves analytically via
    ``log_box_mean``; any other callable falls back to one prior-only
    MC sweep (no emulator calls; 2¹⁸ flat-box draws — worst measured
    error ~0.03 nats for a σ/span ≈ 0.004 prior, far under the
    estimator's own MC error bar)."""
    if log_prior is None:
        return 0.0
    owner = getattr(log_prior, "__self__", None)
    analytic = getattr(owner, "log_box_mean", None)
    if analytic is not None:
        return float(analytic(np.asarray(lo), np.asarray(hi)))
    u = jax.random.uniform(
        jax.random.key(seed), (n_mc, int(lo.shape[0]))
    )
    lp = _resolve_log_prior(log_prior)(lo + (hi - lo) * u)
    return float(
        jax.scipy.special.logsumexp(lp) - jnp.log(float(n_mc))
    )


def _finish_laplace(res, logw, y, lo, hi):
    """Fill a LaplaceResult's IS fields from one observation's combined
    AMIS cloud (``logw (M,)``, ``y (M,P)`` in the whitened space),
    Pareto-smoothing the weights (:func:`_psis`) and recording
    ``khat``."""
    logw, khat = _psis(logw)
    res.khat = float(khat)
    m = logw.max()
    w = np.exp(logw - m)
    mean_w = float(w.mean())
    res.logz = float(m + np.log(mean_w))
    res.logz_err = float(
        w.std(ddof=1) / (np.sqrt(float(w.size)) * mean_w)
    )
    res.is_ess = float(w.sum() ** 2 / (w * w).sum())
    span = np.asarray(hi, np.float64) - np.asarray(lo, np.float64)
    s = np.exp(-np.logaddexp(0.0, -y))  # overflow-safe sigmoid
    res._is_x = (np.asarray(lo, np.float64) + span * s).astype(
        np.float32
    )
    res._is_logw = logw
    return res


def laplace_evidence(
    loglik,
    params,
    *,
    bounds=None,
    n_starts: int = 4096,
    n_steps: int = 2000,
    learning_rate: float = 0.05,
    n_is: int = 16384,
    n_rounds: int = 3,
    seed: int = 0,
    log_prior=None,
    mesh=None,
) -> LaplaceResult:
    """Laplace (saddle-point) approximation of the Bayesian evidence,
    sharpened by default into an asymptotically EXACT importance-
    sampling estimate: one multi-start MAP fit, one 7×7 Hessian, and
    ``n_rounds`` batched likelihood calls on ``n_is`` adaptive
    Student-t draws each — a second or two where nested sampling takes
    ~10, with a real MC error bar (``n_is=0`` for the raw saddle
    point).

    The approximation lives in the sigmoid-whitened ``y``-space (same
    map as :func:`sample_hmc`), where the normalized flat box prior's
    ``1/V`` cancels against the map's volume factor: the whitened
    log-density ``g(y) = logL(x(y)) + Σ log σ'(y)`` integrates to
    exactly ``Z = ∫ L·π dx``. With a supplied ``log_prior`` the raw
    integral is ``∫ L·π_raw dx / V``; the result is shifted by
    ``−log E_flat[π_raw]`` (:func:`_prior_log_box_mean` — analytic for
    a :class:`~tpu21cmvae.priors.GaussianBoxPrior`, one prior-only MC
    sweep otherwise) so ``logz`` reports evidence under the
    BOX-NORMALIZED prior — the same convention as the ladder/SMC/
    nested paths, and invariant to a constant shift of ``log_prior``.
    The Gaussian step is

    ``log Z ≈ g(ŷ) + (P/2)·log 2π − ½·log det(−H)``, ``H = ∇²g(ŷ)``.

    ``loglik`` must be a VALUE function ``(params, raw) → (B,)`` that
    autodiff can differentiate twice (the XLA paths are; for the direct
    family prefer the exact tier — ``model.log_evidence(...,
    method="laplace")`` does this — since a fast-tier near-mode value
    error of ~0.4 nats would bias ``logz`` by the same amount). The
    ascent reuses :func:`_whitened_adam_ascent` WITH the Jacobian term
    (the mode of the transformed density is what the ``y``-space
    saddle point needs); the 4096-start/2000-step default is the
    measured reliability floor for FINDING the dominant mode on real
    emulator posteriors — a 1024×500 budget (the ladder warm start's
    floor) measurably stranded the ascent 9 nats below the mode on one
    rugged observation where 4096×2000 lands within 1 nat of nested,
    and the heavier budget still costs ~1 s warm on a v5e (~8×10⁶
    value+gradient rows at ~10⁷/s). The IS stage runs ``n_rounds``
    rounds of ``n_is`` Student-t draws with ADAPTIVE proposals
    (:func:`_amis_sharpen` — moment-matched refits combined by the
    balance heuristic; ``n_rounds=1`` is the plain Hessian-proposal
    estimator) and weights them against the true whitened density —
    the estimate then converges to the exact ``Z`` regardless of the
    saddle point's Gaussian error, which only sets the weight
    variance; check ``is_ess`` (Kish, over all ``n_rounds·n_is``
    draws) before trusting a hard case. Caveats: unimodal by
    construction — on
    multimodal posteriors it reports the dominant mode's local
    evidence; check against ``method="nested"`` when in doubt (the
    nested default exists precisely because it is robust to this).
    ``posterior(n)`` on the result gives Gaussian-approximate draws for
    quick-look contours.
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    # evidence convention: report under the box-normalized prior, like
    # the ladder/SMC/nested paths (see _prior_log_box_mean)
    prior_lbm = _prior_log_box_mean(log_prior, lo, hi)
    key = jax.random.key(seed)
    x0 = _shard_walkers(_init_walkers(key, n_starts, lo, hi), mesh)

    valgrad = valgrad_from_loglik(loglik)

    x_fin, g_fin = _whitened_adam_ascent(
        valgrad, params, lo, hi, x0,
        n_steps=n_steps, learning_rate=learning_rate,
        log_prior=log_prior, jacobian=True,
    )
    x_np = np.asarray(x_fin)
    g_np = np.asarray(g_fin)
    best = int(np.nanargmax(g_np))
    x_map = x_np[best]
    frac = np.clip((x_map - np.asarray(lo)) / np.asarray(span), 1e-7,
                   1.0 - 1e-7)
    y_map = jnp.asarray(np.log(frac / (1.0 - frac)), jnp.float32)

    def build_hess():
        def g_scalar(p, y):
            xr = lo + span * jax.nn.sigmoid(y)
            ll = loglik(p, xr[None])[0]
            if log_prior is not None:
                ll = ll + _resolve_log_prior(log_prior)(xr[None])[0]
            return ll + jnp.sum(
                jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y)
            )

        return jax.jit(jax.hessian(g_scalar, argnums=1))

    hess = _chain_program(
        loglik,
        ("laplace-hess", _bounds_key(lo, hi), _fn_cache_key(log_prior)),
        build_hess,
    )
    h = np.asarray(hess(params, y_map), np.float64)
    h = 0.5 * (h + h.T)
    evals, evecs = np.linalg.eigh(-h)  # want −H ≻ 0 at a maximum
    pd = bool(evals.min() > 0)
    floor = max(1e-10 * max(evals.max(), 1.0), 1e-12)
    evals = np.maximum(evals, floor)
    p = y_map.shape[0]
    logdet = float(np.sum(np.log(evals)))
    logz = (float(g_np[best]) + 0.5 * p * np.log(2 * np.pi)
            - 0.5 * logdet - prior_lbm)
    cov_y = evecs @ np.diag(1.0 / evals) @ evecs.T
    chol_y = evecs @ np.diag(1.0 / np.sqrt(evals)) @ evecs.T
    s = 1.0 / (1.0 + np.exp(-np.asarray(y_map, np.float64)))
    jac = np.asarray(span, np.float64) * s * (1.0 - s)
    cov_x = cov_y * jac[:, None] * jac[None, :]
    res = LaplaceResult(
        logz=float(logz),
        map_params=x_map,
        map_logp=float(g_np[best]),
        cov=cov_x,
        pd=pd,
        logz_laplace=float(logz),
        _y_map=np.asarray(y_map, np.float64),
        _y_chol=chol_y,
        _lo=np.asarray(lo, np.float64),
        _hi=np.asarray(hi, np.float64),
    )
    if n_is <= 0:
        return res

    # -- importance-sampling sharpening: draw from a Student-t centered
    # on the fitted Gaussian, weight against the true whitened density
    # — one batched likelihood call per round; exact as draws → ∞
    # REGARDLESS of the saddle point's Gaussian error (q only sets the
    # variance). The proposal MUST be t, not Gaussian: the whitened
    # target's tails are EXPONENTIAL (the sigmoid log-Jacobian decays
    # like e^{−|y|} while logL flattens to a constant far outside the
    # box center), so a Gaussian proposal has unbounded weight variance
    # — measured as a few-tenths-of-a-nat LOW bias with a misleadingly
    # small error bar on real emulator posteriors. Polynomial t-tails
    # dominate any exponential tail, restoring finite-variance weights.
    # With n_rounds > 1 the proposal ADAPTS (see _amis_sharpen): the
    # Hessian at the mode is measurably far sharper than the posterior
    # bulk, and moment-matched rounds lift the weight ESS ~10–100×.
    df = _IS_DF

    def build_is():
        def run(params, y_c, scale_mat, key):
            kz, ku = jax.random.split(key)
            pdim = y_c.shape[0]
            z = jax.random.normal(kz, (n_is, pdim))
            u = 2.0 * jax.random.gamma(ku, df / 2.0, (n_is,))  # χ²_df
            t = z * jnp.sqrt(df / u)[:, None]
            y = y_c + t @ scale_mat.T
            xr = lo + span * jax.nn.sigmoid(y)
            ll = loglik(params, xr)
            if log_prior is not None:
                ll = ll + _resolve_log_prior(log_prior)(xr)
            g = ll + jnp.sum(
                jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
            )
            return g, y

        return jax.jit(run)

    run_is = _chain_program(
        loglik,
        ("laplace-is2", _bounds_key(lo, hi), int(n_is),
         _fn_cache_key(log_prior)),
        build_is,
    )

    def run_obs1(mu_f, L_f, key):
        g, y = run_is(params, mu_f[0], L_f[0], key)
        return g[None], y[None]

    logw, y_all = _amis_sharpen(
        run_obs1, np.asarray(y_map, np.float64)[None], chol_y[None],
        n_is=n_is, n_rounds=n_rounds, seed=seed,
    )
    res = _finish_laplace(res, logw[0], y_all[0], lo, hi)
    res.logz -= prior_lbm
    return res


def laplace_evidence_multi(
    loglik_multi,
    params,
    n_obs: int,
    *,
    bounds=None,
    n_starts: int = 4096,
    n_steps: int = 2000,
    n_is: int = 4096,
    n_rounds: int = 3,
    learning_rate: float = 0.05,
    seed: int = 0,
    log_prior=None,
    mesh=None,
):
    """Survey-scale Bayesian evidence: Laplace+IS ``log Z`` for ``O``
    observations in THREE device programs total — the batched-
    observation counterpart of :func:`laplace_evidence`, and a workflow
    with no serial-sampler analogue (O nested runs cost O × ~10 s; this
    costs what ONE evidence costs, because every stage batches over
    observations).

    ``loglik_multi``: a stacked-observation likelihood ``(params,
    (O·W, P)) → (O·W,)`` with observation-major rows
    (:func:`tpu21cmvae.ops.loglik.make_loglik_multi` /
    ``make_loglik_multi_from_predict``; the gram form shares the trunk
    across observations, so the marginal cost of more observations is
    measured ≈0 — docs/PERF.md). Stages:

    1. one whitened MAP ascent over ``O·n_starts`` rows (each row
       scores against its own observation — the batched contract makes
       per-observation multi-start free);
    2. per-observation Hessians as ``P`` forward-over-reverse JVP
       columns of the row-gradient field — cross-observation blocks
       are identically zero, so perturbing every observation's k-th
       coordinate AT ONCE yields each observation's own k-th Hessian
       column: P (=7) passes regardless of O;
    3. ``n_rounds`` Student-t IS batches of ``O·n_is`` rows with
       per-observation ADAPTIVE proposals (:func:`_amis_sharpen`; see
       :func:`laplace_evidence` for why t, not Gaussian).

    Defaults are per-observation budgets at the measured reliability
    floor (4096-start/2000-step ascent — lighter 1024-start budgets
    measurably land different modes on different seeds, up to ~11 nats
    of seed-to-seed log Z on rugged observations; with the floor the
    MAP log-densities agree across seeds to ≲0.3 nats on all of 64
    real-posterior test rows). Lower them for quick looks; always
    check each result's ``is_ess``. Returns a list of ``O``
    :class:`LaplaceResult`.
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    p = int(lo.shape[0])
    prior_lbm = _prior_log_box_mean(log_prior, lo, hi)
    key = jax.random.key(seed)
    x0 = _shard_walkers(
        _init_walkers(key, n_obs * n_starts, lo, hi), mesh
    )
    valgrad = valgrad_from_loglik(loglik_multi)
    x_fin, g_fin = _whitened_adam_ascent(
        valgrad, params, lo, hi, x0,
        n_steps=n_steps, learning_rate=learning_rate,
        log_prior=log_prior, jacobian=True,
    )
    x_np = np.asarray(x_fin).reshape(n_obs, n_starts, p)
    g_np = np.asarray(g_fin).reshape(n_obs, n_starts)
    best = np.nanargmax(g_np, axis=1)
    rows = np.arange(n_obs)
    x_map = x_np[rows, best]  # (O, P)
    g_best = g_np[rows, best]
    frac = np.clip(
        (x_map - np.asarray(lo)) / np.asarray(span), 1e-7, 1.0 - 1e-7
    )
    y_map = jnp.asarray(np.log(frac / (1.0 - frac)), jnp.float32)

    def g_rows(params, y):  # (O, P) -> (O,) whitened log-density
        xr = lo + span * jax.nn.sigmoid(y)
        ll = loglik_multi(params, xr)
        if log_prior is not None:
            ll = ll + _resolve_log_prior(log_prior)(xr)
        return ll + jnp.sum(
            jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
        )

    def build_hess():
        def grad_rows(params, y):
            _, vjp = jax.vjp(lambda q: g_rows(params, q), y)
            (g,) = vjp(jnp.ones((n_obs,), jnp.float32))
            return g

        def hess(params, y):
            # column k of EVERY observation's Hessian at once: the
            # cross-observation blocks are zero, so a tangent that
            # perturbs coordinate k of all rows reads out each row's
            # own column k
            def col(e):
                return jax.jvp(
                    lambda q: grad_rows(params, q), (y,),
                    (jnp.broadcast_to(e, y.shape),),
                )[1]

            cols = jax.vmap(col)(jnp.eye(p, dtype=y.dtype))  # (P, O, P)
            return jnp.transpose(cols, (1, 0, 2))  # (O, P, P)

        return jax.jit(hess)

    hess = _chain_program(
        loglik_multi,
        ("laplace-hess-multi", _bounds_key(lo, hi), int(n_obs),
         _fn_cache_key(log_prior)),
        build_hess,
    )
    h = np.asarray(hess(params, y_map), np.float64)
    h = 0.5 * (h + np.transpose(h, (0, 2, 1)))

    df = _IS_DF

    def build_is():
        def run(params, y_c, scale_mats, key):
            kz, ku = jax.random.split(key)
            z = jax.random.normal(kz, (n_obs, n_is, p))
            u = 2.0 * jax.random.gamma(ku, df / 2.0, (n_obs, n_is))
            t = z * jnp.sqrt(df / u)[:, :, None]
            y = y_c[:, None, :] + jnp.einsum(
                "oik,ojk->oij", t, scale_mats
            )
            xr = (lo + span * jax.nn.sigmoid(y)).reshape(-1, p)
            ll = loglik_multi(params, xr)
            if log_prior is not None:
                ll = ll + _resolve_log_prior(log_prior)(xr)
            yf = y.reshape(-1, p)
            g = ll + jnp.sum(
                jax.nn.log_sigmoid(yf) + jax.nn.log_sigmoid(-yf),
                axis=-1,
            )
            return g.reshape(n_obs, n_is), y

        return jax.jit(run)

    run_is = _chain_program(
        loglik_multi,
        ("laplace-is2-multi", _bounds_key(lo, hi), int(n_obs),
         int(n_is), _fn_cache_key(log_prior)),
        build_is,
    )

    evals_all = np.linalg.eigh(-h)
    chols = np.empty((n_obs, p, p))
    logdets = np.empty(n_obs)
    pds = np.empty(n_obs, bool)
    for o in range(n_obs):
        evals, evecs = evals_all[0][o], evals_all[1][o]
        pds[o] = bool(evals.min() > 0)
        floor = max(1e-10 * max(evals.max(), 1.0), 1e-12)
        evals = np.maximum(evals, floor)
        logdets[o] = float(np.sum(np.log(evals)))
        chols[o] = evecs @ np.diag(1.0 / np.sqrt(evals)) @ evecs.T

    logw_all, y_all = _amis_sharpen(
        lambda mu_f, L_f, key: run_is(params, mu_f, L_f, key),
        np.asarray(y_map, np.float64), chols,
        n_is=n_is, n_rounds=n_rounds, seed=seed,
    )
    y_map_np = np.asarray(y_map, np.float64)
    out = []
    for o in range(n_obs):
        logz_lap = (float(g_best[o]) + 0.5 * p * np.log(2 * np.pi)
                    - 0.5 * logdets[o] - prior_lbm)
        s = 1.0 / (1.0 + np.exp(-y_map_np[o]))
        jac = np.asarray(span, np.float64) * s * (1.0 - s)
        cov_y = chols[o] @ chols[o].T
        res = LaplaceResult(
            logz=float(logz_lap),
            map_params=x_map[o],
            map_logp=float(g_best[o]),
            cov=cov_y * jac[:, None] * jac[None, :],
            pd=bool(pds[o]),
            logz_laplace=float(logz_lap),
            _y_map=y_map_np[o],
            _y_chol=chols[o],
            _lo=np.asarray(lo, np.float64),
            _hi=np.asarray(hi, np.float64),
        )
        res = _finish_laplace(res, logw_all[o], y_all[o], lo, hi)
        res.logz -= prior_lbm
        out.append(res)
    return out


def _dual_averaging_consts(init: float):
    """(mu, gamma, t0, kappa) — Hoffman & Gelman (2014) Alg. 5 defaults,
    shared by the HMC step and the MH proposal-scale adaptation."""
    return jnp.log(10.0 * init), 0.05, 10.0, 0.75


def _fn_cache_key(f):
    """Identity key for a (possibly bound-method) callable; None-safe.
    Bound methods are fresh objects per attribute access (``prior.
    log_prior is not prior.log_prior``), so they key on the instance +
    method name instead of their own id. Cache values built with this
    key close over ``f``, keeping it alive — so an id can never be
    recycled into a stale-program collision while its entry exists."""
    if f is None:
        return None
    self_ = getattr(f, "__self__", None)
    if self_ is not None:
        return (id(self_), getattr(f, "__func__", f).__qualname__)
    return id(f)


def _chain_program(loglik, key, build):
    """Per-closure jitted-chain-program cache — the train-loop lifetime
    idiom (``train/loop.py::_WeakFnCache``): entries live ON the
    likelihood closure, so dropping it frees the compiled programs and
    their captured buffers with no global registry, while repeated
    calls with the same statics re-trace NOTHING. That is what makes
    chunked continuation (:func:`sample_to_ess`), SBC rounds, and
    serve-style repeated sampling affordable through a tunnel-attached
    chip: without it every ``sample_*`` call rebuilt a fresh closure
    and re-paid the 20–60 s trace+compile. Overflow clears (blunt but
    bounded); closures without a writable ``__dict__`` build uncached.
    """
    try:
        per = getattr(loglik, "_t21_chain_cache")
    except AttributeError:
        per = {}
        try:
            setattr(loglik, "_t21_chain_cache", per)
        except (AttributeError, TypeError):
            return build()
    out = per.get(key)
    if out is None:
        if len(per) >= 16:
            per.clear()
        out = per[key] = build()
    return out


def _bounds_key(lo, hi) -> bytes:
    return np.asarray(lo).tobytes() + np.asarray(hi).tobytes()


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
    adapt_blocks: int = 1,
    thin: int = 10,
    seed: int = 0,
    x0=None,
    log_prior=None,
    mesh=None,
) -> SampleResult:
    """Metropolis-Hastings ensemble over ``loglik(params, raw) → (B,)``.

    ``loglik`` is any jittable batched log-likelihood — typically
    ``DirectEmulator.loglik_fn(obs, noise_var)`` (the bench-selected
    gram/bf16x3 tier). Proposals are isotropic Gaussians scaled per
    parameter by ``step_frac`` of the prior span; proposals outside the
    prior box are REJECTED (the target is zero there — exact Metropolis
    with a symmetric proposal; a clipped proposal is not symmetric at
    the faces and piles stationary mass on the boundary, which matters
    for near-flat targets). The likelihood is evaluated on a safe
    midpoint row for outside proposals so the emulator's log-transform
    never sees a negative parameter. During warmup the
    scale multiplier adapts by dual averaging toward ``target_accept``
    (0.3 ≈ random-walk-optimal in moderate dimension); ``adapt=False``
    pins ``step_frac``. ``adapt_blocks=G`` keeps G INDEPENDENT
    multipliers, one per contiguous walker block — the batched-
    observation path passes ``G = n_obs`` so each observation's
    posterior gets its own proposal scale (heterogeneous widths are the
    norm there: per-sim noise levels, different data; one pooled scale
    mixes the narrow posteriors arbitrarily slowly — on a 50×-width
    block split the pooled scale strands the narrow block entirely,
    ``tests/test_sampling.py::test_mh_adapt_blocks_heterogeneous_widths``;
    at mild heterogeneity pooled adaptation stays calibrated, just
    slower). Per-block statistics are a reshape+mean over the walker
    axis — free next to the likelihood call. ``thin > 0`` keeps every
    ``thin``-th post-warmup step. Runs as two ``lax.scan`` programs
    (warmup, sampling) — zero host round trips inside the chains.

    ``log_prior``: optional traceable log-density over RAW parameters
    added to the target (e.g.
    ``GaussianBoxPrior(...).log_prior`` — see
    :mod:`tpu21cmvae.priors`); the box stays a hard indicator on top.

    ``mesh``: optional :class:`jax.sharding.Mesh` — the walker axis
    shards across its devices (walker count must divide evenly) and the
    whole chain runs as one SPMD program; see :func:`_shard_walkers`.
    """
    raw_log_prior = log_prior
    log_prior = _resolve_log_prior(log_prior)
    lo, hi = _resolve_bounds(bounds)
    base_scale = step_frac * (hi - lo)
    mid = (lo + hi) / 2.0
    if n_walkers % adapt_blocks:
        raise ValueError(
            f"n_walkers ({n_walkers}) must divide into adapt_blocks "
            f"({adapt_blocks}) equal contiguous blocks"
        )
    n_blk = int(adapt_blocks)
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = _shard_walkers(
        # initialization (not part of the chain): pull stray rows into
        # the box so every walker starts on the target's support
        jnp.clip(jnp.asarray(x0, jnp.float32), lo, hi)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi),
        mesh,
    )

    def build_run():
        def mh_step(params, x, lp, mult, k):
            # ``mult``: (adapt_blocks,) per-block scale multipliers,
            # expanded to rows (block = contiguous walker slab)
            k1, k2 = jax.random.split(k)
            m_row = jnp.repeat(mult, x.shape[0] // n_blk)[:, None]
            prop = x + m_row * base_scale * jax.random.normal(
                k1, x.shape, x.dtype
            )
            inside = ((prop >= lo) & (prop <= hi)).all(axis=1)
            safe = jnp.where(inside[:, None], prop, mid)
            lp_prop = loglik(params, safe) + log_prior(safe)
            lp_prop = jnp.where(inside, lp_prop, -jnp.inf)
            acc = jnp.log(jax.random.uniform(k2, (x.shape[0],))) < lp_prop - lp
            # a walker whose current lp is non-finite (e.g. started
            # outside the model's valid domain) would otherwise stick
            # forever: every NaN comparison rejects. Always step it
            # onto a finite proposal.
            acc = acc | (~jnp.isfinite(lp) & jnp.isfinite(lp_prop))
            x = jnp.where(acc[:, None], prop, x)
            lp = jnp.where(acc, lp_prop, lp)
            return x, lp, acc.reshape(n_blk, -1).mean(axis=1)

        mu, gamma, t0, kappa = _dual_averaging_consts(1.0)

        def run(params, x, warm_ik, run_keys):
            def warm_step(state, ik):
                i, k = ik
                x, lp, log_m, log_m_bar, h_bar = state
                x, lp, a = mh_step(params, x, lp, jnp.exp(log_m), k)
                t = i + 1.0
                h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                    target_accept - a
                ) / (t + t0)
                log_m = jnp.where(
                    adapt, mu - jnp.sqrt(t) / gamma * h_bar, log_m
                )
                w = t ** (-kappa)
                log_m_bar = jnp.where(
                    adapt, w * log_m + (1.0 - w) * log_m_bar, log_m_bar
                )
                return (x, lp, log_m, log_m_bar, h_bar), a

            def run_step(state, tk):
                t, k = tk
                x, lp, mult, buf = state
                x, lp, a = mh_step(params, x, lp, mult, k)
                if thin:
                    buf = _thin_write(buf, t, x, thin, n_keep)
                return (x, lp, mult, buf), jnp.mean(a)

            lp = loglik(params, x) + log_prior(x)
            # warmup presence is static (part of the cache key): with
            # 0, skip the warmup scan entirely — continuation runs via
            # x0 must not take hidden extra steps
            if n_warmup > 0:
                zeros = jnp.zeros((n_blk,), jnp.float32)
                state = (x, lp, zeros, zeros, zeros)
                state, _ = jax.lax.scan(warm_step, state, warm_ik)
                x, lp, _, log_m_bar, _ = state
                mult = jnp.exp(log_m_bar)
            else:
                mult = jnp.ones((n_blk,), jnp.float32)
            n_keep, buf = _thin_state(run_keys.shape[0], thin, x)
            (x, lp, mult, buf), rates = jax.lax.scan(
                run_step,
                (x, lp, mult, buf),
                (jnp.arange(run_keys.shape[0], dtype=jnp.int32),
                 run_keys),
            )
            return x, lp, rates, buf[:n_keep], mult

        return jax.jit(run)

    run = _chain_program(
        loglik,
        (
            "mh", _bounds_key(lo, hi), float(step_frac),
            float(target_accept), bool(adapt), n_blk, int(thin),
            n_warmup > 0, _fn_cache_key(raw_log_prior),
        ),
        build_run,
    )
    warm_ik = (
        jnp.arange(max(n_warmup, 1), dtype=jnp.float32),
        jax.random.split(k_warm, max(n_warmup, 1)),
    )
    run_keys = jax.random.split(k_run, n_steps)
    x, lp, rates, kept, mult = run(params, x, warm_ik, run_keys)
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0,) + x.shape, np.float32)
    )
    return SampleResult(
        chain=chain,
        final=np.asarray(x),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(np.mean(np.asarray(mult)))
        * float(np.asarray(base_scale).mean()),
        block_step_sizes=np.asarray(mult)
        * float(np.asarray(base_scale).mean()),
    )


def sample_ensemble(
    loglik,
    params,
    *,
    n_walkers: int = 8192,
    n_steps: int = 500,
    n_warmup: int = 100,
    bounds=None,
    a: float = 2.0,
    thin: int = 10,
    seed: int = 0,
    x0=None,
    log_prior=None,
    mesh=None,
) -> SampleResult:
    """Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch
    move — the algorithm behind emcee), entirely on device.

    The reference's published analyses drive its ~25-predictions/s
    emulator from host-side emcee (reference ``README.rst:9-11``);
    :func:`make_emcee_log_prob` reproduces that setup with a batched
    device likelihood. This is the step further: the ensemble itself
    lives on device, the whole chain is one ``lax.scan`` program, and
    each stretch move is two half-ensemble likelihood batches — zero
    host round trips and no tuning parameter besides the stretch scale
    ``a`` (affine invariance makes the move self-scaling, so unlike
    :func:`sample_mh` there is nothing to adapt during warmup; warmup
    steps are ordinary moves whose samples are discarded).

    Parallelization is the red-black split emcee uses for vectorized
    moves (Foreman-Mackey et al. 2013 §3): walkers split into two fixed
    halves; half A proposes ``x_j + z (x_i - x_j)`` against partners
    ``j`` drawn from half B with ``z ~ g(z) ∝ 1/√z`` on ``[1/a, a]``,
    accepted with probability ``min(1, z^(d-1) · L'/L)``; then B moves
    against the UPDATED A (required for detailed balance). Proposals
    outside the flat prior box score ``-inf`` (evaluated on a safe
    midpoint row so the emulator's log-transform never sees a negative
    parameter — reference ``preprocess.py:74``). ``n_walkers`` must be
    even and at least ``2 · n_params + 2`` so each half-ensemble spans
    parameter space. Returns a :class:`SampleResult` whose
    ``step_size`` field reports the stretch scale ``a``.
    ``log_prior``: optional log-density added to the target (see
    :func:`sample_mh`); affine invariance is unaffected — the prior is
    part of the target, not the move. ``mesh``: optional device mesh —
    walkers shard across it (see :func:`sample_mh`); the cross-half
    pairing gathers only the tiny ``(n_walkers/2, n_params)`` block.
    """
    log_prior = _resolve_log_prior(log_prior)
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    if n_walkers % 2:
        raise ValueError(f"n_walkers must be even; got {n_walkers}")
    if n_walkers < 2 * n_params + 2:
        raise ValueError(
            f"n_walkers must be >= 2*n_params+2 = {2 * n_params + 2} "
            f"for the stretch move to span parameter space; got {n_walkers}"
        )
    if a <= 1.0:
        raise ValueError(f"stretch scale a must be > 1; got {a}")
    mid = (lo + hi) / 2.0
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = _shard_walkers(
        # initialization (not part of the chain): pull stray rows into
        # the box so every walker starts on the target's support
        jnp.clip(jnp.asarray(x0, jnp.float32), lo, hi)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi),
        mesh,
    )
    half = n_walkers // 2

    def safe_loglik(xs):
        inside = ((xs >= lo) & (xs <= hi)).all(axis=1)
        safe = jnp.where(inside[:, None], xs, mid)
        lp = loglik(params, safe) + log_prior(safe)
        return jnp.where(inside, lp, -jnp.inf)

    def half_move(xa, lpa, xb, k):
        kz, kj, ku = jax.random.split(k, 3)
        # z ~ g(z) ∝ 1/√z on [1/a, a] via inverse CDF
        u = jax.random.uniform(kz, (xa.shape[0],), xa.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        j = jax.random.randint(kj, (xa.shape[0],), 0, xb.shape[0])
        xj = xb[j]
        prop = xj + z[:, None] * (xa - xj)
        lp_prop = safe_loglik(prop)
        log_ratio = (n_params - 1.0) * jnp.log(z) + lp_prop - lpa
        acc = jnp.log(jax.random.uniform(ku, (xa.shape[0],))) < log_ratio
        # self-recover walkers with a non-finite current lp (see sample_mh)
        acc = acc | (~jnp.isfinite(lpa) & jnp.isfinite(lp_prop))
        xa = jnp.where(acc[:, None], prop, xa)
        lpa = jnp.where(acc, lp_prop, lpa)
        return xa, lpa, jnp.mean(acc)

    def move(x, lp, k):
        ka, kb = jax.random.split(k)
        xa, lpa = x[:half], lp[:half]
        xb, lpb = x[half:], lp[half:]
        xa, lpa, ra = half_move(xa, lpa, xb, ka)
        xb, lpb, rb = half_move(xb, lpb, xa, kb)
        return (
            jnp.concatenate([xa, xb]),
            jnp.concatenate([lpa, lpb]),
            0.5 * (ra + rb),
        )

    def warm_step(state, k):
        x, lp = state
        x, lp, _ = move(x, lp, k)
        return (x, lp), None

    def run_step(state, tk):
        t, k = tk
        x, lp, buf = state
        x, lp, r = move(x, lp, k)
        if thin:
            buf = _thin_write(buf, t, x, thin, n_keep_steps)
        return (x, lp, buf), r

    n_keep_steps = n_steps // thin if thin else 0

    @jax.jit
    def run(x, warm_keys, run_keys):
        lp = safe_loglik(x)
        if n_warmup > 0:  # static — no hidden warmup step on continuation
            (x, lp), _ = jax.lax.scan(warm_step, (x, lp), warm_keys)
        _, buf = _thin_state(run_keys.shape[0], thin, x)
        (x, lp, buf), rates = jax.lax.scan(
            run_step, (x, lp, buf),
            (jnp.arange(run_keys.shape[0], dtype=jnp.int32), run_keys),
        )
        return x, lp, rates, buf[:n_keep_steps]

    warm_keys = jax.random.split(k_warm, max(n_warmup, 1))
    run_keys = jax.random.split(k_run, n_steps)
    x, lp, rates, kept = run(x, warm_keys, run_keys)
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0,) + x.shape, np.float32)
    )
    return SampleResult(
        chain=chain,
        final=np.asarray(x),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(a),
    )


def _whiten_init(x, lo, span):
    """Raw box coordinates → unbounded sigmoid-whitened ``y``
    (clipped 1e-4 inside the box so boundary starts stay finite)."""
    frac = jnp.clip((x - lo) / span, 1e-4, 1.0 - 1e-4)
    return jnp.log(frac / (1.0 - frac))


def _whitened_target(valgrad, log_prior, lo, span):
    """The gradient-based samplers' shared target: ``(to_params,
    logp_and_grad)`` over the sigmoid-whitened ``y``-space. ``lp`` is
    the log-posterior INCLUDING the log-Jacobian of the sigmoid map (so
    the flat box prior is exact in ``y``), ``glp`` its gradient via the
    chain rule — the one place the raw-space ``valgrad`` and optional
    smooth ``log_prior`` meet the whitening (see module docstring)."""

    def to_params(y):
        return lo + span * jax.nn.sigmoid(y)

    def logp_and_grad(params, y):
        xr = to_params(y)
        ll, g_raw = valgrad(params, xr)
        if log_prior is not None:
            lpr, g_pr = _log_prior_val_grad(log_prior, xr)
            ll = ll + lpr
            g_raw = g_raw + g_pr
        s = jax.nn.sigmoid(y)
        lp = ll + jnp.sum(
            jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
        )
        glp = g_raw * (span * s * (1.0 - s)) + (1.0 - 2.0 * s)
        return lp, glp

    return to_params, logp_and_grad


def _whitened_center(x0, lo, hi):
    """Raw-space center → whitened ``mu0`` (float32), the shared
    ``x0=`` handling of :func:`tpu21cmvae.vi.fit_advi` and
    :func:`tpu21cmvae.flows.fit_flow`. Host-side float64 on purpose
    (a one-off conversion; float32 logit loses digits near the box
    edge). Raises if ``x0`` is not a single ``(P,)`` center."""
    lo = np.asarray(lo, np.float64)
    span = np.asarray(hi, np.float64) - lo
    frac = np.clip(
        (np.asarray(x0, np.float64) - lo) / span, 1e-4, 1.0 - 1e-4
    )
    mu0 = jnp.asarray(np.log(frac / (1.0 - frac)), jnp.float32)
    if mu0.shape != lo.shape:
        raise ValueError(
            f"x0 must be a single ({lo.shape[0]},) center; "
            f"got {np.shape(x0)}"
        )
    return mu0


def _whitened_vi_target(valgrad, lo, span, log_prior, *, span_jac):
    """The variational fitters' shared ELBO integrand: ``(params, y) →
    (target value, y-gradient)`` over the sigmoid-whitened space, using
    only the FIRST-order ``valgrad`` (reparameterization trick). The
    sigmoid is clamped because float32 saturates to exactly 0/1 at
    |y|≳17, which would poison the span-Jacobian with log(0).

    Two equivalent log-Jacobian conventions, chosen by ``span_jac``
    (they differ by the constant ``Σ log span``, which shifts the ELBO
    but not its gradient): ``True`` → ``Σ log(span·s·(1−s))``, the ADVI
    convention (:func:`tpu21cmvae.vi.fit_advi`); ``False`` →
    ``Σ [log σ(y) + log σ(−y)]``, the chain-sampler convention
    (:func:`_whitened_target`) that :func:`tpu21cmvae.flows.fit_flow`
    shares so its ELBO and the flow-IS weights cancel the box volume
    exactly (see :func:`tpu21cmvae.flows.flow_evidence`)."""

    def val_grad(params, y):
        s = jnp.clip(jax.nn.sigmoid(y), 1e-7, 1.0 - 1e-7)
        xr = lo + span * s
        ll, g_raw = valgrad(params, xr)
        if log_prior is not None:
            lpr, g_pr = _log_prior_val_grad(log_prior, xr)
            ll = ll + lpr
            g_raw = g_raw + g_pr
        if span_jac:
            jac = jnp.sum(jnp.log(span * s * (1.0 - s)), axis=-1)
        else:
            jac = jnp.sum(
                jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), axis=-1
            )
        g_y = g_raw * (span * s * (1.0 - s)) + (1.0 - 2.0 * s)
        return ll + jac, g_y

    return val_grad


def _ens_metric(y, dense):
    """Ensemble-statistics metric from the cross-walker spread of ``y``.

    ``dense=False``: per-dimension std, normalized to unit geometric
    mean (dual averaging owns the GLOBAL step scale) and clipped to
    [0.1, 10] so a not-yet-spread dimension cannot zero its step.

    ``dense=True``: the symmetric square root ``L = V·√w·Vᵀ`` of the
    cross-walker covariance, eigenvalues normalized to unit geometric
    mean and clipped to [0.01, 100] (the diagonal clip squared). The
    leapfrog then integrates in the ``L``-whitened space, which removes
    cross-parameter CORRELATIONS the diagonal metric cannot see — on
    correlated posteriors NUTS trees shrink and ChEES trajectories
    shorten accordingly (docs/PERF.md). The covariance deliberately
    uses the FULL ensemble, unconverged stragglers included: their
    spread gives the not-yet-contracted directions large early steps
    (a top-half-by-log-density estimate was measured WORSE — it starves
    exactly those directions). D is tiny here (7), so the eigh and the
    per-step (B,D)@(D,D) matmuls are negligible against the emulator
    chain. Under a sharded walker axis the reductions are GSPMD
    collectives — still one program.
    """
    if not dense:
        raw_sd = jnp.std(y, axis=0)
        sd = raw_sd / jnp.maximum(jnp.exp(
            jnp.mean(jnp.log(jnp.maximum(raw_sd, 1e-6)))
        ), 1e-6)
        return jnp.clip(sd, 0.1, 10.0)
    d = y.shape[1]
    yc = y - jnp.mean(y, axis=0)
    cov = yc.T @ yc / y.shape[0] + 1e-10 * jnp.eye(d, dtype=y.dtype)
    w, v = jnp.linalg.eigh(cov)
    w = jnp.maximum(w, 1e-12)
    w = w / jnp.exp(jnp.mean(jnp.log(w)))
    w = jnp.clip(w, 1e-2, 1e2)
    return (v * jnp.sqrt(w)) @ v.T


def _met_scale(met, v):
    """Metric-space momentum → y-space displacement (``L v``).
    ``met``: (D,) shared diagonal, (B, D) per-walker diagonal (the
    per-block metrics of the batched-observation samplers, expanded to
    rows), or (1|B, D, D) square roots — shared dense carries a leading
    broadcast axis (see :func:`_ens_metric_blocks`) because a bare
    (D, D) would be indistinguishable from a per-walker diagonal
    whenever ``n_walkers == D``. Rank alone now dispatches: ≤2 is
    elementwise diagonal, 3 is a (batched or broadcast) matmul."""
    if met.ndim <= 2:
        return v * met
    return jnp.squeeze(jnp.matmul(met, v[..., None]), -1)


def _met_pull(met, g):
    """y-space gradient → metric-space force (``Lᵀ g``); shapes as in
    :func:`_met_scale`."""
    if met.ndim <= 2:
        return g * met
    return jnp.squeeze(
        jnp.matmul(jnp.swapaxes(met, -1, -2), g[..., None]), -1
    )


def _ens_metric_blocks(y, dense, n_blk):
    """Per-block ensemble metric for batched-observation chains: each
    contiguous walker slab (one observation's posterior) gets its OWN
    cross-walker metric — a pooled metric over a MIXTURE of posteriors
    measures the between-observation spread of the truths, not any
    posterior's geometry. Returns per-walker rows ((B, D) diagonals /
    (B, D, D) square roots) for the per-walker :func:`_met_scale` /
    :func:`_met_pull` paths; the ``n_blk == 1`` dense metric is lifted
    to (1, D, D) so rank disambiguates it from a per-walker diagonal."""
    if n_blk == 1:
        met = _ens_metric(y, dense)
        return met[None] if dense else met
    w = y.shape[0] // n_blk
    yb = y.reshape(n_blk, w, y.shape[1])
    mets = jax.vmap(lambda yy: _ens_metric(yy, dense))(yb)
    return jnp.repeat(mets, w, axis=0)


def _resolve_metric(metric, precondition, n_warmup, n_walkers,
                    auto_dense):
    """Shared policy for the gradient samplers: returns ``(use_metric,
    dense)``. ``metric``: "dense", "diag", or "auto" — which resolves
    per sampler (``auto_dense``): NUTS defaults dense (per-walker trees
    re-adapt the trajectory every draw, so a noisy mid-warmup rotation
    costs depth, never correctness — and on correlated targets the
    whitening collapses the trees, measured in docs/PERF.md);
    HMC/ChEES default diag (their trajectory is fixed after warmup —
    a rotation estimated from a still-converging ensemble was measured
    to slow the sharp-posterior stragglers where the diagonal's
    straggler-inflated scales help)."""
    if metric not in ("auto", "dense", "diag"):
        raise ValueError(
            f'metric must be "auto", "dense" or "diag"; got {metric!r}'
        )
    use_metric = precondition and n_warmup >= 20 and n_walkers >= 16
    dense = metric == "dense" or (metric == "auto" and auto_dense)
    return use_metric, use_metric and dense


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
    adapt_blocks: int = 1,
    thin: int = 5,
    seed: int = 0,
    x0=None,
    jitter: bool = True,
    precondition: bool = True,
    metric: str = "auto",
    log_prior=None,
    mesh=None,
) -> SampleResult:
    """HMC ensemble over ``valgrad(params, raw) → (logL, dlogL/raw)``.

    ``adapt_blocks=G``: keep G independent dual-averaged step sizes,
    one per contiguous walker block — the batched-observation path
    passes ``G = n_obs`` so each observation's posterior gets its own
    step (see :func:`sample_mh`). The ensemble metric stays POOLED
    across blocks deliberately: it is normalized to unit geometric
    mean (shape only — dual averaging owns the scale), and the per-
    block scale difference is exactly what the per-block step absorbs.

    ``valgrad`` is typically ``DirectEmulator.loglik_and_grad_fn(obs,
    noise_var)`` (bench-selected fused value+gradient kernel on TPU).
    Sampling happens in the sigmoid-whitened ``y``-space (flat box prior
    exact via the Jacobian term); warmup adapts the leapfrog step by
    dual averaging toward ``target_accept``, then the sampling phase
    runs at the adapted step. Both phases are single ``lax.scan``
    programs.

    Two robustness features (both valid-MCMC — they change mixing
    speed, never the target):

    * ``precondition`` — a mass matrix from ENSEMBLE statistics:
      halfway through warmup the leapfrog rescales by the cross-walker
      spread of ``y`` (thousands of walkers give an instantaneous
      estimate — no within-chain adaptation windows, the
      accelerator-ensemble analogue of NUTS's metric warmup), and dual
      averaging restarts at the rescaled step. ``metric`` picks the
      shape: ``"diag"`` is the per-dimension std (fixes scale
      mismatches); ``"dense"`` is the symmetric square root of the full
      cross-walker COVARIANCE (additionally removes correlations — the
      leapfrog integrates in the whitened space, a (B,D)@(D,D) matmul
      per half-step, negligible at D=7); ``"auto"`` (default) resolves
      per sampler — diag here and in :func:`sample_chees` (the
      trajectory is frozen after warmup, so a rotation estimated from
      a still-converging ensemble can starve the straggler directions
      — measured), dense in :func:`sample_nuts` (per-walker trees
      re-adapt every draw; see `_resolve_metric`).
    * ``jitter`` — each iteration draws its leapfrog count uniformly
      from ``{⌈n_leapfrog/2⌉ … n_leapfrog}`` (shared by all walkers;
      independent of state, so detailed balance is untouched). Breaks
      the periodic-orbit resonances a fixed trajectory length is
      vulnerable to (Neal 2011 §3.2). The count is a traced scalar: the
      leapfrog runs as a ``lax.fori_loop`` with a dynamic trip count —
      one compiled program, no per-length retraces.

    ``log_prior``: optional SMOOTH traceable log-density over RAW
    parameters added to the target (see :func:`sample_mh` /
    :mod:`tpu21cmvae.priors`); its gradient enters the leapfrog force
    via autodiff, so it must be differentiable inside the box.
    ``mesh``: optional device mesh — walkers shard across it (see
    :func:`sample_mh`); the ensemble-statistics metric's cross-walker
    std is the one (scalar-sized) collective per warmup phase.
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    if n_walkers % adapt_blocks:
        raise ValueError(
            f"n_walkers ({n_walkers}) must divide into adapt_blocks "
            f"({adapt_blocks}) equal contiguous blocks"
        )
    n_blk = int(adapt_blocks)
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = _shard_walkers(
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi),
        mesh,
    )
    y = _whiten_init(x, lo, span)
    to_params, logp_and_grad = _whitened_target(valgrad, log_prior, lo, span)

    # metric estimation needs enough walkers for a stable cross-walker
    # spread and enough warmup for phase 2 to re-adapt the step
    use_metric, dense = _resolve_metric(
        metric, precondition, n_warmup, y.shape[0],
        auto_dense=False,
    )
    n_warm1 = n_warmup // 2 if use_metric else n_warmup

    l_min = max(1, (n_leapfrog + 1) // 2)

    def draw_l(k):
        if not jitter or l_min == n_leapfrog:
            return jnp.int32(n_leapfrog)
        return jax.random.randint(k, (), l_min, n_leapfrog + 1)

    def hmc_step(params, y, lp, glp, met, eps_blk, n_leap, k):
        # ``eps_blk``: (adapt_blocks,) per-block steps, expanded to
        # rows; ``met``: the ensemble metric (a (D,) diagonal or (D,D)
        # dense square root — momenta live in the metric-whitened
        # space, positions in ``y``, the standard mass-matrix
        # equivalence); ``n_leap``: traced leapfrog count.
        eps = jnp.repeat(eps_blk, y.shape[0] // n_blk)[:, None]
        kp, ku = jax.random.split(k)
        p0 = jax.random.normal(kp, y.shape, y.dtype)
        p = p0 + 0.5 * eps * _met_pull(met, glp)

        def leap(_, qpg):
            q, p, g = qpg
            q = q + eps * _met_scale(met, p)
            _, g = logp_and_grad(params, q)
            p = p + eps * _met_pull(met, g)
            return q, p, g

        q, p, g = jax.lax.fori_loop(0, n_leap - 1, leap, (y, p, glp))
        q = q + eps * _met_scale(met, p)
        lp_new, g_new = logp_and_grad(params, q)
        p = p + 0.5 * eps * _met_pull(met, g_new)
        dh = (lp_new - lp) - 0.5 * (jnp.sum(p**2, -1) - jnp.sum(p0**2, -1))
        acc = jnp.log(jax.random.uniform(ku, (y.shape[0],))) < dh
        # recover walkers with a non-finite current lp (see sample_mh)
        acc = acc | (~jnp.isfinite(lp) & jnp.isfinite(lp_new))
        y = jnp.where(acc[:, None], q, y)
        lp = jnp.where(acc, lp_new, lp)
        glp = jnp.where(acc[:, None], g_new, glp)
        # per-block mean Metropolis probability (capped at 1; NaN dh —
        # diverged trajectory — counts as 0) drives adaptation
        a = jnp.where(
            jnp.isfinite(dh), jnp.minimum(1.0, jnp.exp(dh)), 0.0
        )
        return y, lp, glp, a.reshape(n_blk, -1).mean(axis=1)

    # dual averaging (Hoffman & Gelman 2014, Alg. 5) — all in-carry;
    # ``mu`` is traced so a post-preconditioning restart can re-anchor
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def make_warm_step(params):
        def warm_step(state, ik):
            i, k = ik
            kl, kh = jax.random.split(k)
            y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar = state
            y, lp, glp, a_mean = hmc_step(
                params, y, lp, glp, sd, jnp.exp(log_eps), draw_l(kl), kh
            )
            t = i + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                target_accept - a_mean
            ) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (
                y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar
            ), a_mean

        return warm_step

    def warm_phase(params, y, lp, glp, sd, eps0, ik):
        # ``eps0``: (adapt_blocks,) — the dual-averaging state is a
        # per-block vector throughout (every update is elementwise)
        state = (
            y, lp, glp, sd, jnp.log(10.0 * eps0), jnp.log(eps0),
            jnp.log(eps0), jnp.zeros_like(eps0),
        )
        state, _ = jax.lax.scan(make_warm_step(params), state, ik)
        y, lp, glp, _, _, _, log_eps_bar, _ = state
        return y, lp, glp, jnp.exp(log_eps_bar)

    def build_run():
        def run(params, y, warm1_ik, warm2_ik, run_keys):
            def run_step(state, tk):
                t, k = tk
                y, lp, glp, sd, eps, buf = state
                kl, kh = jax.random.split(k)
                y, lp, glp, a_mean = hmc_step(
                    params, y, lp, glp, sd, eps, draw_l(kl), kh
                )
                if thin:
                    buf = _thin_write(
                        buf, t, to_params(y), thin, n_keep
                    )
                return (y, lp, glp, sd, eps, buf), jnp.mean(a_mean)

            lp, glp = logp_and_grad(params, y)
            sd = jnp.ones((y.shape[1],), y.dtype)
            eps = jnp.full((n_blk,), init_step, jnp.float32)
            if n_warm1 > 0:  # static — no hidden warmup on continuation
                y, lp, glp, eps = warm_phase(
                    params, y, lp, glp, sd, eps, warm1_ik
                )
            if use_metric:
                sd = _ens_metric_blocks(y, dense, 1)
                y, lp, glp, eps = warm_phase(
                    params, y, lp, glp, sd, eps, warm2_ik
                )
                # (no post-warmup metric refresh here: with a FIXED
                # trajectory length the step cannot re-adapt to the
                # refreshed geometry — measured worse on the correlated
                # Gaussian; ChEES/NUTS refresh because their
                # trajectories adapt per step)
            n_keep, buf = _thin_state(run_keys.shape[0], thin, y)
            (y, lp, glp, _, _, buf), rates = jax.lax.scan(
                run_step, (y, lp, glp, sd, eps, buf),
                (jnp.arange(run_keys.shape[0], dtype=jnp.int32),
                 run_keys),
            )
            return y, lp, rates, buf[:n_keep], eps

        return jax.jit(run)

    run = _chain_program(
        valgrad,
        (
            "hmc", _bounds_key(lo, hi), float(init_step),
            float(target_accept), bool(jitter), bool(precondition),
            n_blk, int(thin), int(n_leapfrog), use_metric, dense,
            n_warm1 > 0, _fn_cache_key(log_prior),
        ),
        build_run,
    )

    def ik(k, n):
        n = max(n, 1)
        return (jnp.arange(n, dtype=jnp.float32), jax.random.split(k, n))

    k_warm1, k_warm2 = jax.random.split(k_warm)
    run_keys = jax.random.split(k_run, n_steps)
    y, lp, rates, kept, eps = run(
        params, y, ik(k_warm1, n_warm1), ik(k_warm2, n_warmup - n_warm1),
        run_keys,
    )
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0, y.shape[0], y.shape[1]), np.float32)
    )
    return SampleResult(
        chain=chain,
        final=np.asarray(to_params(y)),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(np.mean(np.asarray(eps))),
        block_step_sizes=np.asarray(eps),
    )


def _vdc(i):
    """Van der Corput base-2 sequence of a traced int32 index — the
    32-bit reversal of ``i+1`` read as a binary fraction in (0, 1).
    Used as the quasi-random trajectory jitter in :func:`sample_chees`
    (Hoffman, Radul & Sountsov 2021 §4 use the same Halton jitter):
    low-discrepancy coverage of trajectory fractions beats iid uniform
    for both the ChEES gradient estimate and the sampling phase, and it
    is deterministic in the step index — no extra RNG stream."""
    b = (i + 1).astype(jnp.uint32)
    b = ((b & jnp.uint32(0x55555555)) << 1) | ((b & jnp.uint32(0xAAAAAAAA)) >> 1)
    b = ((b & jnp.uint32(0x33333333)) << 2) | ((b & jnp.uint32(0xCCCCCCCC)) >> 2)
    b = ((b & jnp.uint32(0x0F0F0F0F)) << 4) | ((b & jnp.uint32(0xF0F0F0F0)) >> 4)
    b = ((b & jnp.uint32(0x00FF00FF)) << 8) | ((b & jnp.uint32(0xFF00FF00)) >> 8)
    b = (b << 16) | (b >> 16)
    return b.astype(jnp.float32) * jnp.float32(2.0**-32)


@dataclasses.dataclass
class ChEESSampleResult(SampleResult):
    """:class:`SampleResult` from :func:`sample_chees`, plus the
    adapted total trajectory time ``trajectory_length`` (whitened
    ``y``-space units): each iteration integrates for ``u·τ`` — ``u``
    the Halton jitter fraction — so the mean leapfrog count is
    ``≈ τ/(2·step_size)``. A ``trajectory_length`` pinned at
    ``step_size·max_leapfrog`` means the cap bound the adaptation —
    raise ``max_leapfrog``."""

    trajectory_length: float = 0.0


def sample_chees(
    valgrad,
    params,
    *,
    n_walkers: int = 4096,
    n_steps: int = 200,
    n_warmup: int = 300,
    bounds=None,
    target_accept: float = 0.651,
    init_step: float = 0.01,
    init_traj: Optional[float] = None,
    max_leapfrog: int = 128,
    traj_lr: float = 0.05,
    thin: int = 5,
    seed: int = 0,
    x0=None,
    precondition: bool = True,
    metric: str = "auto",
    log_prior=None,
    mesh=None,
) -> ChEESSampleResult:
    """ChEES-HMC: HMC with the trajectory length adapted from ensemble
    statistics (Hoffman, Radul & Sountsov 2021, "An Adaptive-MCMC
    Scheme for Setting Trajectory Lengths in Hamiltonian Monte Carlo")
    — the accelerator-native answer to "how long should HMC integrate?".

    NUTS answers that question with per-chain dynamic tree building —
    recursion, data-dependent trip counts, and early exits that are
    hostile to batched SPMD execution (every walker would pay the
    slowest tree, and the tree state is a stack). ChEES-HMC gets the
    same adaptivity from the ensemble instead: all walkers share one
    jittered trajectory per iteration, and warmup ascends the ChEES
    criterion — the expected squared change of the squared distance
    from the posterior mean, a proxy for maximizing ESS of second
    moments — whose gradient with respect to the trajectory time has a
    closed form in the endpoint momentum (their eq. 8). The result
    keeps every iteration a fixed-shape batched leapfrog (MXU-friendly,
    one compiled program) while matching NUTS-quality trajectory
    tuning; the paper finds it competitive with or better than NUTS
    across their benchmark posteriors.

    Mechanics (all inside two ``lax.scan`` programs, like
    :func:`sample_hmc`):

    * iteration ``i`` integrates for time ``u_i·τ`` where ``u_i`` is
      the base-2 van der Corput (Halton) fraction of the global step
      index — state-independent, so detailed balance is untouched —
      and the leapfrog count is ``ceil(u_i·τ/ε)``, a traced dynamic
      ``fori_loop`` trip count (no per-length retraces);
    * warmup adapts ``ε`` by dual averaging toward ``target_accept``
      (0.651 is the ChEES paper's choice) exactly as in
      :func:`sample_hmc`, and ``log τ`` by Adam ascent (lr
      ``traj_lr``) on the per-iteration ChEES gradient, iterate-
      averaged with the same ``t^{-0.75}`` weights; ``τ`` is clamped
      to ``[ε, ε·max_leapfrog]``;
    * ``precondition``/``metric`` reuse the ensemble-statistics metric
      (halfway restart) from :func:`sample_hmc`; ``metric="dense"``
      opts into the covariance square root, so the trajectory
      adaptation only has to learn the residual whitened geometry
      (``"auto"`` stays diag here — see `_resolve_metric`).

    ``valgrad``/``bounds``/``log_prior``/``mesh``/``thin`` as in
    :func:`sample_hmc` (the ChEES gradient adds one cross-walker mean
    per warmup iteration — a scalar-sized collective under ``mesh``).
    Prefer this over :func:`sample_hmc` when the trajectory length is
    unknown: on anisotropic targets a mistuned fixed ``n_leapfrog``
    costs orders of magnitude in ESS, which is exactly what the
    adaptation recovers (``tests/test_sampling.py``).
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = _shard_walkers(
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi),
        mesh,
    )
    y = _whiten_init(x, lo, span)
    to_params, logp_and_grad = _whitened_target(valgrad, log_prior, lo, span)

    use_metric, dense = _resolve_metric(
        metric, precondition, n_warmup, y.shape[0],
        auto_dense=False,
    )
    n_warm1 = n_warmup // 2 if use_metric else n_warmup
    h0 = float(init_traj) if init_traj is not None else 8.0 * init_step
    gamma, t0, kappa = 0.05, 10.0, 0.75  # dual averaging (H&G Alg. 5)
    b1, b2, adam_eps = 0.9, 0.99, 1e-8  # Adam on log τ
    log_cap = float(np.log(max_leapfrog))

    def chees_step(params, y, lp, glp, sd, eps_s, h, u, k, want_grad):
        # ``eps_s``: scalar step; ``sd``: the ensemble metric ((D,)
        # diagonal or (D,D) dense square root); ``h``: total trajectory
        # time; ``u``: this iteration's jitter fraction. ``want_grad``
        # is static — the sampling phase skips the ChEES-gradient
        # arithmetic (and its cross-walker mean).
        n_leap = jnp.clip(
            jnp.ceil(u * h / eps_s).astype(jnp.int32), 1, max_leapfrog
        )
        kp, ku = jax.random.split(k)
        p0 = jax.random.normal(kp, y.shape, y.dtype)
        p = p0 + 0.5 * eps_s * _met_pull(sd, glp)

        def leap(_, qpg):
            q, p, g = qpg
            q = q + eps_s * _met_scale(sd, p)
            _, g = logp_and_grad(params, q)
            p = p + eps_s * _met_pull(sd, g)
            return q, p, g

        q, p, g = jax.lax.fori_loop(0, n_leap - 1, leap, (y, p, glp))
        q = q + eps_s * _met_scale(sd, p)
        lp_new, g_new = logp_and_grad(params, q)
        p_end = p + 0.5 * eps_s * _met_pull(sd, g_new)
        dh = (lp_new - lp) - 0.5 * (
            jnp.sum(p_end**2, -1) - jnp.sum(p0**2, -1)
        )
        if want_grad:
            # ChEES gradient wrt log τ (Hoffman et al. 2021 eq. 8):
            # Δ·⟨q'−m, dq'/dt⟩ per walker, accept-prob weighted, with
            # dt/dlogτ ∝ u·τ — the constant τ is absorbed by Adam's
            # scale invariance, the per-iteration u is not. Velocity in
            # scalar-time units is L·p (metric chain rule).
            alpha = jnp.exp(jnp.minimum(dh, 0.0))
            m = jnp.mean(y, axis=0)
            dqp = q - m
            delta = jnp.sum(dqp**2, -1) - jnp.sum((y - m) ** 2, -1)
            dot = jnp.sum(dqp * _met_scale(sd, p_end), -1)
            per = alpha * u * delta * dot
            ok = jnp.isfinite(per)
            w = jnp.where(ok, alpha, 0.0)
            g_logh = jnp.sum(jnp.where(ok, per, 0.0)) / jnp.maximum(
                jnp.sum(w), 1e-6
            )
        else:
            g_logh = jnp.float32(0.0)
        acc = jnp.log(jax.random.uniform(ku, (y.shape[0],))) < dh
        acc = acc | (~jnp.isfinite(lp) & jnp.isfinite(lp_new))
        y = jnp.where(acc[:, None], q, y)
        lp = jnp.where(acc, lp_new, lp)
        glp = jnp.where(acc[:, None], g_new, glp)
        a_mean = jnp.mean(jnp.minimum(1.0, jnp.exp(dh)))
        return y, lp, glp, a_mean, g_logh

    def make_warm_step(params):
        def warm_step(state, txk):
            t, i, k = txk
            (y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar,
             log_h, log_h_bar, m_a, v_a) = state
            y, lp, glp, a_mean, g = chees_step(
                params, y, lp, glp, sd, jnp.exp(log_eps),
                jnp.exp(log_h), _vdc(i), k, True,
            )
            # dual averaging on log ε (identical to sample_hmc)
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                target_accept - a_mean
            ) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            # Adam ascent on log τ, clamped to the leapfrog budget
            m_a = b1 * m_a + (1.0 - b1) * g
            v_a = b2 * v_a + (1.0 - b2) * g * g
            mhat = m_a / (1.0 - b1**t)
            vhat = v_a / (1.0 - b2**t)
            log_h = log_h + traj_lr * mhat / (jnp.sqrt(vhat) + adam_eps)
            log_h = jnp.clip(log_h, log_eps, log_eps + log_cap)
            log_h_bar = w * log_h + (1.0 - w) * log_h_bar
            return (
                y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar,
                log_h, log_h_bar, m_a, v_a,
            ), a_mean

        return warm_step

    def warm_phase(params, y, lp, glp, sd, eps0, h0, txk):
        state = (
            y, lp, glp, sd, jnp.log(10.0 * eps0), jnp.log(eps0),
            jnp.log(eps0), jnp.float32(0.0), jnp.log(h0), jnp.log(h0),
            jnp.float32(0.0), jnp.float32(0.0),
        )
        state, _ = jax.lax.scan(make_warm_step(params), state, txk)
        y, lp, glp = state[0], state[1], state[2]
        return y, lp, glp, jnp.exp(state[6]), jnp.exp(state[9])

    def build_run():
        def run(params, y, warm1_txk, warm2_txk, run_ixk):
            def run_step(state, ixk):
                i, k = ixk
                y, lp, glp, sd, eps, h, buf = state
                y, lp, glp, a_mean, _ = chees_step(
                    params, y, lp, glp, sd, eps, h, _vdc(i), k, False
                )
                if thin:
                    # i is the GLOBAL step index (warmup offset, for
                    # the van-der-Corput jitter); thinning counts
                    # post-warmup steps
                    buf = _thin_write(
                        buf, i - n_warmup, to_params(y), thin, n_keep
                    )
                return (y, lp, glp, sd, eps, h, buf), a_mean

            lp, glp = logp_and_grad(params, y)
            sd = jnp.ones((y.shape[1],), y.dtype)
            eps = jnp.float32(init_step)
            h = jnp.float32(h0)
            if n_warm1 > 0:  # static — no hidden warmup on continuation
                y, lp, glp, eps, h = warm_phase(
                    params, y, lp, glp, sd, eps, h, warm1_txk
                )
            if use_metric:
                sd = _ens_metric_blocks(y, dense, 1)
                y, lp, glp, eps, h = warm_phase(
                    params, y, lp, glp, sd, eps, h, warm2_txk
                )
                # (no post-warmup metric refresh: like sample_hmc, the
                # adapted step+trajectory cannot re-tune to refreshed
                # geometry — measured acceptance collapse on a sharp
                # emulator posterior; NUTS refreshes because per-walker
                # trees re-adapt the trajectory every draw)
            n_keep, buf = _thin_state(run_ixk[0].shape[0], thin, y)
            (y, lp, glp, _, _, _, buf), rates = jax.lax.scan(
                run_step, (y, lp, glp, sd, eps, h, buf), run_ixk
            )
            return y, lp, rates, buf[:n_keep], eps, h

        return jax.jit(run)

    run = _chain_program(
        valgrad,
        (
            "chees", _bounds_key(lo, hi), float(init_step), float(h0),
            float(target_accept), float(traj_lr), int(thin),
            int(max_leapfrog), use_metric, dense, n_warm1 > 0,
            _fn_cache_key(log_prior),
        ),
        build_run,
    )

    def txk(k, n, start):
        n_pad = max(n, 1)
        return (
            jnp.arange(1, n_pad + 1, dtype=jnp.float32),
            jnp.arange(start, start + n_pad, dtype=jnp.int32),
            jax.random.split(k, n_pad),
        )

    def ixk(k, n, start):
        return (
            jnp.arange(start, start + n, dtype=jnp.int32),
            jax.random.split(k, n),
        )

    k_warm1, k_warm2 = jax.random.split(k_warm)
    n_warm2 = n_warmup - n_warm1
    y, lp, rates, kept, eps, h = run(
        params, y, txk(k_warm1, n_warm1, 0), txk(k_warm2, n_warm2, n_warm1),
        ixk(k_run, n_steps, n_warmup),
    )
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0, y.shape[0], y.shape[1]), np.float32)
    )
    return ChEESSampleResult(
        chain=chain,
        final=np.asarray(to_params(y)),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(eps),
        trajectory_length=float(h),
    )


def _popcount32(n):
    """Population count of a traced int32/uint32 (Hacker's Delight
    fig. 5-2) — checkpoint indexing for :func:`sample_nuts`'s iterative
    tree building."""
    n = n.astype(jnp.uint32)
    n = n - ((n >> 1) & jnp.uint32(0x55555555))
    n = (n & jnp.uint32(0x33333333)) + ((n >> 2) & jnp.uint32(0x33333333))
    n = (n + (n >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((n * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


@dataclasses.dataclass
class NUTSSampleResult(SampleResult):
    """:class:`SampleResult` from :func:`sample_nuts`, plus NUTS-specific
    diagnostics: ``divergence_rate`` — fraction of (draw, walker) pairs
    whose trajectory hit a divergence (ΔH > 1000; a nonzero rate on a
    smooth emulator posterior means the step size adapted too large —
    lower ``target_accept``... or raise it, Stan-style, toward 0.95);
    ``mean_leapfrog`` — mean leapfrog steps per draw per walker (the
    cost knob: compare against ``2**max_depth - 1`` to see whether the
    U-turn criterion, not the depth cap, is ending trajectories)."""

    divergence_rate: float = 0.0
    mean_leapfrog: float = 0.0


def sample_nuts(
    valgrad,
    params,
    *,
    n_walkers: int = 4096,
    n_steps: int = 200,
    n_warmup: int = 300,
    max_depth: int = 6,
    bounds=None,
    target_accept: float = 0.8,
    init_step: float = 0.01,
    thin: int = 5,
    seed: int = 0,
    x0=None,
    precondition: bool = True,
    metric: str = "auto",
    log_prior=None,
    mesh=None,
    adapt_blocks: int = 1,
) -> NUTSSampleResult:
    """No-U-Turn Sampler (multinomial NUTS) over ``valgrad``, built as a
    BATCHED ITERATIVE tree — the TPU-native formulation of the sampler
    Stan/PyMC/NumPyro users expect.

    ``adapt_blocks=G``: keep G independent dual-averaged step sizes AND
    G independent ensemble metrics, one per contiguous walker block —
    the batched-observation mode (``sample_posterior_batch``), where
    each block is one observation's posterior. Pooling would be wrong
    twice over there: one step size compromises across heterogeneous
    posterior widths (as in :func:`sample_hmc`), and a pooled
    cross-walker metric measures the BETWEEN-observation spread of the
    posterior locations, not any posterior's local geometry — the
    per-block metric (:func:`_ens_metric_blocks`) is what makes
    whitened per-walker trees meaningful per observation.

    Textbook NUTS is recursive with data-dependent trajectory lengths —
    hostile to SPMD batching (see :func:`sample_chees`, which remains
    the recommended adaptive sampler on TPU: measured numbers in
    docs/PERF.md). This implementation removes the recursion, not the
    algorithm: per draw, trajectory doubling ``d = 0 … max_depth-1``
    runs as an unrolled loop of fixed-shape subtree builds (one
    ``fori_loop`` of ``2**d`` leapfrog steps, each one batched MXU
    call across all walkers), with

    * **multinomial sampling** within and across subtrees (Betancourt
      2017 §A.3): streaming categorical by cumulative ``logaddexp``
      weight within a subtree, biased-progressive acceptance
      ``min(1, w_subtree/w_tree)`` across subtrees;
    * **sub-U-turn checks without recursion** via the checkpoint-stack
      scheme (as in NumPyro's iterative NUTS): build-order leaf ``i``
      stores its (momentum, cumulative-momentum-sum) at stack slot
      ``popcount(i)`` when ``i`` is even, and when odd checks the
      generalized U-turn criterion ``⟨ρ_seg, p_left⟩ ≤ 0 ∨
      ⟨ρ_seg, p_right⟩ ≤ 0`` against slots ``[popcount(i) -
      tz(i+1), popcount(i) - 1]`` — exactly the complete sub-subtrees
      ending at leaf ``i``, with ``ρ_seg`` recovered from the stored
      cumulative sums. ``max_depth`` stack slots suffice;
    * **lockstep walkers with masked termination**: every walker runs
      every doubling until ALL are done (then a ``lax.cond`` skips the
      remaining depths); finished walkers' updates are ``where``-masked.
      This lockstep cost — each draw pays the slowest walker's tree —
      is exactly why ChEES wins on throughput; NUTS is here for
      robustness (per-walker trajectory adaptation, divergence
      diagnostics) and ecosystem parity;
    * step-size warmup by dual averaging toward ``target_accept``
      (Stan's accept-stat: trajectory-mean ``min(1, e^{-ΔH})``), with
      the ensemble-statistics metric restart of :func:`sample_hmc`
      under ``precondition`` (``metric="auto"`` → DENSE cross-walker
      covariance square root: on correlated posteriors the whitened
      trees terminate orders-of-magnitude earlier — measured
      mean-leapfrog numbers in docs/PERF.md).

    ``valgrad``/``bounds``/``log_prior``/``mesh``/``thin``/``x0`` as in
    :func:`sample_hmc`; sampling happens in the same sigmoid-whitened
    ``y``-space. Divergences (ΔH > 1000, Stan's threshold) end the
    walker's trajectory with the offending subtree discarded and are
    reported in ``divergence_rate``. The reference leaves sampling to
    external CPU samplers entirely (``README.rst:9-11``).
    """
    lo, hi = _resolve_bounds(bounds)
    span = hi - lo
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    x = _shard_walkers(
        jnp.asarray(x0, jnp.float32)
        if x0 is not None
        else _init_walkers(k_init, n_walkers, lo, hi),
        mesh,
    )
    y = _whiten_init(x, lo, span)
    to_params, logp_and_grad = _whitened_target(valgrad, log_prior, lo, span)

    if n_walkers % adapt_blocks:
        raise ValueError(
            f"n_walkers ({n_walkers}) must divide into adapt_blocks "
            f"({adapt_blocks}) equal contiguous blocks"
        )
    n_blk = int(adapt_blocks)
    use_metric, dense = _resolve_metric(
        metric, precondition, n_warmup, y.shape[0] // n_blk,
        auto_dense=True,
    )
    n_warm1 = n_warmup // 2 if use_metric else n_warmup
    gamma, t0, kappa = 0.05, 10.0, 0.75  # dual averaging (H&G Alg. 5)
    md = int(max_depth)
    if md < 1:
        raise ValueError(f"max_depth must be >= 1; got {max_depth}")

    def nuts_step(params, y, lp, glp, sd, eps_blk, k):
        B, D = y.shape
        # (adapt_blocks,) per-block steps, expanded to walker rows
        eps_w = jnp.repeat(eps_blk, B // n_blk)
        kp, kt = jax.random.split(k)
        p0 = jax.random.normal(kp, (B, D), y.dtype)
        h0 = lp - 0.5 * jnp.sum(p0**2, -1)  # leaf log-weight base

        def build(state, kd, d):
            (zl, pl, gl, zr, pr, gr, zp, lpp, gp, rho, logw, done,
             ndiv, a_sum, a_cnt, nleap) = state
            k_dir, k_take, k_sub = jax.random.split(kd, 3)
            right = jax.random.bernoulli(k_dir, 0.5, (B,))
            # per-walker signed SCALAR step; the metric enters through
            # _met_scale/_met_pull in the leapfrog below
            eps_d = jnp.where(right, eps_w, -eps_w)[:, None]
            z0 = jnp.where(right[:, None], zr, zl)
            q0 = jnp.where(right[:, None], pr, pl)
            g0 = jnp.where(right[:, None], gr, gl)
            n_ck = max(d, 1)

            def leaf(i, carry):
                (z, p, g, cum, lw, zs, ls, gs, turn, div, pck, rck,
                 asum, k_s) = carry
                k_s, ku = jax.random.split(k_s)
                ph = p + 0.5 * eps_d * _met_pull(sd, g)
                z2 = z + eps_d * _met_scale(sd, ph)
                lp2, g2 = logp_and_grad(params, z2)
                p2 = ph + 0.5 * eps_d * _met_pull(sd, g2)
                w = lp2 - 0.5 * jnp.sum(p2**2, -1) - h0
                w = jnp.where(jnp.isfinite(w), w, -jnp.inf)
                div = div | (w < -1000.0)
                lw_new = jnp.logaddexp(lw, w)
                # streaming multinomial within the subtree: leaf i wins
                # the proposal slot with prob w_i / Σ_{j≤i} w_j
                take = jnp.log(
                    jax.random.uniform(ku, (B,))
                ) < (w - lw_new)
                zs = jnp.where(take[:, None], z2, zs)
                ls = jnp.where(take, lp2, ls)
                gs = jnp.where(take[:, None], g2, gs)
                cum = cum + p2
                pc = _popcount32(i)
                even = (i % 2) == 0
                slot = jnp.where(even, pc, 0)
                # even leaf: store (p, cumulative ρ) at slot popcount(i)
                # (odd leaves write the old value back — a no-op)
                pck = pck.at[slot].set(
                    jnp.where(even, p2, pck[slot])
                )
                rck = rck.at[slot].set(
                    jnp.where(even, cum, rck[slot])
                )
                # odd leaf: U-turn-check the complete sub-subtrees
                # ending here — checkpoint slots [pc - tz(i+1), pc - 1]
                tz = _popcount32(~(i + 1) & i)
                smin, smax = pc - tz, pc - 1

                def chk(s, turn):
                    seg = cum - rck[s] + pck[s]
                    t_s = (
                        jnp.sum(seg * pck[s], -1) <= 0.0
                    ) | (jnp.sum(seg * p2, -1) <= 0.0)
                    m = (~even) & (s >= smin) & (s <= smax)
                    return turn | (m & t_s)

                turn = jax.lax.fori_loop(0, n_ck, chk, turn)
                asum = asum + jnp.where(
                    ~done, jnp.minimum(1.0, jnp.exp(w)), 0.0
                )
                return (
                    z2, p2, g2, cum, lw_new, zs, ls, gs, turn, div,
                    pck, rck, asum, k_s,
                )

            zeros_ck = jnp.zeros((n_ck, B, D), y.dtype)
            init = (
                z0, q0, g0, jnp.zeros((B, D), y.dtype),
                jnp.full((B,), -jnp.inf, y.dtype), z0,
                jnp.full((B,), -jnp.inf, y.dtype), g0,
                jnp.zeros((B,), bool), jnp.zeros((B,), bool),
                zeros_ck, zeros_ck, a_sum, k_sub,
            )
            (z_e, p_e, g_e, rho_sub, lw_sub, zs, ls, gs, turn_s,
             div_s, _, _, a_sum, _) = jax.lax.fori_loop(
                0, 2**d, leaf, init
            )
            ok = (~done) & (~turn_s) & (~div_s)
            # biased-progressive acceptance of the new subtree's proposal
            take = ok & (
                jnp.log(jax.random.uniform(k_take, (B,)))
                < (lw_sub - logw)
            )
            zp = jnp.where(take[:, None], zs, zp)
            lpp = jnp.where(take, ls, lpp)
            gp = jnp.where(take[:, None], gs, gp)
            logw = jnp.where(ok, jnp.logaddexp(logw, lw_sub), logw)
            rho = jnp.where(ok[:, None], rho + rho_sub, rho)
            upd_r = (ok & right)[:, None]
            upd_l = (ok & ~right)[:, None]
            zr = jnp.where(upd_r, z_e, zr)
            pr = jnp.where(upd_r, p_e, pr)
            gr = jnp.where(upd_r, g_e, gr)
            zl = jnp.where(upd_l, z_e, zl)
            pl = jnp.where(upd_l, p_e, pl)
            gl = jnp.where(upd_l, g_e, gl)
            full_turn = (jnp.sum(rho * pl, -1) <= 0.0) | (
                jnp.sum(rho * pr, -1) <= 0.0
            )
            ndiv = ndiv + jnp.where((~done) & div_s, 1.0, 0.0)
            nleap = nleap + jnp.where(~done, float(2**d), 0.0)
            a_cnt = a_cnt + jnp.where(~done, float(2**d), 0.0)
            done = done | turn_s | div_s | (ok & full_turn)
            return (zl, pl, gl, zr, pr, gr, zp, lpp, gp, rho, logw,
                    done, ndiv, a_sum, a_cnt, nleap)

        zb = jnp.zeros((B,), jnp.float32)
        state = (
            y, p0, glp, y, p0, glp, y, lp, glp, p0,
            jnp.zeros((B,), y.dtype), jnp.zeros((B,), bool),
            zb, zb, zb, zb,
        )
        for d in range(md):
            kd = jax.random.fold_in(kt, d)
            state = jax.lax.cond(
                jnp.all(state[11]),
                lambda s: s,
                lambda s, _kd=kd, _d=d: build(s, _kd, _d),
                state,
            )
        (_, _, _, _, _, _, zp, lpp, gp, _, _, _, ndiv, a_sum, a_cnt,
         nleap) = state
        # (adapt_blocks,) per-block mean accept-stat drives adaptation
        a_blk = (
            a_sum / jnp.maximum(a_cnt, 1.0)
        ).reshape(n_blk, -1).mean(axis=1)
        return (
            zp, lpp, gp, a_blk,
            jnp.mean((ndiv > 0).astype(jnp.float32)), jnp.mean(nleap),
        )

    def make_warm_step(params):
        def warm_step(state, ik):
            i, k = ik
            y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar = state
            y, lp, glp, a_mean, _, _ = nuts_step(
                params, y, lp, glp, sd, jnp.exp(log_eps), k
            )
            t = i + 1.0
            h_bar = (1.0 - 1.0 / (t + t0)) * h_bar + (
                target_accept - a_mean
            ) / (t + t0)
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (
                y, lp, glp, sd, mu, log_eps, log_eps_bar, h_bar
            ), a_mean

        return warm_step

    def warm_phase(params, y, lp, glp, sd, eps0, ik):
        # ``eps0``: (adapt_blocks,) — the dual-averaging state is a
        # per-block vector throughout (every update is elementwise)
        state = (
            y, lp, glp, sd, jnp.log(10.0 * eps0), jnp.log(eps0),
            jnp.log(eps0), jnp.zeros_like(eps0),
        )
        state, _ = jax.lax.scan(make_warm_step(params), state, ik)
        y, lp, glp, _, _, _, log_eps_bar, _ = state
        return y, lp, glp, jnp.exp(log_eps_bar)

    def build_run():
        def run(params, y, warm1_ik, warm2_ik, run_keys):
            def run_step(state, tk):
                t, k = tk
                y, lp, glp, sd, eps, buf = state
                y, lp, glp, a_mean, dv, nl = nuts_step(
                    params, y, lp, glp, sd, eps, k
                )
                if thin:
                    buf = _thin_write(
                        buf, t, to_params(y), thin, n_keep
                    )
                return (y, lp, glp, sd, eps, buf), (
                    jnp.mean(a_mean), dv, nl
                )

            lp, glp = logp_and_grad(params, y)
            sd = jnp.ones((y.shape[1],), y.dtype)
            eps = jnp.full((n_blk,), init_step, jnp.float32)
            if n_warm1 > 0:  # static — no hidden warmup on continuation
                y, lp, glp, eps = warm_phase(
                    params, y, lp, glp, sd, eps, warm1_ik
                )
            if use_metric:
                sd = _ens_metric_blocks(y, dense, n_blk)
                y, lp, glp, eps = warm_phase(
                    params, y, lp, glp, sd, eps, warm2_ik
                )
                if dense:
                    # refresh from the now-mixed ensemble (see sample_hmc)
                    sd = _ens_metric_blocks(y, dense, n_blk)
            n_keep, buf = _thin_state(run_keys.shape[0], thin, y)
            (y, lp, glp, _, _, buf), (rates, divs, leaps) = jax.lax.scan(
                run_step, (y, lp, glp, sd, eps, buf),
                (jnp.arange(run_keys.shape[0], dtype=jnp.int32),
                 run_keys),
            )
            return y, lp, rates, divs, leaps, buf[:n_keep], eps

        return jax.jit(run)

    run = _chain_program(
        valgrad,
        (
            "nuts", _bounds_key(lo, hi), float(init_step),
            float(target_accept), int(thin), md, use_metric, dense,
            n_warm1 > 0, _fn_cache_key(log_prior), n_blk,
        ),
        build_run,
    )

    def ik(k, n):
        n = max(n, 1)
        return (jnp.arange(n, dtype=jnp.float32), jax.random.split(k, n))

    k_warm1, k_warm2 = jax.random.split(k_warm)
    run_keys = jax.random.split(k_run, n_steps)
    y, lp, rates, divs, leaps, kept, eps = run(
        params, y, ik(k_warm1, n_warm1), ik(k_warm2, n_warmup - n_warm1),
        run_keys,
    )
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0, y.shape[0], y.shape[1]), np.float32)
    )
    return NUTSSampleResult(
        chain=chain,
        final=np.asarray(to_params(y)),
        logp=np.asarray(lp),
        accept_rate=np.asarray(rates),
        step_size=float(np.mean(np.asarray(eps))),
        block_step_sizes=np.asarray(eps),
        divergence_rate=float(np.mean(np.asarray(divs))),
        mean_leapfrog=float(np.mean(np.asarray(leaps))),
    )


def _pt_kernel(loglik, log_prior, lo, hi, n_rungs, n_walkers, a, n_sw):
    """Shared tempered-ensemble kernel behind :func:`sample_pt` and
    :func:`log_evidence` (the ptemcee machinery, measured in
    ``examples/multimodal_pt.py``):

    * ``sweep`` — one tempered red-black affine-invariant stretch move
      on every rung (two half-ensemble likelihood batches, self-scaling
      across a 10⁵-nat anneal where random-walk MH measurably stalls),
      with the β=0 rung refreshed by EXACT independence draws from the
      box (fresh mode assignments enter the ladder every sweep);
    * ``swap_phase`` — ``n_sw`` walker-aligned replica-exchange sweeps
      on alternating edges per likelihood sweep (likelihood-FREE, so
      state transport runs at ~K/a likelihood sweeps instead of the
      single-swap K²/a random walk).

    Returns ``(eval_ll, sweep, swap_phase)``; all take ``params`` /
    state as arguments so callers can cache jitted programs on the
    likelihood closure (:func:`_chain_program`).
    """
    n_params = int(lo.shape[0])
    mid = (lo + hi) / 2.0
    half = n_walkers // 2

    def eval_ll(params, flat):
        inside = ((flat >= lo) & (flat <= hi)).all(axis=1)
        safe = jnp.where(inside[:, None], flat, mid)
        return loglik(params, safe), log_prior(safe), inside

    def half_move(params, xa, lla, lpra, xb, betas, k):
        # tempered red-black stretch move: half-ensemble ``xa`` of
        # every rung proposes against partners from the OTHER half
        # ``xb``; target of rung r is β_r·logL + logπ
        kz, kj, ku, kp = jax.random.split(k, 4)
        u = jax.random.uniform(kz, (n_rungs, half), xa.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        j = jax.random.randint(kj, (n_rungs, half), 0, half)
        xj = jnp.take_along_axis(xb, j[:, :, None], axis=1)
        prop = xj + z[:, :, None] * (xa - xj)
        # β=0 rung: exact INDEPENDENCE refresh from the box — for a
        # uniform-constant proposal the MH ratio reduces to the prior
        # ratio (≡ 1 for a flat prior). Fresh draws mean fresh MODE
        # assignments enter the ladder every sweep instead of random-
        # walking the prior — this is what makes mode-weight transport
        # fast (and hands the evidence estimator an iid prior rung).
        prop = prop.at[0].set(
            lo + (hi - lo) * jax.random.uniform(kp, (half, n_params))
        )
        ll_p, lpr_p, inside = (
            v.reshape(n_rungs, half) if v.ndim == 1 else v
            for v in eval_ll(params, prop.reshape(-1, n_params))
        )
        stretch = (n_params - 1.0) * jnp.log(z)
        # rung 0's move is independence, not a stretch — no z term
        stretch = stretch.at[0].set(0.0)
        logr = stretch + betas[:, None] * (ll_p - lla) + (lpr_p - lpra)
        logr = jnp.where(inside, logr, -jnp.inf)
        acc = jnp.log(jax.random.uniform(ku, (n_rungs, half))) < logr
        xa = jnp.where(acc[:, :, None], prop, xa)
        lla = jnp.where(acc, ll_p, lla)
        lpra = jnp.where(acc, lpr_p, lpra)
        return xa, lla, lpra, jnp.mean(acc, axis=1)

    def sweep(params, x, ll, lpr, betas, k):
        ka, kb = jax.random.split(k)
        xa, lla, lpra, ra = half_move(
            params, x[:, :half], ll[:, :half], lpr[:, :half],
            x[:, half:], betas, ka,
        )
        # second half moves against the UPDATED first half (required
        # for detailed balance — emcee §3)
        xb, llb, lprb, rb = half_move(
            params, x[:, half:], ll[:, half:], lpr[:, half:],
            xa, betas, kb,
        )
        return (
            jnp.concatenate([xa, xb], axis=1),
            jnp.concatenate([lla, llb], axis=1),
            jnp.concatenate([lpra, lprb], axis=1),
            0.5 * (ra + rb),
        )

    def swaps(x, ll, lpr, betas, parity, k):
        u = jax.random.uniform(k, (n_rungs - 1, n_walkers))
        edge = (jnp.arange(n_rungs - 1) % 2) == parity
        dbeta = betas[1:] - betas[:-1]
        logr = dbeta[:, None] * (ll[:-1] - ll[1:])
        acc = edge[:, None] & (jnp.log(u) < logr)
        pad = jnp.zeros((1, n_walkers), bool)
        take_next = jnp.concatenate([acc, pad])
        take_prev = jnp.concatenate([pad, acc])
        x = jnp.where(
            take_next[:, :, None], jnp.roll(x, -1, 0),
            jnp.where(take_prev[:, :, None], jnp.roll(x, 1, 0), x),
        )
        ll, lpr = (
            jnp.where(
                take_next, jnp.roll(v, -1, 0),
                jnp.where(take_prev, jnp.roll(v, 1, 0), v),
            )
            for v in (ll, lpr)
        )
        # raw per-edge acceptance (inactive edges report 0; double
        # when averaging over alternating sweeps)
        return x, ll, lpr, jnp.mean(acc, axis=1)

    def swap_phase(x, ll, lpr, betas, i0, k):
        parities = jnp.mod(i0 + jnp.arange(n_sw, dtype=jnp.float32), 2.0)
        keys = jax.random.split(k, n_sw)

        def one(carry, pk):
            parity, kk = pk
            x, ll, lpr = carry
            x, ll, lpr, r = swaps(x, ll, lpr, betas, parity, kk)
            return (x, ll, lpr), r

        (x, ll, lpr), rs = jax.lax.scan(one, (x, ll, lpr), (parities, keys))
        # n_sw is even → each edge active on exactly half the sweeps →
        # 2× raw mean = per-attempt acceptance
        return x, ll, lpr, 2.0 * rs.mean(axis=0)

    return eval_ll, sweep, swap_phase


def _pt_sizes_check(n_rungs, n_walkers, n_params, a):
    if n_rungs < 2:
        raise ValueError(f"n_rungs must be >= 2; got {n_rungs}")
    if n_walkers % 2:
        raise ValueError(f"n_walkers must be even; got {n_walkers}")
    if n_walkers < 2 * n_params + 2:
        raise ValueError(
            f"n_walkers must be >= 2*n_params+2 = {2 * n_params + 2} "
            f"for the stretch move to span parameter space; got {n_walkers}"
        )
    if a <= 1.0:
        raise ValueError(f"stretch scale a must be > 1; got {a}")


def _pt_swap_sweeps(swap_sweeps, n_rungs):
    # even (both parities each step); default scales with the ladder
    if swap_sweeps is None:
        swap_sweeps = min(max(n_rungs, 2), 64)
    n_sw = int(swap_sweeps) + (int(swap_sweeps) % 2)
    if n_sw < 2:
        raise ValueError(f"swap_sweeps must be >= 1; got {swap_sweeps}")
    return n_sw


def _geometric_ladder(n_rungs, beta_min):
    """β=0 prior rung + geometric ``beta_min → 1``: equal β ratios give
    ~constant per-edge swap acceptance (≈ exp(-(d/2)(r-1)²/r) at ratio
    ``r`` for Gaussian-ish targets), where power-law ladders' bottom
    edges measurably collapse (docstrings of :func:`sample_pt`)."""
    if not 0.0 < beta_min < 1.0:
        raise ValueError(f"beta_min must be in (0, 1); got {beta_min}")
    if n_rungs == 2:
        # geomspace(beta_min, 1, num=1) returns [beta_min], which would
        # silently make the "posterior" rung β=beta_min — degenerate PT
        # with no tempering is [prior, posterior]
        return np.array([0.0, 1.0])
    return np.concatenate([[0.0], np.geomspace(beta_min, 1.0, n_rungs - 1)])


@dataclasses.dataclass
class PTSampleResult(SampleResult):
    """:class:`SampleResult` for the cold (β=1) rung of a parallel-
    tempering run, plus ladder diagnostics: ``swap_rate`` — per-edge
    replica-exchange acceptance (values ≪ 0.1 mean the ladder is too
    coarse to transport modes; add rungs or raise ``n_warmup`` so
    adaptation converges), ``betas`` — the ladder AFTER warmup
    adaptation (``betas[0]=0`` prior rung, ``betas[-1]=1`` posterior)."""

    swap_rate: np.ndarray = None
    betas: np.ndarray = None


def sample_pt(
    loglik,
    params,
    *,
    n_rungs: int = 32,
    n_walkers: int = 256,
    n_steps: int = 400,
    n_warmup: int = 200,
    bounds=None,
    a: float = 2.0,
    beta_min: float = 1e-6,
    adapt_ladder: bool = False,
    swap_sweeps: int = None,
    thin: int = 10,
    seed: int = 0,
    x0=None,
    log_prior=None,
    mesh=None,
) -> PTSampleResult:
    """Parallel-tempering posterior sampler — the tool for MULTIMODAL
    posteriors, where every single-temperature chain sampler here
    (:func:`sample_mh` / :func:`sample_ensemble` / :func:`sample_hmc`)
    goes metastable: walkers stay in whichever basin initialization
    dropped them in, so mode WEIGHTS come out wrong even when all modes
    are found (see :meth:`DirectEmulator.sample_posterior` notes and
    the measured ladder pathology in docs/PERF.md — the machinery here
    is the same, but sampling the β=1 rung is robust where the
    evidence integral was not: swaps only need to TRANSPORT states
    across barriers, not equilibrate every rung's normalization).

    A ``β``-ladder of ``n_rungs`` tempered replicas (β=0 samples the
    prior, β=1 the posterior) runs ``n_walkers`` walker-aligned chains
    per rung; every Metropolis sweep is ONE ``(n_rungs·n_walkers)``-row
    likelihood batch, and replica exchange on alternating edges is
    likelihood-free. Hot rungs cross barriers freely; exchange carries
    those states down to β=1, so the cold chain mixes BETWEEN modes at
    the swap rate instead of the (exponentially small) direct-crossing
    rate. Returns a :class:`PTSampleResult` for the β=1 rung only (the
    hot rungs are scaffolding); ``log_prior``/``mesh``/``x0`` as in
    :func:`log_evidence` (the rung axis shards across ``mesh``).

    The design is ptemcee's (Vousden, Farr & Mandel 2016, MNRAS 455,
    1919), rebuilt as one scanned device program:

    * **within-rung moves are tempered affine-invariant stretch moves**
      (:func:`sample_ensemble`'s red-black scheme with the rung's
      ``β·logL + logπ`` target and stretch scale ``a``) — self-scaling,
      so a 10⁵-nat anneal from prior draws to a sharp 451-bin mode
      needs no step-size adaptation and converges where random-walk MH
      measurably does not (a per-rung adapted-scale MH variant left the
      cold rung ~5,000 nats above the mode after 700 sweeps on the
      `examples/multimodal_pt.py` target; the stretch version
      equilibrates);
    * **the β=0 rung is an exact independence sampler** — fresh
      uniform box draws every sweep (the MH ratio reduces to the prior
      ratio), so fresh MODE assignments enter the ladder at the prior
      rate instead of random-walking;
    * **many swap sweeps per likelihood sweep** (``swap_sweeps``,
      default ≈ ``n_rungs``): exchange is likelihood-free — a sweep
      costs (K−1)·W elementwise ops vs the (K·W)-row likelihood batch —
      so state transport through the ladder runs at ~K/a sweeps
      instead of the single-swap K²/a random walk;
    * **the ladder is geometric from ``beta_min`` to 1** (plus the
      pinned β=0 prior rung) — equal β RATIOS give ~constant per-edge
      swap acceptance for Gaussian-ish targets (acceptance ≈
      ``exp(-(d/2)(r-1)²/r)`` at ratio ``r``), where a power-law
      ladder's bottom edges collapse (measured 2×10⁻⁴ on a sharp
      451-bin emulator likelihood, choking the fresh-mode supply).
      Set ``beta_min ≲ 1/|logL at prior draws|`` so the coldest
      tempered rung still overlaps the prior; the default 1e-6 covers
      |logL| up to ~10⁶ nats;
    * **optional ladder adaptation** (``adapt_ladder=True``): interior
      β gaps move to EQUALIZE per-edge swap rates (the Vousden scheme
      in β-gap space, endpoints pinned), gated past the first third of
      warmup and with a ``t0/(t+t0)``-decaying gain. Off by default —
      MEASURED on a sharp 451-bin emulator likelihood, equalization
      coarsens the prior edge (β₁ 1e-6 → 7e-4, its swap rate → 0,
      recovered mode split 0.65 vs 0.69 with the fixed geometric
      ladder; see ``examples/multimodal_pt.py``); reach for it only
      when ``beta_min`` is badly mis-set and can't be fixed directly.

    Mode-WEIGHT convergence is transport-limited: expect O(10³) kept
    steps for the cold-chain split to equilibrate (each mode
    assignment must traverse the ladder). That is seconds on a TPU —
    sweeps are fixed-shape mega-batches, the whole run one program.

    Programs are cached on the likelihood closure (weights are traced
    arguments), so repeated calls with the same statics re-trace
    nothing (:func:`_chain_program`). ``n_walkers`` must be even and
    ≥ ``2·n_params + 2`` (red-black halves must span parameter space).
    """
    raw_log_prior = log_prior
    log_prior = _resolve_log_prior(log_prior)
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    _pt_sizes_check(n_rungs, n_walkers, n_params, a)
    # initial ladder; adaptation (if on) moves the interior gaps,
    # endpoints β=0 / β=1 stay pinned
    betas0 = _geometric_ladder(n_rungs, beta_min)
    log_gaps0 = jnp.log(jnp.asarray(np.diff(betas0), jnp.float32))
    # ladder-adaptation gain: decays like t0/(t+t0) so the ladder
    # freezes well before the kept phase; t0 scales with the warmup
    # length so short and long warmups both spend ~the first half
    # moving
    t0_ladder = max(float(n_warmup) / 10.0, 10.0)
    t_adapt_start = float(n_warmup) / 3.0
    n_sw = _pt_swap_sweeps(swap_sweeps, n_rungs)
    key = jax.random.key(seed)
    k_init, k_warm, k_run = jax.random.split(key, 3)
    if x0 is not None:
        seed_rows = jnp.clip(jnp.asarray(x0, jnp.float32), lo, hi)
        if seed_rows.shape != (n_walkers, n_params):
            raise ValueError(
                f"x0 must have shape ({n_walkers}, {n_params}); "
                f"got {seed_rows.shape}"
            )
        x = jnp.broadcast_to(seed_rows[None], (n_rungs, n_walkers, n_params))
    else:
        x = _init_walkers(
            k_init, n_rungs * n_walkers, lo, hi
        ).reshape(n_rungs, n_walkers, n_params)
    x = _shard_walkers(x, mesh)

    def build_run():
        def ladder(log_gaps):
            g = jnp.exp(log_gaps)
            c = jnp.cumsum(g)
            # normalize by the cumsum's own tail so β[-1] is EXACTLY
            # 1.0 (sum() may reduce in a different order → 1±1ulp)
            return jnp.concatenate([jnp.zeros((1,), g.dtype), c / c[-1]])

        eval_ll, sweep, swap_phase = _pt_kernel(
            loglik, log_prior, lo, hi, n_rungs, n_walkers, a, n_sw
        )

        def run(params, x, warm_ik, run_ik):
            def warm_step(state, ik):
                i, k = ik
                km, ks = jax.random.split(k)
                x, ll, lpr, log_gaps, a_ema = state
                betas = ladder(log_gaps)
                x, ll, lpr, _ = sweep(params, x, ll, lpr, betas, km)
                x, ll, lpr, s = swap_phase(x, ll, lpr, betas, i, ks)
                if adapt_ladder and n_rungs > 2:
                    # Vousden-style: equalize per-edge swap rates.
                    # EMA the per-attempt acceptance, widen gaps
                    # whose edges swap more than the ladder average.
                    # GATED past the first third of warmup: while the
                    # rungs are still annealing from prior draws their
                    # logL levels are all similar, so every cold edge
                    # reports spuriously high acceptance — adapting on
                    # that transient coarsens the ladder bottom by
                    # orders of magnitude (measured: β₁ 1e-6 → 1e-3,
                    # choking the prior-rung supply to 1e-4)
                    t = i + 1.0
                    a_ema = 0.8 * a_ema + 0.2 * s
                    tt = jnp.maximum(t - t_adapt_start, 0.0)
                    gate = (t > t_adapt_start).astype(jnp.float32)
                    gain = gate * 0.3 * t0_ladder / (tt + t0_ladder)
                    log_gaps = log_gaps + gain * (a_ema - a_ema.mean())
                    log_gaps = log_gaps - jnp.mean(log_gaps)  # bounded
                return (x, ll, lpr, log_gaps, a_ema), None

            def run_step(state, ik):
                i, k = ik
                km, ks = jax.random.split(k)
                x, ll, lpr, buf = state
                x, ll, lpr, acc = sweep(params, x, ll, lpr, betas, km)
                x, ll, lpr, s = swap_phase(x, ll, lpr, betas, i, ks)
                if thin:  # β=1 rung only
                    buf = _thin_write(
                        buf, i.astype(jnp.int32), x[-1], thin, n_keep
                    )
                return (x, ll, lpr, buf), (jnp.mean(acc), s)

            ll, lpr, _ = eval_ll(params, x.reshape(-1, n_params))
            ll = ll.reshape(n_rungs, n_walkers)
            lpr = lpr.reshape(n_rungs, n_walkers)
            log_gaps = log_gaps0
            if n_warmup > 0:
                state = (
                    x, ll, lpr, log_gaps,
                    jnp.full((n_rungs - 1,), 0.25, jnp.float32),
                )
                state, _ = jax.lax.scan(warm_step, state, warm_ik)
                x, ll, lpr, log_gaps, _ = state
            betas = ladder(log_gaps)
            n_keep, buf = _thin_state(
                run_ik[0].shape[0], thin, x[-1]
            )
            (x, ll, lpr, buf), (rates, srates) = jax.lax.scan(
                run_step, (x, ll, lpr, buf), run_ik
            )
            return x, ll, lpr, betas, rates, srates, buf[:n_keep]

        return jax.jit(run)

    run = _chain_program(
        loglik,
        (
            "pt", _bounds_key(lo, hi), n_rungs, n_walkers, float(a),
            float(beta_min),
            bool(adapt_ladder), n_sw, int(thin), int(n_warmup),
            _fn_cache_key(raw_log_prior),
        ),
        build_run,
    )

    def ik(k, n):
        n = max(n, 1)
        return (jnp.arange(n, dtype=jnp.float32), jax.random.split(k, n))

    x, ll, lpr, betas, rates, srates, kept = run(
        params, x, ik(k_warm, n_warmup), ik(k_run, n_steps)
    )
    chain = (
        np.asarray(kept)
        if thin
        else np.empty((0, n_walkers, n_params), np.float32)
    )
    return PTSampleResult(
        chain=chain,
        final=np.asarray(x[-1]),
        logp=np.asarray(ll[-1] + lpr[-1]),
        accept_rate=np.asarray(rates),
        step_size=float(a),  # the stretch scale (cf. sample_ensemble)
        swap_rate=np.asarray(srates).mean(axis=0),
        betas=np.asarray(betas),
    )


@dataclasses.dataclass
class SMCResult:
    """Output of :func:`sample_smc` — an equally-weighted posterior
    particle population plus the evidence the anneal integrates on the
    way there.

    ``final``: ``(n_particles, n_params)`` posterior draws at β=1
    (post-resample population — equally weighted, but RESAMPLING
    duplicates ancestors, so these are not ``n_particles`` independent
    samples; treat like one well-mixed MCMC batch). ``flat`` aliases it
    for API uniformity with :class:`SampleResult`. ``logp``: per-
    particle ``logL + log_prior``. ``logz``: the SMC evidence — the sum
    over anneal stages of the log-mean incremental weight, same
    normalized-prior convention as :func:`log_evidence` /
    :func:`tpu21cmvae.nested.nested_sampling`. ``logz_err``: half the
    |difference| of the two INDEPENDENT sub-populations' estimates
    (they share the β schedule but never exchange particles — genuine
    replication, unlike a post-hoc split of one genealogy).
    ``n_stages``: anneal stages actually used (``== max_stages`` means
    the schedule was truncated — raise ``max_stages`` or inspect
    ``betas``). ``betas``: the adaptive schedule,
    ``stage_ess``: the normalized incremental-weight ESS fraction each
    stage targeted, ``accept_rate``: per-stage mutation acceptance
    (values ≲ 0.1 mean ``n_mh`` sweeps are too few to decorrelate the
    resampled duplicates).
    """

    final: np.ndarray
    logp: np.ndarray
    logz: float
    logz_err: float
    n_stages: int
    betas: np.ndarray
    stage_ess: np.ndarray
    accept_rate: np.ndarray

    @property
    def flat(self) -> np.ndarray:
        return self.final

    def summary(self, labels=None) -> str:
        mean, std = self.final.mean(0), self.final.std(0)
        labels = labels or [f"p{i}" for i in range(self.final.shape[-1])]
        lines = [
            f"  {l:>8}: {m:12.5g} ± {s:10.4g}"
            for l, m, s in zip(labels, mean, std)
        ]
        return (
            f"log Z = {self.logz:.4f} ± {self.logz_err:.4f} "
            f"({self.n_stages} stages, mutation accept "
            f"{float(np.mean(self.accept_rate)):.2f})\n"
            + "\n".join(lines)
        )


def sample_smc(
    loglik,
    params,
    *,
    n_particles: int = 4096,
    n_mh: int = 8,
    bounds=None,
    a: float = 2.0,
    target_ess_frac: float = 0.5,
    max_stages: int = 64,
    seed: int = 0,
    log_prior=None,
    mesh=None,
) -> SMCResult:
    """Adaptive tempered Sequential Monte Carlo (Del Moral, Doucet &
    Jasra 2006): anneal a particle population from the prior to the
    posterior along a SELF-CHOSEN β schedule, harvesting the evidence
    on the way — the algorithm modern cosmology samplers (pocoMC;
    dynesty's rivals) build on, and a natural TPU program: every stage
    is three fixed-shape population-wide batches (weight, resample,
    mutate), no sequential chain anywhere.

    Each stage: (1) choose the largest ``δβ`` whose incremental
    weights ``w ∝ L^δβ`` keep the population's normalized ESS at
    ``target_ess_frac`` (32-step bisection — monotone in δβ), capped
    at β=1; (2) credit ``log mean w`` to ``log Z`` (stepping-stone
    identity, same normalized-prior convention as
    :func:`log_evidence`); (3) systematic-resample; (4) decorrelate
    the duplicates with ``n_mh`` red-black affine-invariant stretch
    sweeps targeting ``β·logL + logπ`` (the self-scaling move that
    anneals 10⁵-nat likelihoods from prior draws where random-walk MH
    stalls — :func:`_pt_kernel`). With an external ``log_prior`` the
    box population is first importance-converted to the prior (one
    uncredited reweight+resample+mutate at β=0), matching
    :func:`sample_pt`'s prior-rung semantics.

    The whole anneal is ONE ``lax.while_loop`` device program with a
    data-dependent stage count (bounded by ``max_stages``); programs
    cache on the likelihood closure (:func:`_chain_program`). The
    population runs as TWO independent sub-populations (shared
    schedule, disjoint resampling and mutation) so ``logz_err`` is a
    genuine replication error, not a within-genealogy optimism.
    Compared to the PT stepping-stone ladder (:func:`log_evidence`)
    the schedule is adaptive instead of guessed (no ``beta_min`` /
    ``n_rungs`` tuning, no ladder-drift alarm needed) and every
    likelihood row works at the CURRENT β instead of equilibrating a
    full ladder each sweep; compared to nested sampling it is one
    fixed-shape program with no sorted live-set bookkeeping.
    Multimodal targets: resampling preserves mode weights as long as
    the anneal is gentle (ESS targeting makes it so) — measured on the
    80/20 two-Gaussian target every single-temperature sampler fails
    (``tests/test_smc.py``).

    ``n_particles`` must be divisible by 4 (two sub-populations × two
    stretch-move half-ensembles) with each quarter ≥ ``n_params + 1``;
    ``mesh`` shards the per-sub-population particle axis. The reference
    has no sampler at all (its emulator feeds external CPU samplers,
    ``README.rst:9-11``).
    """
    raw_log_prior = log_prior
    log_prior = _resolve_log_prior(log_prior)
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    if n_particles % 4:
        raise ValueError(
            f"n_particles must be divisible by 4; got {n_particles}"
        )
    m = n_particles // 2  # per sub-population
    if m // 2 < n_params + 1:
        raise ValueError(
            f"n_particles must be >= 4*(n_params+1) = "
            f"{4 * (n_params + 1)} for the stretch move to span "
            f"parameter space; got {n_particles}"
        )
    if a <= 1.0:
        raise ValueError(f"stretch scale a must be > 1; got {a}")
    if not 0.0 < target_ess_frac < 1.0:
        raise ValueError(
            f"target_ess_frac must be in (0, 1); got {target_ess_frac}"
        )
    if max_stages < 2:
        raise ValueError(f"max_stages must be >= 2; got {max_stages}")
    mid = (lo + hi) / 2.0
    half = m // 2
    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)
    x = _init_walkers(k_init, 2 * m, lo, hi).reshape(2, m, n_params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(mesh.devices.size)
        if m % n_dev:
            raise ValueError(
                f"n_particles/2 = {m} must divide evenly across the "
                f"{n_dev}-device mesh"
            )
        x = jax.device_put(x, NamedSharding(
            mesh, PartitionSpec(None, mesh.axis_names, None)
        ))
    has_prior = raw_log_prior is not None
    ms = int(max_stages)
    tef = float(target_ess_frac)

    def build_run():
        def eval_ll(params, flat):
            inside = ((flat >= lo) & (flat <= hi)).all(axis=1)
            safe = jnp.where(inside[:, None], flat, mid)
            ll = loglik(params, safe)
            ll = jnp.where(jnp.isfinite(ll) & inside, ll, -jnp.inf)
            return ll, log_prior(safe), inside

        def half_move(params, xa, lla, lpra, xb, beta, k):
            # red-black stretch move within each sub-population
            # (axis 0 = the two independent replicas)
            kz, kj, ku = jax.random.split(k, 3)
            u = jax.random.uniform(kz, (2, half), xa.dtype)
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            j = jax.random.randint(kj, (2, half), 0, half)
            xj = jnp.take_along_axis(xb, j[:, :, None], axis=1)
            prop = xj + z[:, :, None] * (xa - xj)
            ll_p, lpr_p, inside = (
                v.reshape(2, half) for v in
                eval_ll(params, prop.reshape(-1, n_params))
            )
            logr = (
                (n_params - 1.0) * jnp.log(z)
                + beta * (ll_p - lla) + (lpr_p - lpra)
            )
            logr = jnp.where(inside, logr, -jnp.inf)
            acc = jnp.log(jax.random.uniform(ku, (2, half))) < logr
            xa = jnp.where(acc[:, :, None], prop, xa)
            lla = jnp.where(acc, ll_p, lla)
            lpra = jnp.where(acc, lpr_p, lpra)
            return xa, lla, lpra, jnp.mean(acc)

        def indep_move(params, x, ll, lpr, prop_stats, beta, k):
            # independence MH from the population-moment-matched
            # Gaussian (pymc-SMC's IMH kernel): a GLOBAL move — one
            # accepted draw fully decorrelates a resampled duplicate,
            # which the local stretch move only manages geometrically
            # (with the adaptive refresh criterion below, measured
            # anneal-lag evidence bias on a sharp trained-emulator
            # posterior: −4.9 → −0.6 nats at the default budget,
            # within the replication error at larger ones). The
            # proposal is FROZEN per stage (moments of the
            # post-resample population), so this is plain MH wrt π_β.
            mean, sd_p, cr, icr = prop_stats
            kz, ku = jax.random.split(k)
            eps = jax.random.normal(kz, x.shape, x.dtype)
            prop = mean[:, None] + jnp.einsum(
                "rij,rkj->rik", eps, cr
            ) * sd_p[:, None]
            ll_p, lpr_p, inside = (
                v.reshape(2, m) for v in
                eval_ll(params, prop.reshape(-1, n_params))
            )

            def logq(v):
                w = jnp.einsum(
                    "rik,rjk->rij",
                    (v - mean[:, None]) / sd_p[:, None], icr,
                )
                return -0.5 * jnp.sum(w * w, axis=-1)

            logr = (
                beta * (ll_p - ll) + (lpr_p - lpr)
                + logq(x) - logq(prop)
            )
            logr = jnp.where(inside, logr, -jnp.inf)
            acc = jnp.log(jax.random.uniform(ku, (2, m))) < logr
            x = jnp.where(acc[:, :, None], prop, x)
            ll = jnp.where(acc, ll_p, ll)
            lpr = jnp.where(acc, lpr_p, lpr)
            return x, ll, lpr, acc

        def prop_from(x):
            # per-replica moment-matched proposal in STANDARDIZED
            # coordinates (raw covariance spans ~13 decades on sharp
            # emulator posteriors — an f32 cholesky needs the
            # correlation form), lightly ridged for rank safety
            mean = jnp.mean(x, axis=1)
            sd_p = jnp.std(x, axis=1) + 1e-12
            z = (x - mean[:, None]) / sd_p[:, None]
            corr = jnp.einsum("rij,rik->rjk", z, z) / m
            corr = corr + 1e-4 * jnp.eye(n_params, dtype=x.dtype)
            cr = jnp.linalg.cholesky(corr)
            eye = jnp.broadcast_to(
                jnp.eye(n_params, dtype=x.dtype), cr.shape
            )
            icr = jax.scipy.linalg.solve_triangular(cr, eye, lower=True)
            return mean, sd_p, cr, icr

        def mutate(params, x, ll, lpr, beta, k):
            # ADAPTIVE sweep count: at least n_mh sweeps, then keep
            # going until ≥95 % of particles have accepted at least one
            # independence refresh (a refreshed particle is a fresh
            # draw — the duplicate correlation resampling created is
            # GONE, which is exactly what bounds the anneal-lag
            # evidence bias), capped at 4·n_mh. Self-tunes the
            # mutation budget to each stage's difficulty.
            prop_stats = prop_from(x)
            cap = 4 * n_mh

            def cond(c):
                i, _, _, _, _, fresh = c
                return (i < cap) & (
                    (i < n_mh) | (jnp.mean(fresh) < 0.95)
                )

            def body(c):
                i, x, ll, lpr, r, fresh = c
                ka, kb, ki = jax.random.split(
                    jax.random.fold_in(k, i), 3
                )
                xa, lla, lpra, ra = half_move(
                    params, x[:, :half], ll[:, :half], lpr[:, :half],
                    x[:, half:], beta, ka,
                )
                xb, llb, lprb, rb = half_move(
                    params, x[:, half:], ll[:, half:], lpr[:, half:],
                    xa, beta, kb,
                )
                x = jnp.concatenate([xa, xb], axis=1)
                ll = jnp.concatenate([lla, llb], axis=1)
                lpr = jnp.concatenate([lpra, lprb], axis=1)
                x, ll, lpr, acc = indep_move(
                    params, x, ll, lpr, prop_stats, beta, ki
                )
                return (
                    i + 1, x, ll, lpr, r + 0.5 * (ra + rb),
                    fresh | acc,
                )

            i, x, ll, lpr, r, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), x, ll, lpr, jnp.float32(0.0),
                 jnp.zeros((2, m), bool)),
            )
            return x, ll, lpr, r / jnp.maximum(i, 1).astype(jnp.float32)

        def resample(x, ll, lpr, logw, k):
            # systematic resampling WITHIN each sub-population: the two
            # replicas never exchange particles, so their logz
            # estimates stay independent
            lse = jax.scipy.special.logsumexp(logw, axis=1,
                                              keepdims=True)
            cdf = jnp.cumsum(jnp.exp(logw - lse), axis=1)
            u = jax.random.uniform(k, (2, 1))
            pos = (jnp.arange(m, dtype=jnp.float32)[None] + u) / m
            idx = jnp.stack([
                jnp.searchsorted(cdf[0], pos[0]),
                jnp.searchsorted(cdf[1], pos[1]),
            ]).clip(0, m - 1)
            gather = lambda v: jnp.take_along_axis(  # noqa: E731
                v, idx[:, :, None] if v.ndim == 3 else idx, axis=1
            )
            return gather(x), gather(ll), gather(lpr)

        def ess_frac(g, d):
            # normalized ESS of incremental weights exp(d·g), pooled
            # over both replicas (the schedule is shared)
            lw = (d * g).reshape(-1)
            lse = jax.scipy.special.logsumexp(lw)
            lse2 = jax.scipy.special.logsumexp(2.0 * lw)
            return jnp.exp(2.0 * lse - lse2) / (2 * m)

        def pick_delta(g, beta):
            cap = 1.0 - beta
            full = ess_frac(g, cap) >= tef

            def bis(i, lohi):
                lo_d, hi_d = lohi
                mid_d = 0.5 * (lo_d + hi_d)
                ok = ess_frac(g, mid_d) >= tef
                return (
                    jnp.where(ok, mid_d, lo_d),
                    jnp.where(ok, hi_d, mid_d),
                )

            lo_d, _ = jax.lax.fori_loop(
                0, 32, bis, (jnp.float32(0.0), cap)
            )
            return jnp.where(full, cap, lo_d), full

        def run(params, x, key_root):
            ll, lpr, _ = (
                v.reshape(2, m) if v.ndim == 1 else v
                for v in eval_ll(params, x.reshape(-1, n_params))
            )
            if has_prior:
                # uncredited importance conversion box → prior
                kr, km_ = jax.random.split(
                    jax.random.fold_in(key_root, ms + 1)
                )
                x, ll, lpr = resample(x, ll, lpr, lpr, kr)
                x, ll, lpr, _ = mutate(
                    params, x, ll, lpr, jnp.float32(0.0), km_
                )

            def cond(c):
                return (c[3] < 1.0) & (c[4] < ms)

            def body(c):
                x, ll, lpr, beta, stage, lza, lzb, betas, esss, accs = c
                d, _ = pick_delta(ll, beta)
                lw = d * ll
                lz_inc = (
                    jax.scipy.special.logsumexp(lw, axis=1)
                    - jnp.log(float(m))
                )
                kr, km_ = jax.random.split(
                    jax.random.fold_in(key_root, stage)
                )
                ef = ess_frac(ll, d)
                x, ll, lpr = resample(x, ll, lpr, lw, kr)
                beta = jnp.minimum(beta + d, 1.0)
                x, ll, lpr, acc = mutate(params, x, ll, lpr, beta, km_)
                return (
                    x, ll, lpr, beta, stage + 1,
                    lza + lz_inc[0], lzb + lz_inc[1],
                    betas.at[stage + 1].set(beta),
                    esss.at[stage].set(ef),
                    accs.at[stage].set(acc),
                )

            # pad value 0 (not NaN — the debug-NaN hook flags produced
            # NaNs); the caller slices the pad off before returning
            z = jnp.float32(0.0)
            init = (
                x, ll, lpr, z, jnp.int32(0), z, z,
                jnp.zeros((ms + 1,), jnp.float32),
                jnp.zeros((ms,), jnp.float32),
                jnp.zeros((ms,), jnp.float32),
            )
            (x, ll, lpr, beta, stage, lza, lzb, betas, esss, accs) = (
                jax.lax.while_loop(cond, body, init)
            )
            return x, ll, lpr, beta, stage, lza, lzb, betas, esss, accs

        return jax.jit(run)

    run = _chain_program(
        loglik,
        (
            "smc", _bounds_key(lo, hi), int(n_particles), int(n_mh),
            float(a), tef, ms, _fn_cache_key(raw_log_prior),
        ),
        build_run,
    )
    x, ll, lpr, beta, stage, lza, lzb, betas, esss, accs = run(
        params, x, k_run
    )
    if float(beta) < 1.0:
        raise RuntimeError(
            f"SMC anneal truncated at beta={float(beta):.4g} after "
            f"{int(stage)} stages; raise max_stages (= {ms}) or "
            f"target a lower target_ess_frac"
        )
    lza, lzb = float(lza), float(lzb)
    n_stages = int(stage)
    return SMCResult(
        final=np.asarray(x.reshape(-1, n_params)),
        logp=np.asarray((ll + lpr).reshape(-1)),
        logz=0.5 * (lza + lzb),
        logz_err=0.5 * abs(lza - lzb),
        n_stages=n_stages,
        betas=np.asarray(betas)[: n_stages + 1],
        stage_ess=np.asarray(esss)[:n_stages],
        accept_rate=np.asarray(accs)[:n_stages],
    )


def sample_to_ess(
    loglik,
    params,
    *,
    target_ess: float = 10_000.0,
    chunk_steps: int = 200,
    n_steps: int = None,
    max_chunks: int = 25,
    n_walkers: int = 1024,
    n_warmup: int = 200,
    thin: int = 10,
    bounds=None,
    seed: int = 0,
    **kwargs,
) -> SampleResult:
    """Run :func:`sample_mh` in fixed-size chunks until the MINIMUM
    per-parameter effective sample size of the accumulated chain
    reaches ``target_ess`` — "give me N effective samples" instead of
    guessing a step count. Chunking is affordable because of the
    per-closure chain-program cache (:func:`_chain_program`): chunk 1
    compiles the warmup+run program, chunk 2 compiles the continuation
    program (no warmup, adapted scale carried forward via
    ``step_frac``), and every later chunk re-traces NOTHING — each is
    one device call. Stops at ``max_chunks`` regardless (check
    ``result.ess()`` if you must know). ``n_steps`` is an accepted
    alias for ``chunk_steps`` so the :meth:`sample_posterior` dispatch
    (``sampler="mh", target_ess=N``) composes with the usual step
    argument. ``kwargs`` forward to :func:`sample_mh` (``log_prior=``,
    ``mesh=``, …).
    """
    if n_steps is not None:
        chunk_steps = n_steps
    if thin <= 0:
        raise ValueError("sample_to_ess needs a stored chain; thin > 0")
    if chunk_steps // thin < 4:
        raise ValueError(
            f"chunk_steps must keep >= 4 thinned steps; got "
            f"{chunk_steps} with thin={thin}"
        )
    lo, hi = _resolve_bounds(bounds)
    span_mean = float(np.asarray(hi - lo).mean())
    # step_frac/x0 apply to the FIRST chunk only — continuations pass
    # their own (adapted scale, final state), so forwarding the user's
    # through **kwargs would collide
    first_step_frac = kwargs.pop("step_frac", 0.05)
    first_x0 = kwargs.pop("x0", None)
    res = sample_mh(
        loglik, params, n_walkers=n_walkers, n_steps=chunk_steps,
        n_warmup=n_warmup, thin=thin, bounds=bounds, seed=seed,
        step_frac=first_step_frac, x0=first_x0, **kwargs,
    )
    chains, rates = [res.chain], [res.accept_rate]
    step_size = res.step_size
    # the adapted scale, re-expressed as the step_frac a continuation
    # run reproduces exactly (mult=1 when n_warmup=0), so chunks 3+
    # hit the same cached program as chunk 2
    step_frac_cont = step_size / span_mean
    for i in range(1, max_chunks):
        full = np.concatenate(chains)
        probe = SampleResult(
            chain=full, final=res.final, logp=res.logp,
            accept_rate=np.concatenate(rates), step_size=step_size,
        )
        if full.shape[0] >= 4 and probe.ess().min() >= target_ess:
            break
        res = sample_mh(
            loglik, params, n_walkers=n_walkers, n_steps=chunk_steps,
            n_warmup=0, thin=thin, bounds=bounds, seed=seed + 7919 * i,
            x0=res.final, step_frac=step_frac_cont, **kwargs,
        )
        chains.append(res.chain)
        rates.append(res.accept_rate)
    return SampleResult(
        chain=np.concatenate(chains),
        final=res.final,
        logp=res.logp,
        accept_rate=np.concatenate(rates),
        step_size=step_size,
    )


@dataclasses.dataclass
class WeightedPosterior:
    """Importance-weighted posterior samples from :func:`reweight`.

    ``samples``: (N, n_params) raw-parameter rows; ``logw``:
    per-sample log importance weights (normalized to max 0). Summary
    methods mirror the unweighted :class:`SampleResult` views;
    ``ess()`` is the Kish effective sample size ``(Σw)²/Σw²`` — the
    honest "how many samples survived the prior swap" number. If it is
    a small fraction of N, the new prior barely overlaps the sampled
    posterior: re-run the sampler with ``log_prior=`` instead.
    """

    samples: np.ndarray
    logw: np.ndarray

    def _w(self) -> np.ndarray:
        w = np.exp(self.logw - self.logw.max())
        return w / w.sum()

    def ess(self) -> float:
        w = self._w()
        return float(1.0 / np.sum(w**2))

    def mean(self) -> np.ndarray:
        return self._w() @ self.samples

    def std(self) -> np.ndarray:
        w = self._w()
        mu = w @ self.samples
        return np.sqrt(w @ (self.samples - mu) ** 2)

    def quantile(self, q) -> np.ndarray:
        """Weighted per-parameter quantiles (q scalar or array)."""
        w = self._w()
        qs = np.atleast_1d(np.asarray(q, np.float64))
        out = np.empty((qs.shape[0], self.samples.shape[1]))
        for j in range(self.samples.shape[1]):
            order = np.argsort(self.samples[:, j])
            cdf = np.cumsum(w[order])
            out[:, j] = np.interp(qs, cdf, self.samples[order, j])
        return out[0] if np.ndim(q) == 0 else out

    def resample(self, n: int, seed: int = 0) -> np.ndarray:
        """``n`` equal-weight draws (multinomial resampling)."""
        rng = np.random.default_rng(seed)
        idx = rng.choice(self.samples.shape[0], size=n, p=self._w())
        return self.samples[idx]


def reweight(
    result,
    new_log_prior,
    old_log_prior=None,
    *,
    max_samples: int = 200_000,
) -> WeightedPosterior:
    """Swap the prior of an ALREADY-SAMPLED posterior by importance
    reweighting — the standard "what if we adopt the Planck tau
    constraint?" workflow without rerunning the sampler: a chain drawn
    from ``L·π_old`` reweighted by ``w ∝ π_new/π_old`` targets
    ``L·π_new`` exactly (within the Kish-ESS budget).

    ``result``: a :class:`SampleResult` (or anything with ``.flat``),
    or a bare ``(N, n_params)`` array. ``new_log_prior`` /
    ``old_log_prior``: log-densities over raw parameters (e.g.
    :meth:`tpu21cmvae.priors.GaussianBoxPrior.log_prior`); ``None``
    means flat. Arrays larger than ``max_samples`` rows are evenly
    thinned first (weight evaluation is one batched device call).
    ALWAYS check :meth:`WeightedPosterior.ess` — a collapsed ESS means
    the new prior moved the posterior beyond the sampled cloud and the
    honest path is re-sampling with ``log_prior=new_log_prior``.
    """
    if isinstance(result, np.ndarray) or not hasattr(result, "chain"):
        # bare array (ndarray.flat is numpy's 1-D ITERATOR, not ours)
        flat = np.asarray(result, np.float32)
    else:
        flat = np.asarray(result.flat, np.float32)
    if flat.ndim != 2:
        raise ValueError(f"need (N, n_params) samples; got {flat.shape}")
    if flat.shape[0] > max_samples:
        flat = flat[:: int(np.ceil(flat.shape[0] / max_samples))]
    x = jnp.asarray(flat)
    logw = jnp.zeros((flat.shape[0],), jnp.float32)
    if new_log_prior is not None:
        logw = logw + new_log_prior(x)
    if old_log_prior is not None:
        logw = logw - old_log_prior(x)
    logw = np.asarray(logw, np.float64)
    if not np.isfinite(logw).any():
        raise ValueError(
            "all importance weights are zero/non-finite: the new prior "
            "has no support on the sampled posterior"
        )
    logw = np.where(np.isfinite(logw), logw, -np.inf)
    return WeightedPosterior(samples=flat, logw=logw - logw.max())


@dataclasses.dataclass
class ProfileResult:
    """Profile-likelihood curve from :func:`profile_likelihood`.

    ``grid``: the scanned values of the profiled parameter; ``logl``:
    the profile log-likelihood ``max_{others} logL(grid_i, others)``
    per grid point; ``params``: the maximizing full parameter vector at
    each grid point, ``(G, n_params)``. ``interval(level)`` returns the
    Wilks confidence interval — the grid range where
    ``logl ≥ max(logl) − χ²₁(level)/2`` — with the crossings located by
    linear interpolation; an endpoint equal to ``grid[0]``/``grid[-1]``
    means the interval is CENSORED by the scanned range (widen the
    grid)."""

    index: int
    grid: np.ndarray
    logl: np.ndarray
    params: np.ndarray

    def interval(self, level: float = 0.68) -> Tuple[float, float]:
        from scipy.stats import chi2

        if not 0.0 < level < 1.0:
            raise ValueError(f"level must be in (0, 1); got {level}")
        thresh = self.logl.max() - 0.5 * chi2.ppf(level, df=1)
        above = self.logl >= thresh
        if not above.any():  # pragma: no cover - thresh <= max always
            raise RuntimeError("no grid point above the Wilks threshold")
        i0, i1 = np.flatnonzero(above)[[0, -1]]
        lo = self.grid[0] if i0 == 0 else float(np.interp(
            thresh, self.logl[i0 - 1:i0 + 1], self.grid[i0 - 1:i0 + 1]
        ))
        hi = self.grid[-1] if i1 == len(self.grid) - 1 else float(
            np.interp(
                -thresh,
                -self.logl[i1:i1 + 2],
                self.grid[i1:i1 + 2],
            )
        )
        return float(lo), float(hi)


def profile_likelihood(
    valgrad,
    params,
    index: int,
    grid,
    *,
    n_starts: int = 256,
    n_steps: int = 300,
    bounds=None,
    learning_rate: float = 0.05,
    seed: int = 0,
    log_prior=None,
    mesh=None,
) -> ProfileResult:
    """Profile likelihood of ONE parameter — the frequentist
    confidence-interval workflow (Wilks' theorem) the reference
    community runs as a grid of scipy refits around 40 ms ``predict``
    calls: for every value ``g`` in ``grid``, maximize
    ``logL(θ | θ_index = g)`` over the remaining parameters.

    TPU shape: the ENTIRE scan — ``len(grid) · n_starts`` constrained
    multi-start Adam ascents — is ONE batched device program riding the
    same fused value+gradient path as :func:`fit_map` (the profiled
    coordinate is pinned by masking its whitened-space gradient).
    A 64-point grid with 256 restarts each costs what a single fit
    costs per step. ``log_prior`` profiles ``logL + logπ`` instead
    (profile posterior). Returns a :class:`ProfileResult`;
    ``result.interval(0.68)`` / ``.interval(0.95)`` give the Wilks
    intervals.
    """
    lo, hi = _resolve_bounds(bounds)
    n_params = int(lo.shape[0])
    if not 0 <= index < n_params:
        raise ValueError(f"index must be in [0, {n_params}); got {index}")
    grid = np.asarray(grid, np.float32)
    if grid.ndim != 1 or grid.shape[0] < 2:
        raise ValueError("grid must be 1-D with >= 2 points")
    if (grid < np.asarray(lo)[index]).any() or (
        grid > np.asarray(hi)[index]
    ).any():
        raise ValueError("grid values must lie inside the prior box")
    g_count = grid.shape[0]
    key = jax.random.key(seed)
    x = _init_walkers(key, g_count * n_starts, lo, hi)
    x = x.reshape(g_count, n_starts, n_params)
    x = x.at[:, :, index].set(grid[:, None])
    x = _shard_walkers(x.reshape(-1, n_params), mesh)
    free = jnp.ones((n_params,), jnp.float32).at[index].set(0.0)
    xr, ll = _whitened_adam_ascent(
        valgrad, params, lo, hi, x,
        n_steps=n_steps, learning_rate=learning_rate,
        log_prior=log_prior, free=free,
    )
    xr = np.asarray(xr).reshape(g_count, n_starts, n_params)
    ll = np.asarray(ll).reshape(g_count, n_starts)
    # a dead start's FINAL value can still be non-finite (only the
    # gradient is sanitized mid-ascent): never let one NaN start poison
    # a grid point's profile value
    ll = np.where(np.isfinite(ll), ll, -np.inf)
    best = ll.argmax(axis=1)
    rows = np.arange(g_count)
    out_params = xr[rows, best]
    # the ascent's sigmoid parameterization cannot land EXACTLY on the
    # pinned value (≤1e-7·span off); restore it exactly
    out_params[:, index] = grid
    return ProfileResult(
        index=index, grid=grid, logl=ll[rows, best], params=out_params
    )


@dataclasses.dataclass
class EvidenceComparison:
    """Cross-model Bayesian comparison from :func:`compare_evidence`.

    ``names`` order matches ``logz``/``logz_err``; ``log_bayes``:
    ``logz − max(logz)`` (0 for the winner; interpret on the Jeffreys
    scale — |ΔlogZ| > 2.3 is "decisive" ~10:1 odds in natural logs ×
    ln10). ``results``: the underlying per-model result objects
    (``NestedResult`` by default) for posterior samples etc."""

    names: list
    logz: np.ndarray
    logz_err: np.ndarray
    log_bayes: np.ndarray
    results: dict

    def summary(self) -> str:
        order = np.argsort(-self.logz)
        lines = ["model comparison (log Z, natural logs):"]
        for i in order:
            tag = "  <- preferred" if self.log_bayes[i] == 0.0 else ""
            lines.append(
                f"  {self.names[i]:>12}: logZ = {self.logz[i]:10.3f} "
                f"± {self.logz_err[i]:.3f}   ΔlogZ = "
                f"{self.log_bayes[i]:+.3f}{tag}"
            )
        i0, i1 = order[0], order[1] if len(order) > 1 else order[0]
        gap = self.logz[i0] - self.logz[i1]
        err = float(np.hypot(self.logz_err[i0], self.logz_err[i1]))
        if len(order) > 1 and gap < 3.0 * err:
            lines.append(
                f"  (top-two gap {gap:.3f} is within 3× the combined "
                f"MC error {err:.3f} — NOT a significant preference)"
            )
        return "\n".join(lines)


def compare_evidence(models: dict, obs, noise_var=1.0, **kwargs
                     ) -> EvidenceComparison:
    """Bayesian model comparison across families on ONE observation —
    the reference community's MultiNest workflow ("which astrophysics
    model does this spectrum prefer?") as a few seconds of device time
    per model.

    ``models``: ``{name: model}`` where each model exposes
    ``log_evidence(obs, noise_var, **kwargs)`` (all four families do;
    mixing families is the point — e.g. direct vs AE-based vs VAE on
    the same observed spectrum, or one family under different priors
    via per-call kwargs is NOT supported here: share ``kwargs`` across
    models so the comparison is apples-to-apples, same bounds, same
    budget). Returns an :class:`EvidenceComparison`; check its
    ``summary()`` — it flags a top-two gap within 3× the combined MC
    error as not significant.
    """
    if len(models) < 2:
        raise ValueError("compare_evidence needs >= 2 models")
    names, logzs, errs, results = [], [], [], {}
    for name, model in models.items():
        res = model.log_evidence(obs, noise_var, **kwargs)
        names.append(name)
        logzs.append(float(res.logz))
        errs.append(float(getattr(res, "logz_err", np.nan)))
        results[name] = res
    logz = np.asarray(logzs)
    return EvidenceComparison(
        names=names,
        logz=logz,
        logz_err=np.asarray(errs),
        log_bayes=logz - logz.max(),
        results=results,
    )
