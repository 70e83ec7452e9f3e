"""Sampler result containers and convergence diagnostics
(:class:`SampleResult`, :class:`BatchSampleResult`).

Split from the round-3 ``sampling.py`` monolith with zero behavior
change; see the package ``__init__`` for the map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

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

