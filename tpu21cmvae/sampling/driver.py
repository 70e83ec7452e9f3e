"""Cross-sampler drivers: the batched-observation dispatcher
(:func:`run_batched_chain`) and the run-until-converged loop
(:func:`sample_to_ess`).

Split from the round-3 ``sampling.py`` monolith with zero behavior
change; see the package ``__init__`` for the map.
"""

from __future__ import annotations

import numpy as np

from tpu21cmvae.sampling._common import _resolve_bounds
from tpu21cmvae.sampling.gradient import sample_hmc, sample_nuts
from tpu21cmvae.sampling.mh import sample_mh
from tpu21cmvae.sampling.results import BatchSampleResult, SampleResult

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
    per-parameter effective sample size of the accumulated chain —
    min over bulk ESS *and* tail ESS (Vehtari et al. 2021 §4.3), so
    credible-interval endpoints are backed by as many effective draws
    as the center — reaches ``target_ess``: "give me N effective
    samples" instead of guessing a step count. Chunking is affordable because of the
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
        if full.shape[0] >= 4:
            # gate on the WORSE of bulk and tail ESS (Vehtari et al.
            # 2021 §4.3): bulk alone can read converged while tail
            # quantiles are still unmixed — round-3 VERDICT weak #3.
            # ANY per-parameter NaN tail (that parameter's chains never
            # toggled the indicator — e.g. a chain pinned at a box
            # bound) counts as not-converged: there is zero tail
            # evidence for it, and certifying the run on the healthy
            # parameters alone would be exactly the silent-tail failure
            # this gate exists to refuse. max_chunks still bounds cost.
            tail = probe.ess_tail()
            if (np.isfinite(tail).all()
                    and min(probe.ess().min(), tail.min()) >= target_ess):
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


