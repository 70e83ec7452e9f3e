"""Benchmark: MCMC log-likelihood throughput (emulate→score fused).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "loglik/s", "vs_baseline": N}``.

The MCMC north-star inner loop scores a mega-batch of parameter draws
against an observed spectrum: ``-0.5·Σ((emulate(θ) − obs)²/σ²)`` per
row. The reference composes this from ~40 ms-per-signal ``predict``
calls ≈ 25 likelihood evaluations/s (reference ``README.rst:11``).

Candidates (fastest wins, subject to the accuracy gate): the cross
product of backend × method × tier —

* backend ``xla`` (predict + reduce in one jitted XLA program) or
  ``pallas`` (the fused kernel with obs/noise folded into the last
  layer and a (B,) output, :mod:`tpu21cmvae.ops.pallas.fused_loglik`);
* method ``direct`` (full network + residual reduction) or ``gram``
  (output layer collapsed to a quadratic form — the 451-wide output
  never exists; :func:`tpu21cmvae.ops.pallas.fused_loglik.gram_fold`);
* tier ``highest`` (exact f32) or ``high`` (bf16x3; in-kernel manual
  hi/lo decomposition on the pallas backend).

Accuracy gate (two regimes, on a TRAINED model — converged weights are
the hard cancellation regime, docs/PERF.md): for every check row,

    |Δlog L| ≤ ATOL + RTOL · (max log L − log L)

against the exact-f32 path, evaluated on a far-field set (random prior
draws) AND a near-mode set (draws concentrated around the observation's
truth). Rationale: an MH acceptance decision compares two proposals'
log-likelihoods, so what must be accurate is the log L *difference*;
near the mode (depth → 0) the bound is ATOL=0.25 — a deterministic,
smooth perturbation of the log-density at that level distorts the
sampled posterior by ≤ e^±0.25, below MH's practical noise floor —
while in the tails errors proportional to the depth below the mode
cannot flip any decision that wasn't already marginal at the 1.5e-3
level (the same relative budget as bench.py's prediction gate).

Gradient table (``∇logL`` — the HMC/NUTS inner loop,
:func:`tpu21cmvae.ops.loglik.make_loglik_and_grad`): candidates cross
backend (xla autodiff / xla analytic / pallas fused) × method × value
tier × backward tier. Two gates apply:

* the VALUE output passes the same ΔlogL gate as the forward table —
  the Metropolis accept step consumes it, so it bounds posterior
  correctness;
* the GRADIENT passes a two-part bound on the per-row relative error
  ``rel = ‖Δg‖ / (‖g_ref‖ + rms‖g_ref‖)`` against the exact-f32
  autodiff reference, on far + near sets: the 99.9th percentile of
  ``rel`` ≤ GRAD_RTOL (bulk accuracy) AND max ``rel`` ≤ GRAD_MAX_REL
  (no garbage rows). Rationale: leapfrog with ANY deterministic
  approximate force field remains reversible and volume-preserving, so
  with a gated value in the accept step the posterior stays exact
  regardless of gradient error — the gate only needs to keep the
  acceptance-rate cost negligible. The BULK bound does that: a 1 %
  relative force error perturbs the trajectory (hence ΔH) at the same
  order, below leapfrog's own O(ε²) discretization error at practical
  step sizes. A max-over-rows bound at that threshold is the wrong
  shape: precision-tier changes flip isolated ReLU masks on rows
  sitting at a kink — rows whose EXACT gradient is already set-valued
  (any subgradient is "correct") — and such a row moves by O(1)
  no matter how accurate the matmuls are. Measured on the flagship
  (docs/PERF.md): bf16x3's rel distribution is q99.9 = 4.5e-5 with a
  single row of 65,536 at 1.2e-2 — the bulk is 200× inside the gate;
  the loose cap only exists to reject NaN/catastrophic candidates. The
  rms term keeps near-mode rows (where ‖g‖ → 0 and relative error
  diverges harmlessly) from dominating.

Methodology matches bench.py: warm up the compile, then amortized
repeated-call timing on a resident device batch with block_until_ready.
``--out PATH`` writes the full machine-readable tables (both sections)
as JSON; stdout stays the driver's single selected-forward line.

Wedge-proofing (shared with bench.py via :mod:`_benchlib`): candidates
run expected-winner-first (xla-gram-high won r03 forward at 63.6M,
pallas-gram-high won the grad table at 40.9M — ``BENCH_MCMC_r03.json``),
every outcome lands in ``BENCH_MCMC_partial.jsonl`` immediately, a
provisional headline prints as soon as a gate-passer is timed, each
device-touching step is bounded by ``BENCH_CANDIDATE_TIMEOUT`` (300 s
default), and on a presumed wedge the bench stops, writes whatever
tables exist, re-prints the headline, and hard-exits.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from _benchlib import append_partial, hard_exit, run_bounded

BASELINE_LOGLIK_PER_SEC = 25.0  # reference: ~40 ms/signal, README.rst:11
BATCH = 1 << 20
ITERS = 20
GATE_ATOL = 0.25  # |dlogL| allowed at the posterior mode
GATE_RTOL = 1.5e-3  # per unit of depth below the mode
GRAD_RTOL = 1e-2  # 99.9th-pct bound on rel grad error — module docstring
GRAD_MAX_REL = 0.5  # hard per-row cap: rejects NaN/garbage, not kink rows
_CHECK = 1 << 16  # far-field rows used for the accuracy gate
_NEAR = 4096  # near-mode rows
NOISE_VAR = 25.0  # mK² — a plausible radiometer noise level

CANDIDATE_TIMEOUT_S = float(os.environ.get("BENCH_CANDIDATE_TIMEOUT", "300"))
# the model build (checkpoint load + device transfers + host-side
# mega-batch generation) gets its own bound: it is slower than a
# warm candidate but must still fail FAST on a wedged tunnel
BUILD_TIMEOUT_S = float(os.environ.get("BENCH_BUILD_TIMEOUT", "300"))
PARTIAL_PATH = os.environ.get(
    "BENCH_MCMC_PARTIAL", "BENCH_MCMC_partial.jsonl"
)

PRETRAINED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pretrained", "direct_synthetic.npz"
)


def _build():
    from tpu21cmvae.data.synthetic import synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator

    if os.path.exists(PRETRAINED):
        model = DirectEmulator.from_checkpoint(PRETRAINED)
    else:  # pragma: no cover - fallback when the checkpoint is absent
        from tpu21cmvae.data import synthetic_dataset
        from tpu21cmvae.utils.config import TrainConfig

        print("bench_mcmc: pretrained checkpoint absent; training a "
              "fallback gate model", file=sys.stderr)
        data = synthetic_dataset(n_train=2048, n_val=256, n_test=64, seed=0)
        model = DirectEmulator(data)
        model.train(
            train_config=TrainConfig(epochs=30, early_stop_patience=None),
            device_loop=True,
        )
    rng = np.random.default_rng(0)
    raw = synthetic_params(BATCH, rng).astype(np.float32)
    # synthetic observation: the emulated signal of one draw plus noise
    truth = raw[0]
    obs = model.predict(truth) + rng.normal(0.0, NOISE_VAR**0.5, 451)
    # near-mode check set: draws concentrated around the truth — the
    # regime a converged MCMC chain actually samples
    span = raw.max(0) - raw.min(0)
    near = truth[None, :] + 3e-4 * span[None, :] * rng.standard_normal(
        (_NEAR, raw.shape[1])
    )
    near = np.clip(near, raw.min(0), raw.max(0)).astype(np.float32)
    return model, raw, near, jnp.asarray(obs, jnp.float32)


#: expected-winner-first measurement order (BENCH_MCMC_r03.json) — the
#: headline lands in the first timing slot so a tunnel wedge later in
#: the sweep cannot erase the round
_FWD_ORDER = (
    "xla-gram-high", "pallas-gram-high", "xla-direct-high",
    "xla-gram-highest", "pallas-gram-highest", "xla-direct-highest",
    "pallas-direct-high", "pallas-direct-highest",
)


def _candidates(model, obs):
    from tpu21cmvae.ops.loglik import make_loglik

    cands = []
    for backend in ("xla", "pallas"):
        for method in ("direct", "gram"):
            for tier in ("highest", "high"):
                try:
                    fn = jax.jit(
                        make_loglik(
                            model.config, model.normalizer, obs, NOISE_VAR,
                            backend=backend, method=method, precision=tier,
                        )
                    )
                except Exception as e:  # pragma: no cover
                    print(
                        f"bench_mcmc: {backend}-{method}-{tier} "
                        f"unavailable: {e}",
                        file=sys.stderr,
                    )
                    continue
                cands.append((f"{backend}-{method}-{tier}", fn))
    rank = {n: i for i, n in enumerate(_FWD_ORDER)}
    cands.sort(key=lambda nf: rank.get(nf[0], len(_FWD_ORDER)))
    return cands


def _gate_violation(got: np.ndarray, ref: np.ndarray) -> float:
    """Worst excess of |ΔlogL| over the depth-scaled allowance (≤0 ok)."""
    depth = ref.max() - ref
    return float((np.abs(got - ref) - (GATE_ATOL + GATE_RTOL * depth)).max())


def _grad_gate_violation(got: np.ndarray, ref: np.ndarray) -> float:
    """Worst RELATIVE excess over the two-part gradient gate (≤0 ok):
    q99.9 of rel ≤ GRAD_RTOL and max rel ≤ GRAD_MAX_REL (see module
    docstring for why the bulk/cap split is the right shape)."""
    norm = np.linalg.norm(ref, axis=1)
    rms = np.sqrt(np.mean(norm**2))
    rel = np.linalg.norm(got - ref, axis=1) / (norm + rms)
    q999 = float(np.quantile(rel, 0.999))
    return max(q999 - GRAD_RTOL, float(rel.max()) - GRAD_MAX_REL)


def _grad_candidates(model, obs):
    """(name, fn) value+gradient candidates: backend × variant × value
    tier × backward tier (backward-tier suffix ``/g<tier>`` where it
    differs from the value tier)."""
    from tpu21cmvae.ops.loglik import make_loglik_and_grad

    specs = [
        # expected-winner-first (pallas-gram-high/gdefault won r04 at
        # 41.4M) so a mid-sweep wedge cannot erase the grad headline
        ("pallas-gram-high/gdefault", dict(backend="pallas",
                                           precision="high",
                                           grad_precision="default")),
        ("pallas-gram-high", dict(backend="pallas", precision="high")),
        # analytic gram backward (h@G reuse; independent backward tier)
        ("xla-gram-an-high", dict(precision="high")),
        ("xla-gram-an-high/gdefault", dict(precision="high",
                                           grad_precision="default")),
        ("xla-gram-an-highest", dict(precision="highest",
                                     grad_precision="highest")),
        # fused pallas exact-f32 tier
        ("pallas-gram-highest", dict(backend="pallas", precision="highest",
                                     grad_precision="highest")),
        # autodiff baselines (backward tier == value tier by construction);
        # xla-direct-ad-highest is the contract row the speedup quotes
        ("xla-direct-ad-highest", dict(method="direct", variant="autodiff",
                                       precision="highest")),
        ("xla-direct-ad-high", dict(method="direct", variant="autodiff",
                                    precision="high")),
        ("xla-gram-ad-highest", dict(method="gram", variant="autodiff",
                                     precision="highest")),
        ("xla-gram-ad-high", dict(method="gram", variant="autodiff",
                                  precision="high")),
    ]
    cands = []
    for name, kw in specs:
        try:
            fn = jax.jit(make_loglik_and_grad(
                model.config, model.normalizer, obs, NOISE_VAR, **kw
            ))
        except Exception as e:  # pragma: no cover
            print(f"bench_mcmc: grad {name} unavailable: {e}", file=sys.stderr)
            continue
        cands.append((name, fn))
    return cands


def _time_fn(fn, params, x) -> float:
    jax.block_until_ready(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def _emit_headline(best_name: str, lps: float) -> None:
    """Print the metric JSON line NOW (provisional or final — consumers
    take the last line printed)."""
    print(
        json.dumps(
            {
                "metric": f"loglik_per_sec_batched[{best_name}]",
                "value": round(lps, 1),
                "unit": "loglik/s",
                "vs_baseline": round(lps / BASELINE_LOGLIK_PER_SEC, 1),
            }
        ),
        flush=True,
    )


def main(out_path=None):
    # bound the device-touching build (see bench.py): a wedge here must
    # leave a recorded failure, not an empty capture
    status, built = run_bounded(_build, BUILD_TIMEOUT_S)
    if status != "ok":
        append_partial(PARTIAL_PATH, {"event": "build_failed",
                                      "status": status,
                                      "info": str(built)})
        print(f"bench_mcmc: model build {status} ({built}) — device "
              "presumed wedged", file=sys.stderr)
        hard_exit(1)
    model, raw, near, obs = built
    x = jnp.asarray(raw)
    xnear = jnp.asarray(near)
    params = model.params

    from tpu21cmvae.ops.loglik import make_loglik, make_loglik_and_grad

    append_partial(PARTIAL_PATH, {"event": "start", "batch": BATCH})
    contract = jax.jit(
        make_loglik(model.config, model.normalizer, obs, NOISE_VAR,
                    backend="xla", precision="highest")
    )
    status, refs = run_bounded(
        lambda: (np.asarray(contract(params, x[:_CHECK])),
                 np.asarray(contract(params, xnear))),
        CANDIDATE_TIMEOUT_S,
    )
    if status != "ok":
        append_partial(PARTIAL_PATH,
                       {"event": "ref_failed", "status": status,
                        "info": refs})
        print(f"bench_mcmc: contract reference computation {status} "
              f"({refs}) — nothing can be gated", file=sys.stderr)
        hard_exit(1)
    ref_far, ref_near = refs

    rows = []
    best_name, best_dt = None, float("inf")
    wedged = False
    for name, fn in _candidates(model, obs):

        def measure(fn=fn):
            viol = max(
                _gate_violation(np.asarray(fn(params, x[:_CHECK])), ref_far),
                _gate_violation(np.asarray(fn(params, xnear)), ref_near),
            )
            # NaN-safe: `not (viol <= 0)` rejects NaN/Inf candidates
            if not (viol <= 0.0):
                return {"viol": viol, "rejected": True}
            return {"viol": viol, "dt": _time_fn(fn, params, x)}

        status, res = run_bounded(measure, CANDIDATE_TIMEOUT_S)
        if status == "timeout":
            append_partial(PARTIAL_PATH,
                           {"candidate": name, "outcome": "timeout",
                            "timeout_s": CANDIDATE_TIMEOUT_S})
            print(f"bench_mcmc: {name} timed out after "
                  f"{CANDIDATE_TIMEOUT_S:.0f}s — device presumed wedged, "
                  "stopping", file=sys.stderr)
            wedged = True
            break
        if status == "error":
            append_partial(PARTIAL_PATH, {"candidate": name,
                                          "outcome": "error", "error": res})
            print(f"bench_mcmc: {name} failed: {res}", file=sys.stderr)
            continue
        if res.get("rejected"):
            viol = res["viol"]
            print(
                f"bench_mcmc: {name} gate-rejected "
                f"(worst excess {viol:.2e} above allowance)",
                file=sys.stderr,
            )
            append_partial(PARTIAL_PATH,
                           {"candidate": name, "outcome": "gate_rejected",
                            "gate_margin": round(-viol, 4)})
            rows.append({"candidate": name, "gate_margin": round(-viol, 4),
                         "rejected": True})
            continue
        viol, dt = res["viol"], res["dt"]
        print(
            f"bench_mcmc: {name} gate ok (margin {-viol:.2e}), "
            f"{BATCH / dt / 1e6:.1f}M loglik/s",
            file=sys.stderr,
        )
        append_partial(PARTIAL_PATH,
                       {"candidate": name, "outcome": "ok",
                        "gate_margin": round(-viol, 4),
                        "mloglik_per_s": round(BATCH / dt / 1e6, 1)})
        rows.append({"candidate": name, "gate_margin": round(-viol, 4),
                     "mloglik_per_s": round(BATCH / dt / 1e6, 1)})
        if dt < best_dt:
            best_name, best_dt = name, dt
            # provisional headline — a later wedge cannot erase the round
            _emit_headline(best_name, BATCH / best_dt)

    if best_name is None:
        append_partial(PARTIAL_PATH, {"event": "no_winner",
                                      "wedged": wedged})
        print("bench_mcmc: no candidate passed the accuracy gate and "
              "timing", file=sys.stderr)
        hard_exit(1) if wedged else sys.exit(1)
    lps = BATCH / best_dt
    from tpu21cmvae.utils.profiling import matmul_flops_per_row, mfu_line

    sizes = model.config.mlp().sizes
    if "gram" in best_name:  # output layer collapsed to hidden x hidden
        sizes = sizes[:-1] + (sizes[-2],)
    logical, padded = matmul_flops_per_row(sizes)
    print(
        "bench_mcmc: " + mfu_line(
            best_name, lps, logical, padded, best_name.rsplit("-", 1)[-1]
        ),
        file=sys.stderr,
    )

    # -- gradient table (∇logL — the HMC inner loop) ----------------------
    grad_rows = []
    gbest_name, gbest_dt = None, float("inf")
    gref = None
    if not wedged:
        grad_ref_fn = jax.jit(make_loglik_and_grad(
            model.config, model.normalizer, obs, NOISE_VAR,
            backend="xla", method="direct", variant="autodiff",
            precision="highest",
        ))
        status, gref = run_bounded(
            lambda: (
                tuple(np.asarray(a) for a in grad_ref_fn(params, x[:_CHECK])),
                tuple(np.asarray(a) for a in grad_ref_fn(params, xnear)),
            ),
            CANDIDATE_TIMEOUT_S,
        )
        if status != "ok":
            append_partial(PARTIAL_PATH,
                           {"event": "grad_ref_failed", "status": status,
                            "info": gref})
            print(f"bench_mcmc: grad reference {status} ({gref}) — grad "
                  "table skipped", file=sys.stderr)
            wedged = wedged or status == "timeout"
            gref = None
    if gref is not None:
        gref_far, gref_near = gref

        for name, fn in _grad_candidates(model, obs):

            def gmeasure(fn=fn):
                vf, gf = fn(params, x[:_CHECK])
                vn, gn = fn(params, xnear)
                v_viol = max(
                    _gate_violation(np.asarray(vf), gref_far[0]),
                    _gate_violation(np.asarray(vn), gref_near[0]),
                )
                g_viol = max(
                    _grad_gate_violation(np.asarray(gf), gref_far[1]),
                    _grad_gate_violation(np.asarray(gn), gref_near[1]),
                )
                if not (v_viol <= 0.0 and g_viol <= 0.0):
                    return {"v_viol": v_viol, "g_viol": g_viol,
                            "rejected": True}
                return {"v_viol": v_viol, "g_viol": g_viol,
                        "dt": _time_fn(fn, params, x)}

            status, res = run_bounded(gmeasure, CANDIDATE_TIMEOUT_S)
            if status == "timeout":
                append_partial(PARTIAL_PATH,
                               {"candidate": f"grad:{name}",
                                "outcome": "timeout",
                                "timeout_s": CANDIDATE_TIMEOUT_S})
                print(f"bench_mcmc: grad {name} timed out — device "
                      "presumed wedged, stopping", file=sys.stderr)
                wedged = True
                break
            if status == "error":
                append_partial(PARTIAL_PATH,
                               {"candidate": f"grad:{name}",
                                "outcome": "error", "error": res})
                print(f"bench_mcmc: grad {name} failed: {res}",
                      file=sys.stderr)
                continue
            v_viol, g_viol = res["v_viol"], res["g_viol"]
            if res.get("rejected"):
                print(
                    f"bench_mcmc: grad {name} gate-rejected (value excess "
                    f"{v_viol:.2e}, grad excess {g_viol:.2e})",
                    file=sys.stderr,
                )
                append_partial(PARTIAL_PATH,
                               {"candidate": f"grad:{name}",
                                "outcome": "gate_rejected"})
                grad_rows.append({
                    "candidate": name, "value_margin": round(-v_viol, 4),
                    "grad_margin": round(-g_viol, 4), "rejected": True,
                })
                continue
            dt = res["dt"]
            print(
                f"bench_mcmc: grad {name} gates ok (value {-v_viol:.2e}, "
                f"grad {-g_viol:.2e}), {BATCH / dt / 1e6:.1f}M valgrad/s",
                file=sys.stderr,
            )
            append_partial(PARTIAL_PATH,
                           {"candidate": f"grad:{name}", "outcome": "ok",
                            "mvalgrad_per_s": round(BATCH / dt / 1e6, 1)})
            grad_rows.append({
                "candidate": name, "value_margin": round(-v_viol, 4),
                "grad_margin": round(-g_viol, 4),
                "mvalgrad_per_s": round(BATCH / dt / 1e6, 1),
            })
            if dt < gbest_dt:
                gbest_name, gbest_dt = name, dt

    grad_section = None
    if gbest_name is not None:
        gps = BATCH / gbest_dt
        contract_row = next(
            (r for r in grad_rows
             if r["candidate"] == "xla-direct-ad-highest"
             and "mvalgrad_per_s" in r),
            None,
        )
        grad_section = {
            "selected": {
                "metric": f"valgrad_per_sec_batched[{gbest_name}]",
                "value": round(gps, 1),
                "unit": "valgrad/s",
                # the reference offers NO gradients at all; speedup is
                # vs the exact-f32 autodiff contract path here
                "vs_contract_autodiff": (
                    round(gps / (contract_row["mvalgrad_per_s"] * 1e6), 2)
                    if contract_row else None
                ),
            },
            "candidates": grad_rows,
            "gate": (
                f"value: |dlogL| <= {GATE_ATOL} + {GATE_RTOL}*depth; "
                f"grad rel = ||dg||/(||g_ref||+rms): q99.9 <= {GRAD_RTOL}, "
                f"max <= {GRAD_MAX_REL} (ReLU-kink rows are set-valued — "
                "see bench_mcmc.py docstring)"
            ),
        }
        print(
            f"bench_mcmc: grad selected {gbest_name}, "
            f"{gps / 1e6:.1f}M valgrad/s",
            file=sys.stderr,
        )

    if out_path:
        report = {
            "selected": {
                "metric": f"loglik_per_sec_batched[{best_name}]",
                "value": round(lps, 1),
                "unit": "loglik/s",
                "vs_baseline": round(lps / BASELINE_LOGLIK_PER_SEC, 1),
            },
            "candidates": rows,
            "grad": grad_section,
            "hardware": f"{jax.devices()[0].device_kind} "
                        f"({len(jax.devices())} chip)",
            "batch": BATCH,
            "wedged": wedged,
            "gate": (
                f"|dlogL| <= {GATE_ATOL} + {GATE_RTOL} * depth-below-mode, "
                "far + near sets"
            ),
        }
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    append_partial(PARTIAL_PATH, {"event": "final", "winner": best_name,
                                  "mloglik_per_s": round(lps / 1e6, 1),
                                  "grad_winner": gbest_name,
                                  "wedged": wedged})
    _emit_headline(best_name, lps)  # final line == last line
    if wedged:
        hard_exit(0)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write full candidate tables (forward + grad) "
                         "as JSON to this path")
    main(ap.parse_args().out)
