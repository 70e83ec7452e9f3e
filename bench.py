"""Benchmark: batched-inference throughput of the flagship emulator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "signals/s", "vs_baseline": N}``.

Baseline: the reference emulates ~1 signal per 40 ms ≈ 25 signals/s
(reference ``README.rst:11``; BASELINE.md). Here a mega-batch of raw
parameter draws runs through ``par_transform → MLP → unpreproc`` in one
fused device call per batch, on however many chips the mesh has (one in
this environment).

Candidates (fastest wins, subject to the accuracy gate):

* ``xla-highest`` — the accuracy-contract path (exact-f32 matmuls);
* ``xla-high`` — 3-pass-bf16 (bf16x3) MXU matmuls, f32 accumulation;
* ``xla-default`` — single-pass-bf16 MXU matmuls, f32 accumulation;
* ``pallas-{highest,high}`` — the fused whole-network kernel
  (:mod:`tpu21cmvae.ops.pallas.fused_mlp`) at the exact-f32 and
  stacked in-kernel bf16x3 tiers.

Accuracy gate: a candidate is eligible only if its max error relative to
signal amplitude vs the contract path is ≤ 1.5e-3 — under half of the
0.34 % mean-relative-error contract (BASELINE.md), so tier selection can
never cost the golden numbers. The gate runs on a TRAINED model:
converged weights have far more cancellation than random init, and
1-pass bf16 degrades from ~4e-4 (random) to ~1.4e-2 (trained) —
measured on v5e; a random-init gate would wrongly admit it. The weights
are the shipped CONVERGED checkpoint ``pretrained/direct_synthetic.npz``
(0.159 % mean relative error — ``pretrained/README.md``), the strongest
available cancellation regime; a quick training run is only a fallback
when the file is absent.

Methodology: warm up the compile, then time ``ITERS`` repeated calls on a
resident device batch with ``block_until_ready``; fresh inputs per call
are irrelevant (the computation is input-independent in structure and the
batch stays on device, as it would inside a JAX-native MCMC loop).

Wedge-proofing (the TPU tunnel can stall mid-run — CLAUDE.md; round 3
lost its headline to exactly that, ``BENCH_r03.json`` rc=124):

* candidates run EXPECTED-WINNER-FIRST (xla-high won r02 at 58.0M), so
  the headline lands in the first timing slot;
* every candidate outcome is appended to ``BENCH_partial.jsonl`` the
  moment it lands — a killed run still leaves a usable record;
* a provisional headline JSON line is printed (and flushed) as soon as
  the first gate-passing candidate is timed, and re-printed whenever a
  later candidate wins — consumers take the LAST line;
* each candidate's gate+timing runs in a daemon worker thread bounded by
  ``BENCH_CANDIDATE_TIMEOUT`` (default 300 s; first slot covers compile).
  On timeout the device is presumed wedged: no further candidates are
  attempted (they would hang on the same device) and the process exits
  via ``os._exit`` so a hung runtime cannot block the recorded result.
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

BASELINE_SIGNALS_PER_SEC = 25.0  # reference: ~40 ms/signal, README.rst:11
BATCH = 1 << 20
ITERS = 20
GATE_REL_TO_AMP = 1.5e-3
_CHECK = 1 << 16  # rows used for the accuracy gate

CANDIDATE_TIMEOUT_S = float(os.environ.get("BENCH_CANDIDATE_TIMEOUT", "300"))
# the model build (checkpoint load + device transfers + host-side
# mega-batch generation) gets its own bound: it is slower than a
# warm candidate but must still fail FAST on a wedged tunnel
BUILD_TIMEOUT_S = float(os.environ.get("BENCH_BUILD_TIMEOUT", "300"))
PARTIAL_PATH = os.environ.get("BENCH_PARTIAL", "BENCH_partial.jsonl")


TRAIN_EPOCHS = 30  # fallback only: enough weight cancellation for the gate

PRETRAINED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pretrained", "direct_synthetic.npz"
)
# tier-NATIVE checkpoint: fine-tuned WITH the single-pass-bf16 forward
# in its loss (scripts/finetune_bf16_tpu.py), so the golden accuracy
# regime holds AT Precision.DEFAULT — gated below on accuracy-to-TRUTH
# (test_error on the golden synthetic split), not on f32-agreement,
# which is the wrong question for weights whose optimum IS the bf16
# forward (round-4 VERDICT weak #5).
PRETRAINED_NATIVE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pretrained",
    "direct_synthetic_bf16.npz",
)
# MXU-128-aligned architecture (256,256,128,128,128 — throughput-aware
# halving search over MXU_ALIGNED_SPACE, scripts/train_aligned_tpu.py):
# 2.7x less padded MXU work than the reference shape at equal-accuracy-
# class golden error (0.195 % at its native DEFAULT tier). Gated like
# the native checkpoint: accuracy-to-truth.
PRETRAINED_ALIGNED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "pretrained",
    "direct_aligned_bf16.npz",
)
GATE_GOLDEN_MEAN_PCT = 0.34  # the reference contract (README.rst:11)
SHIP_REGIME_PCT = 0.20  # the shipped-checkpoint regime (pretrained/)


def _build():
    from tpu21cmvae.data.synthetic import synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator

    if os.path.exists(PRETRAINED):
        # the shipped converged checkpoint (0.159 % mean rel. error) —
        # the strongest cancellation regime for the precision gate
        model = DirectEmulator.from_checkpoint(PRETRAINED)
    else:  # pragma: no cover - fallback when the checkpoint is absent
        from tpu21cmvae.data import synthetic_dataset
        from tpu21cmvae.utils.config import TrainConfig

        print("bench: pretrained checkpoint absent; training a fallback "
              "gate model", file=sys.stderr)
        data = synthetic_dataset(n_train=2048, n_val=256, n_test=64, seed=0)
        model = DirectEmulator(data)
        # device_loop: the whole training is one device call — avoids per-
        # epoch dispatch latency dominating bench wall time on remote links
        model.train(
            train_config=TrainConfig(
                epochs=TRAIN_EPOCHS, early_stop_patience=None
            ),
            device_loop=True,
        )
    native = aligned = None
    if os.path.exists(PRETRAINED_NATIVE):
        native = DirectEmulator.from_checkpoint(PRETRAINED_NATIVE)
        if native.native_precision is None:  # pragma: no cover
            print("bench: checkpoint at pretrained/direct_synthetic_bf16"
                  ".npz carries no native_precision; ignoring",
                  file=sys.stderr)
            native = None
    if os.path.exists(PRETRAINED_ALIGNED):
        aligned = DirectEmulator.from_checkpoint(PRETRAINED_ALIGNED)
        if aligned.native_precision is None:  # pragma: no cover
            aligned = None
    rng = np.random.default_rng(0)
    raw = synthetic_params(BATCH, rng).astype(np.float32)
    return model, native, aligned, raw


_GOLDEN_SPLIT = []


def _golden_split():
    """The golden synthetic split (the split of
    ``tests/test_pretrained.py``), generated once per process — two
    golden-gated candidates must not pay the ~30k-signal host-side
    generation twice inside their bounded workers."""
    from tpu21cmvae.data import synthetic_dataset

    if not _GOLDEN_SPLIT:
        _GOLDEN_SPLIT.append(synthetic_dataset(
            n_train=26888, n_val=1704, n_test=1704, seed=0
        ))
    return _GOLDEN_SPLIT[0]


def _golden_gate_native(native):
    """Accuracy-to-TRUTH gate for a tier-native checkpoint: mean
    relative test error on the golden synthetic split at the
    checkpoint's native tier must hold the reference contract (0.34 %)
    — measured 0.174 % for the shipped reference-shape bf16 checkpoint
    and 0.195 % for the aligned one (``scripts/*.json``). Runs inside
    the bounded worker like every other gate."""
    from tpu21cmvae.utils.metrics import error

    data = _golden_split()
    pred = np.asarray(
        native.predict_fn(precision="native")(
            native.params, jnp.asarray(data.par_test, jnp.float32)
        )
    )
    err = error(data.signal_test, pred, relative=True,
                nu_arr=native.frequencies)
    return float(err.mean()), float(np.median(err))


def _candidates(model, native, aligned):
    """(name, fn, params, gate) rows of jitted (params, raw)->signals
    implementations. ``gate`` is ``"f32"`` (max rel-to-amp agreement
    with the contract path of the SAME weights) or ``"golden"`` (the
    tier-native checkpoint: accuracy-to-truth on the golden split —
    its weights differ, so f32-agreement is the wrong question).

    Ordered expected-winner-first so a mid-run tunnel wedge cannot
    erase the headline: the tier-native bf16 checkpoint measured
    104-122M sig/s raw-tier in round 4 (docs/PERF.md) and holds the
    golden regime (0.174 %), so it takes the first slot; xla-high
    (58.3M, the r02-r04 winner) is the first same-weights slot.
    """
    cands = [
        ("xla-high",
         model.predict_fn(precision=jax.lax.Precision.HIGH),
         model.params, "f32"),
        ("xla-highest", model.predict_fn(), model.params, "f32"),
        ("xla-default",
         model.predict_fn(precision=jax.lax.Precision.DEFAULT),
         model.params, "f32"),
    ]
    if native is not None:
        cands.insert(0, (
            f"xla-native-{native.native_precision}",
            native.predict_fn(precision="native"),
            native.params,
            "golden",
        ))
    if aligned is not None:
        # right after the reference-shape native tier: same gate, 2.7x
        # less padded MXU work (its OWN model object carries the gate)
        cands.insert(1 if native is not None else 0, (
            f"xla-aligned-{aligned.native_precision}",
            aligned.predict_fn(precision="native"),
            aligned.params,
            ("golden", aligned),
        ))
    try:
        from tpu21cmvae.ops.pallas.fused_mlp import make_fused_emulate

        # gate-passable tiers: exact-f32 dot, and the manual in-kernel
        # hi/lo bf16x3 decomposition (the HIGH accuracy class Mosaic's
        # dot lowering lacks natively). Single-pass bf16 is ~1.4e-2
        # rel-to-amp on trained weights and can never pass the 1.5e-3
        # gate — docs/PERF.md — so it is not a candidate.
        # per-tier measured-best kernel configs on v5e (docs/PERF.md):
        # the bf16x3 tier gains from 4×512-row interleaved sub-chains
        # per 2048-row block; exact-f32's larger live set prefers the
        # plain 1024-row block
        tier_kwargs = {
            "highest": {},
            "high": {
                "block_rows": 2048,
                "interleave": 4,
                "vmem_limit_bytes": 110 * 1024 * 1024,
            },
        }
        # fastest pallas tier (bf16x3) right after the expected xla
        # winner; the exact-f32 kernel after the xla contract tier
        off = 1 if native is not None else 0
        for pos, tier in ((1 + off, "high"), (3 + off, "highest")):
            cands.insert(
                pos,
                (
                    f"pallas-{tier}",
                    jax.jit(
                        make_fused_emulate(
                            model.config,
                            model.normalizer,
                            precision=tier,
                            weight_dtype=jnp.float32,
                            **tier_kwargs[tier],
                        )
                    ),
                    model.params,
                    "f32",
                ),
            )
    except Exception as e:  # pragma: no cover - kernel unavailable
        print(f"bench: pallas candidate unavailable: {e}", file=sys.stderr)
    return cands


def _time_fn(fn, params, x) -> float:
    jax.block_until_ready(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def _real_data_contract():
    """Fire the real-dataset accuracy contract automatically whenever the
    environment can supply the data (round-2 VERDICT missing #1): use
    ``$TPU21CMVAE_DATASET`` or the cache file if present, else attempt
    ONE Zenodo download (fails fast under zero egress), then run the
    full golden-number battery (:mod:`tpu21cmvae.verify`) and write
    ``VERIFY_REAL.json``. Outcome — either way — goes to stderr so every
    bench log records whether 0.34 %/0.29 % was proven or unprovable."""
    from tpu21cmvae.data.dataset import default_cache_path, download_dataset

    path = os.environ.get("TPU21CMVAE_DATASET") or default_cache_path()
    if not os.path.exists(path):
        try:
            download_dataset(path)
        except Exception as e:
            print(
                f"bench: real 21cmGEM dataset unavailable at {path} and "
                f"download failed ({type(e).__name__}) — golden-contract "
                "battery skipped; synthetic-regime evidence in docs/PERF.md",
                file=sys.stderr,
            )
            return
    try:
        from tpu21cmvae.data import load_dataset
        from tpu21cmvae.verify import (
            format_report,
            run_verification,
            write_report,
        )

        ref_models = "/root/reference/VeryAccurateEmulator/models"
        direct_h5 = os.path.join(ref_models, "emulator.h5")
        keras_dir = os.path.join(ref_models, "autoencoder_based_emulator")
        report = run_verification(
            load_dataset(path),
            direct_h5=direct_h5 if os.path.exists(direct_h5) else None,
            keras_dir=keras_dir if os.path.isdir(keras_dir) else None,
            dataset_label=path,
        )
        write_report(report, "VERIFY_REAL.json")
        print("bench: REAL-DATA contract battery ran → VERIFY_REAL.json",
              file=sys.stderr)
        print(format_report(report), file=sys.stderr)
    except Exception as e:  # pragma: no cover - never hide the bench line
        print(f"bench: real-data verification errored: "
              f"{type(e).__name__}: {e}", file=sys.stderr)


def _append_partial(rec: dict) -> None:
    """Persist one candidate outcome immediately (crash/wedge survivable)."""
    append_partial(PARTIAL_PATH, rec)


def _emit_headline(best_name: str, sps: float) -> None:
    """Print the metric JSON line NOW (provisional or final — consumers
    take the last line printed)."""
    print(
        json.dumps(
            {
                "metric": f"signals_per_sec_batched_inference[{best_name}]",
                "value": round(sps, 1),
                "unit": "signals/s",
                "vs_baseline": round(sps / BASELINE_SIGNALS_PER_SEC, 1),
            }
        ),
        flush=True,
    )


def _measure(fn, params, x, ref, amp):
    """f32-agreement gate then time one candidate. Runs inside the
    bounded worker."""
    err = float(
        (np.abs(np.asarray(fn(params, x[:_CHECK])) - ref) / amp).max()
    )
    # NaN-safe: `not (err <= gate)` rejects NaN/Inf candidates,
    # where `err > gate` would let them through (NaN > x is False)
    if not (err <= GATE_REL_TO_AMP):
        return {"err": err, "gate_rejected": True}
    return {"err": err, "dt": _time_fn(fn, params, x)}


def _measure_native(fn, params, x, native):
    """Golden accuracy-to-truth gate then time the tier-native
    candidate. Runs inside the bounded worker."""
    mean_pct, median_pct = _golden_gate_native(native)
    if not (mean_pct <= GATE_GOLDEN_MEAN_PCT):
        return {"golden_mean_pct": mean_pct, "gate_rejected": True}
    return {
        "golden_mean_pct": mean_pct,
        "golden_median_pct": median_pct,
        "ship_regime": bool(mean_pct <= SHIP_REGIME_PCT),
        "dt": _time_fn(fn, params, x),
    }


def main():
    # _build touches the device (checkpoint arrays transfer at model
    # construction) — a tunnel wedge here would hang BEFORE any partial
    # record exists, reproducing the round-3 empty-capture failure one
    # stage earlier. Bound it like everything else.
    status, built = run_bounded(_build, BUILD_TIMEOUT_S)
    if status != "ok":
        _append_partial({"event": "build_failed", "status": status,
                         "info": str(built)})
        print(f"bench: model build {status} ({built}) — device "
              "presumed wedged", file=sys.stderr)
        hard_exit(1)
    model, native, aligned, raw = built
    x = jnp.asarray(raw)
    params = model.params

    _append_partial({"event": "start", "batch": BATCH, "iters": ITERS})
    status, ref = run_bounded(
        lambda: np.asarray(model.predict_fn()(params, x[:_CHECK])),
        CANDIDATE_TIMEOUT_S,
    )
    if status != "ok":
        _append_partial({"event": "ref_failed", "status": status, "info": ref})
        print(f"bench: contract reference computation {status} ({ref}) — "
              "nothing can be gated", file=sys.stderr)
        hard_exit(1)
    amp = np.abs(ref).max(axis=1, keepdims=True)

    best_name, best_dt = None, float("inf")
    wedged = False
    for name, fn, cand_params, gate in _candidates(model, native,
                                                   aligned):
        if gate == "golden" or isinstance(gate, tuple):
            gate_model = native if gate == "golden" else gate[1]
            task = (lambda fn=fn, p=cand_params, gm=gate_model:
                    _measure_native(fn, p, x, gm))
        else:
            task = (lambda fn=fn, p=cand_params:
                    _measure(fn, p, x, ref, amp))
        status, res = run_bounded(task, CANDIDATE_TIMEOUT_S)
        if status == "timeout":
            # device presumed wedged (CLAUDE.md tunnel failure mode) —
            # further candidates would hang on the same device
            _append_partial({"candidate": name, "outcome": "timeout",
                             "timeout_s": CANDIDATE_TIMEOUT_S})
            print(f"bench: {name} timed out after {CANDIDATE_TIMEOUT_S:.0f}s "
                  "— device presumed wedged, stopping", file=sys.stderr)
            wedged = True
            break
        if status == "error":
            _append_partial({"candidate": name, "outcome": "error",
                             "error": res})
            print(f"bench: {name} failed: {res}", file=sys.stderr)
            continue
        if res.get("gate_rejected"):
            rec = {"candidate": name, "outcome": "gate_rejected"}
            rec.update({k: v for k, v in res.items()
                        if k != "gate_rejected"})
            _append_partial(rec)
            detail = (
                f"golden mean {res['golden_mean_pct']:.3f}% > "
                f"{GATE_GOLDEN_MEAN_PCT}%"
                if "golden_mean_pct" in res
                else f"err {res['err']:.2e} > {GATE_REL_TO_AMP:.1e}"
            )
            print(f"bench: {name} gate-rejected ({detail})",
                  file=sys.stderr)
            continue
        dt = res["dt"]
        rec = {"candidate": name, "outcome": "ok",
               "signals_per_sec": round(BATCH / dt, 1)}
        rec.update({k: v for k, v in res.items() if k != "dt"})
        _append_partial(rec)
        detail = (
            f"golden mean {res['golden_mean_pct']:.3f}%/median "
            f"{res['golden_median_pct']:.3f}%"
            if "golden_mean_pct" in res
            else f"err {res['err']:.2e}"
        )
        print(f"bench: {name} {detail}, "
              f"{BATCH / dt / 1e6:.1f}M signals/s", file=sys.stderr)
        if dt < best_dt:
            best_name, best_dt = name, dt
            # provisional headline the moment a gate-passing candidate
            # lands — a later wedge can no longer erase the round
            _emit_headline(best_name, BATCH / best_dt)

    if best_name is None:
        _append_partial({"event": "no_winner", "wedged": wedged})
        print("bench: no candidate passed the accuracy gate and timing",
              file=sys.stderr)
        # a wedged runtime's atexit hooks can hang forever — hard-exit
        hard_exit(1) if wedged else sys.exit(1)

    sps = BATCH / best_dt
    from tpu21cmvae.utils.profiling import matmul_flops_per_row, mfu_line

    logical, padded = matmul_flops_per_row(model.config.mlp().sizes)
    print(
        "bench: " + mfu_line(
            best_name, sps, logical, padded, best_name.rsplit("-", 1)[-1]
        ),
        file=sys.stderr,
    )
    _append_partial({"event": "final", "winner": best_name,
                     "signals_per_sec": round(sps, 1), "wedged": wedged})
    _emit_headline(best_name, sps)  # final line == last line
    if wedged:
        # the headline is safe on stdout; do not let a hung runtime (or
        # the real-data battery, which would also wedge) block exit
        hard_exit(0)
    # after the metric line (never block it): prove the real-data golden
    # contract automatically in any environment that can supply the data
    _real_data_contract()


if __name__ == "__main__":
    main()
