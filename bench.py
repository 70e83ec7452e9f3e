"""Benchmark: batched-inference throughput of the flagship emulator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "signals/s", "vs_baseline": N}``.

Baseline: the reference emulates ~1 signal per 40 ms ≈ 25 signals/s
(reference ``README.rst:11``; BASELINE.md). Here a mega-batch of raw
parameter draws runs through ``par_transform → MLP → unpreproc`` in one
fused device call per batch (optionally a Pallas kernel), on however many
chips the mesh has (one in this environment).

Methodology: warm up the compile, then time ``ITERS`` repeated calls on a
resident device batch with ``block_until_ready``; fresh inputs per call
are irrelevant (the computation is input-independent in structure and the
batch stays on device, as it would inside a JAX-native MCMC loop).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SIGNALS_PER_SEC = 25.0  # reference: ~40 ms/signal, README.rst:11
BATCH = 1 << 20
ITERS = 20


def _build():
    from tpu21cmvae.data import synthetic_dataset
    from tpu21cmvae.models.direct import DirectEmulator

    data = synthetic_dataset(n_train=2048, n_val=64, n_test=64, seed=0)
    model = DirectEmulator(data)
    rng = np.random.default_rng(0)
    from tpu21cmvae.data.synthetic import synthetic_params

    raw = synthetic_params(BATCH, rng).astype(np.float32)
    return model, raw


def _candidates(model):
    """(name, fn) pairs of jitted (params, raw)->signals implementations."""
    cands = [("xla", model.predict_fn())]
    try:
        from tpu21cmvae.ops.pallas.fused_mlp import make_fused_emulate

        cands.append(
            ("pallas", jax.jit(make_fused_emulate(model.config, model.normalizer)))
        )
    except Exception:
        pass
    return cands


def _time_fn(fn, params, x) -> float:
    jax.block_until_ready(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    model, raw = _build()
    x = jnp.asarray(raw)
    params = model.params

    best_name, best_dt = None, float("inf")
    for name, fn in _candidates(model):
        try:
            dt = _time_fn(fn, params, x)
        except Exception:
            continue
        if dt < best_dt:
            best_name, best_dt = name, dt

    sps = BATCH / best_dt
    print(
        json.dumps(
            {
                "metric": f"signals_per_sec_batched_inference[{best_name}]",
                "value": round(sps, 1),
                "unit": "signals/s",
                "vs_baseline": round(sps / BASELINE_SIGNALS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
