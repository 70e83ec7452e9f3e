"""Benchmark: MCMC log-likelihood throughput (emulate→score fused).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "loglik/s", "vs_baseline": N}``.

The MCMC north-star inner loop scores a mega-batch of parameter draws
against an observed spectrum: ``-0.5·Σ((emulate(θ) − obs)²/σ²)`` per
row. The reference composes this from ~40 ms-per-signal ``predict``
calls ≈ 25 likelihood evaluations/s (reference ``README.rst:11``).

Candidates (fastest wins, subject to the accuracy gate):

* ``xla-{highest,high}`` — predict + reduce composed in one jitted XLA
  program (the (B, 451) signal block round-trips HBM before the
  reduction);
* ``pallas-{highest,high}`` — the fused kernel with obs/noise folded
  into the last layer and a (B,) output
  (:mod:`tpu21cmvae.ops.pallas.fused_loglik`); the ``high`` tier is the
  in-kernel manual hi/lo bf16x3 decomposition.

Accuracy gate: max |Δlog L| vs the exact-f32 XLA path ≤ 0.05 on a
trained model (converged weights are the hard cancellation regime —
docs/PERF.md). A 0.05 shift in log-likelihood moves an MH acceptance
ratio by <5 % — far below MCMC's stochastic noise floor.

Methodology matches bench.py: warm up the compile, then amortized
repeated-call timing on a resident device batch with block_until_ready.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_LOGLIK_PER_SEC = 25.0  # reference: ~40 ms/signal, README.rst:11
BATCH = 1 << 20
ITERS = 20
GATE_ABS_DLOGL = 0.05
_CHECK = 1 << 16  # rows used for the accuracy gate
NOISE_VAR = 25.0  # mK² — a plausible radiometer noise level

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
    obs = model.predict(raw[0]) + rng.normal(0.0, NOISE_VAR**0.5, 451)
    return model, raw, jnp.asarray(obs, jnp.float32)


def _candidates(model, obs):
    from tpu21cmvae.ops.loglik import make_loglik

    cands = []
    for backend in ("xla", "pallas"):
        for tier in ("highest", "high"):
            try:
                fn = jax.jit(
                    make_loglik(
                        model.config, model.normalizer, obs, NOISE_VAR,
                        backend=backend, precision=tier,
                    )
                )
            except Exception as e:  # pragma: no cover
                print(f"bench_mcmc: {backend}-{tier} unavailable: {e}",
                      file=sys.stderr)
                continue
            cands.append((f"{backend}-{tier}", fn))
    return cands


def _time_fn(fn, params, x) -> float:
    jax.block_until_ready(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    model, raw, obs = _build()
    x = jnp.asarray(raw)
    params = model.params

    from tpu21cmvae.ops.loglik import make_loglik

    contract = jax.jit(
        make_loglik(model.config, model.normalizer, obs, NOISE_VAR,
                    backend="xla", precision="highest")
    )
    ref = np.asarray(contract(params, x[:_CHECK]))

    best_name, best_dt = None, float("inf")
    for name, fn in _candidates(model, obs):
        try:
            err = float(np.abs(np.asarray(fn(params, x[:_CHECK])) - ref).max())
            # NaN-safe: `not (err <= gate)` rejects NaN/Inf candidates
            if not (err <= GATE_ABS_DLOGL):
                print(
                    f"bench_mcmc: {name} gate-rejected "
                    f"(|dlogL| {err:.2e} > {GATE_ABS_DLOGL:.1e})",
                    file=sys.stderr,
                )
                continue
            dt = _time_fn(fn, params, x)
            print(
                f"bench_mcmc: {name} |dlogL| {err:.2e}, "
                f"{BATCH / dt / 1e6:.1f}M loglik/s",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"bench_mcmc: {name} failed: {e}", file=sys.stderr)
            continue
        if dt < best_dt:
            best_name, best_dt = name, dt

    if best_name is None:
        raise RuntimeError(
            "no benchmark candidate passed the accuracy gate and timing"
        )
    lps = BATCH / best_dt
    print(
        json.dumps(
            {
                "metric": f"loglik_per_sec_batched[{best_name}]",
                "value": round(lps, 1),
                "unit": "loglik/s",
                "vs_baseline": round(lps / BASELINE_LOGLIK_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
