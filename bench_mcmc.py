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
GATE_ATOL = 0.25  # |dlogL| allowed at the posterior mode
GATE_RTOL = 1.5e-3  # per unit of depth below the mode
_CHECK = 1 << 16  # far-field rows used for the accuracy gate
_NEAR = 4096  # near-mode rows
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
    return cands


def _gate_violation(got: np.ndarray, ref: np.ndarray) -> float:
    """Worst excess of |ΔlogL| over the depth-scaled allowance (≤0 ok)."""
    depth = ref.max() - ref
    return float((np.abs(got - ref) - (GATE_ATOL + GATE_RTOL * depth)).max())


def _time_fn(fn, params, x) -> float:
    jax.block_until_ready(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    model, raw, near, obs = _build()
    x = jnp.asarray(raw)
    xnear = jnp.asarray(near)
    params = model.params

    from tpu21cmvae.ops.loglik import make_loglik

    contract = jax.jit(
        make_loglik(model.config, model.normalizer, obs, NOISE_VAR,
                    backend="xla", precision="highest")
    )
    ref_far = np.asarray(contract(params, x[:_CHECK]))
    ref_near = np.asarray(contract(params, xnear))

    best_name, best_dt = None, float("inf")
    for name, fn in _candidates(model, obs):
        try:
            viol = max(
                _gate_violation(np.asarray(fn(params, x[:_CHECK])), ref_far),
                _gate_violation(np.asarray(fn(params, xnear)), ref_near),
            )
            # NaN-safe: `not (viol <= 0)` rejects NaN/Inf candidates
            if not (viol <= 0.0):
                print(
                    f"bench_mcmc: {name} gate-rejected "
                    f"(worst excess {viol:.2e} above allowance)",
                    file=sys.stderr,
                )
                continue
            dt = _time_fn(fn, params, x)
            print(
                f"bench_mcmc: {name} gate ok (margin {-viol:.2e}), "
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
