"""Round-5 experiment: is the single-pass-bf16 likelihood surface of
the TIER-NATIVE checkpoint admissible for MCMC?

The forward path's round-5 result (128M sig/s) came from re-framing
the gate: accuracy to TRUTH, not f32-agreement. The MCMC path poses a
harder version of the same question. A DEFAULT-tier likelihood is NOT
a noisy contract likelihood — it is the EXACT likelihood of the bf16
model (deterministic rounding, so Metropolis acceptance is exact on
that surface). The admissibility question is therefore whether the
bf16-model POSTERIOR agrees with the contract-tier posterior within
Monte-Carlo error — per-bin forward deviations (~1.4e-2 rel-to-amp ≈
a few mK) could coherently shift sharp posteriors by a noticeable
fraction of their width.

This job, on the shipped tier-native checkpoint and a synthetic
observation at the production noise level (25 mK²):

1. measures the DEFAULT-vs-contract logL deviation fields
   (bench_mcmc's far/near probes) on the native weights;
2. samples the SAME observation with `sample_mh` at both tiers
   (matched seeds/budgets, ESS-checked) and reports per-parameter
   posterior mean shifts in units of the posterior sd, plus sd ratios;
3. estimates log Z at both tiers with nested sampling;
4. times the gram likelihood at both tiers (the would-be payoff).

Outcome either way goes to docs/PERF.md: a measured admission (the
bf16-model posterior is statistically indistinguishable → the ~2x
loglik tier is usable) or a measured dead end with the shift profile
on the record (the mixed-precision-probe precedent).

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    scripts/measure_native_loglik_tpu.py > /tmp/native_loglik.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NOISE_VAR = 25.0
N_OBS_PROBE = 3  # posterior A/B on this many observations
OUT = os.path.join(ROOT, "scripts", "native_loglik_tpu.json")


def main():
    import jax
    import jax.numpy as jnp

    from tpu21cmvae.data.synthetic import synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.sampling import sample_mh
    from tpu21cmvae.nested import nested_sampling

    print(f"devices: {jax.devices()}", flush=True)
    em = DirectEmulator.from_checkpoint(
        os.path.join(ROOT, "pretrained", "direct_synthetic_bf16.npz")
    )
    rng = np.random.default_rng(7)
    theta = synthetic_params(N_OBS_PROBE, rng).astype(np.float32)
    clean = np.asarray(em.predict(theta))
    obs = (clean + rng.normal(0.0, NOISE_VAR**0.5, clean.shape)).astype(
        np.float32
    )
    rec = {"noise_var": NOISE_VAR, "obs": []}

    DEF = jax.lax.Precision.DEFAULT

    # -- 1. deviation fields (bench_mcmc's probes) -----------------------
    llA = em.loglik_fn(obs[0], NOISE_VAR, precision="contract")
    llB = em.loglik_fn(obs[0], NOISE_VAR, precision=DEF)
    far = jnp.asarray(synthetic_params(65536,
                                       np.random.default_rng(1))
                      .astype(np.float32))
    a = np.asarray(llA(em.params, far), np.float64)
    b = np.asarray(llB(em.params, far), np.float64)
    far_rel = float(np.max(np.abs(a - b) / np.maximum(np.abs(a), 1.0)))
    near = jnp.asarray(
        (theta[0] + 0.02 * np.random.default_rng(2).standard_normal(
            (4096, 7)) * np.abs(theta[0])).astype(np.float32)
    )
    na = np.asarray(llA(em.params, near), np.float64)
    nb = np.asarray(llB(em.params, near), np.float64)
    rec["deviation"] = {
        "far_rel": far_rel,
        "near_abs_max": float(np.max(np.abs(na - nb))),
        "near_abs_median": float(np.median(np.abs(na - nb))),
    }
    print(f"logL deviation: far rel {far_rel:.2e}, near abs "
          f"median {np.median(np.abs(na - nb)):.2f} / max "
          f"{np.max(np.abs(na - nb)):.2f} nats", flush=True)

    # -- 2. posterior A/B ------------------------------------------------
    kw = dict(n_walkers=8192, n_steps=600, n_warmup=300, thin=5)
    for o in range(N_OBS_PROBE):
        fA = em.loglik_fn(obs[o], NOISE_VAR, precision="contract")
        fB = em.loglik_fn(obs[o], NOISE_VAR, precision=DEF)
        rA = sample_mh(fA, em.params, seed=11, **kw)
        rB = sample_mh(fB, em.params, seed=11, **kw)
        cA, cB = rA.flat, rB.flat
        mA, sA = cA.mean(0), cA.std(0)
        mB, sB = cB.mean(0), cB.std(0)
        shift = (mB - mA) / np.maximum(sA, 1e-12)
        sdr = sB / np.maximum(sA, 1e-12)
        ess = min(float(np.min(rA.ess())), float(np.min(rB.ess())))
        # MC error of the mean in sd units ~ 1/sqrt(ESS) per chain side
        mc = 2.0 / np.sqrt(max(ess, 1.0))
        zA = nested_sampling(fA, em.params, n_live=512, seed=3 + o)
        zB = nested_sampling(fB, em.params, n_live=512, seed=3 + o)
        entry = {
            "max_abs_mean_shift_sd": float(np.max(np.abs(shift))),
            "mean_shift_sd": [round(float(x), 3) for x in shift],
            "sd_ratio": [round(float(x), 3) for x in sdr],
            "min_ess": ess,
            "mc_err_sd_units": round(float(mc), 3),
            "logz_contract": round(zA.logz, 3),
            "logz_default": round(zB.logz, 3),
            "dlogz": round(zB.logz - zA.logz, 3),
            "logz_err_comb": round(float(np.hypot(zA.logz_err,
                                                  zB.logz_err)), 3),
        }
        rec["obs"].append(entry)
        print(f"obs {o}: max |mean shift| {entry['max_abs_mean_shift_sd']:.3f} sd "
              f"(MC floor ~{mc:.3f}), sd ratio "
              f"{min(sdr):.3f}-{max(sdr):.3f}, dlogZ "
              f"{entry['dlogz']:+.3f} ± {entry['logz_err_comb']:.3f}",
              flush=True)

    # -- 3. throughput at both tiers -------------------------------------
    BATCH, ITERS = 1 << 20, 20
    x = jnp.asarray(synthetic_params(BATCH, np.random.default_rng(0))
                    .astype(np.float32))

    def t(fn):
        jax.block_until_ready(fn(em.params, x))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(em.params, x)
        jax.block_until_ready(out)
        return BATCH / ((time.perf_counter() - t0) / ITERS)

    rec["throughput"] = {}
    for name, prec in (("gram-high", None), ("gram-default", DEF)):
        fn = em.loglik_fn(obs[0], NOISE_VAR, precision=prec)
        sps = t(fn)
        rec["throughput"][name] = round(sps, 1)
        print(f"{name}: {sps / 1e6:.1f}M loglik/s", flush=True)

    worst = max(e["max_abs_mean_shift_sd"] for e in rec["obs"])
    floor = max(e["mc_err_sd_units"] for e in rec["obs"])
    rec["verdict"] = (
        "admissible" if worst <= max(2 * floor, 0.1) else "shifted"
    )
    print(f"verdict: {rec['verdict']} (worst shift {worst:.3f} sd vs "
          f"floor {floor:.3f})", flush=True)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
