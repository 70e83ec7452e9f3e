"""Measure the round-3 inference-stack additions on the real TPU.

One command, one JSON block per surface, ~3-5 min of device time
(first-compile dominated through the tunnel). Feeds docs/PERF.md —
run after any change to tpu21cmvae/sampling/ or vi.py and paste the numbers.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_inference_tpu.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *, repeats=3):
    """Wall time of fn() with block_until_ready discipline: one warm
    call (compile), then the best of ``repeats`` (tunnel dispatch
    jitter is one-sided)."""
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_params

    print("device:", jax.devices()[0])
    em = DirectEmulator.from_checkpoint("pretrained/direct_synthetic.npz")
    rng = np.random.default_rng(1)
    truth = synthetic_params(1, rng)[0].astype(np.float32)
    obs = jnp.asarray(em.predict(truth) + rng.normal(0, 5.0, 451),
                      jnp.float32)
    nv = 25.0
    lo = PAR_RANGES[:, 0].astype(np.float32)
    hi = PAR_RANGES[:, 1].astype(np.float32)
    bounds = np.stack([lo, hi], axis=1)
    out = {}

    # -- MH chain throughput (production size) ---------------------------
    from tpu21cmvae.sampling import sample_mh, sample_pt, sample_to_ess

    W, S, WU = 4096, 500, 200
    loglik = em.loglik_fn(obs, nv)
    dt = timed(lambda: sample_mh(
        loglik, em.params, n_walkers=W, n_steps=S, n_warmup=WU,
        thin=0, bounds=bounds, seed=0,
    ), repeats=2)
    evals = W * (S + WU)
    out["mh"] = {"walkers": W, "steps": S + WU, "wall_s": round(dt, 3),
                 "loglik_evals_per_s": round(evals / dt)}

    # -- PT (32 rungs) ----------------------------------------------------
    K, Wp, Sp, WUp = 32, 256, 400, 400
    dt = timed(lambda: sample_pt(
        loglik, em.params, n_rungs=K, n_walkers=Wp, n_steps=Sp,
        n_warmup=WUp, thin=10, bounds=bounds, seed=0,
    ), repeats=2)
    evals = K * Wp * (Sp + WUp)
    out["pt"] = {"rungs": K, "walkers": Wp, "steps": Sp + WUp,
                 "wall_s": round(dt, 3),
                 "loglik_evals_per_s": round(evals / dt),
                 "sweeps_per_s": round((Sp + WUp) / dt, 1)}

    # -- target-ESS chunk latency (the cached-continuation promise) ------
    t0 = time.perf_counter()
    res = sample_to_ess(
        loglik, em.params, target_ess=5e4, chunk_steps=200, n_walkers=2048,
        n_warmup=200, thin=10, bounds=bounds, seed=0, max_chunks=2,
    )
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sample_to_ess(
        loglik, em.params, target_ess=5e4, chunk_steps=200, n_walkers=2048,
        n_warmup=200, thin=10, bounds=bounds, seed=1, max_chunks=2,
    )
    warm = time.perf_counter() - t0
    out["to_ess"] = {"cold_2chunks_s": round(cold, 3),
                     "warm_2chunks_s": round(warm, 3),
                     "min_ess": round(float(res.ess().min()))}

    # -- HMC vs ChEES at a matched budget ---------------------------------
    from tpu21cmvae.sampling import sample_chees, sample_hmc, sample_nuts

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    valgrad = em.loglik_and_grad_fn(
        obs, nv, backend=backend, grad_precision="default"
    )
    kwh = dict(n_walkers=4096, n_steps=300, n_warmup=200, thin=5,
               bounds=bounds, seed=0)
    for name, fn, extra in (
        ("hmc", sample_hmc, {"n_leapfrog": 8}),
        ("chees", sample_chees, {}),
        ("nuts", sample_nuts, {"max_depth": 6}),
    ):
        res = fn(valgrad, em.params, **kwh, **extra)  # compile
        t0 = time.perf_counter()
        res = fn(valgrad, em.params, **dict(kwh, seed=1), **extra)
        dt = time.perf_counter() - t0
        ess = float(res.ess().min())
        out[name] = {
            "walkers": 4096, "steps": 500, "wall_s": round(dt, 3),
            "min_ess": round(ess), "min_ess_per_s": round(ess / dt),
            "accept": round(float(res.accept_rate[-20:].mean()), 3),
        }
        if hasattr(res, "trajectory_length"):
            out[name]["trajectory_length"] = round(
                float(res.trajectory_length), 4)
            out[name]["step_size"] = round(float(res.step_size), 4)
        if hasattr(res, "mean_leapfrog"):
            out[name]["mean_leapfrog"] = round(
                float(res.mean_leapfrog), 1)
            out[name]["divergence_rate"] = float(res.divergence_rate)

    # -- Laplace evidence (deterministic quick look) -----------------------
    ll_exact = em.loglik_fn(obs, nv, precision="contract")
    from tpu21cmvae.sampling import laplace_evidence

    dt = timed(lambda: laplace_evidence(
        ll_exact, em.params, bounds=bounds, seed=0,
    ), repeats=3)
    lap = laplace_evidence(ll_exact, em.params, bounds=bounds, seed=0)
    out["laplace"] = {"warm_wall_s": round(dt, 3),
                      "logz": round(lap.logz, 2), "pd": bool(lap.pd)}

    # -- ADVI --------------------------------------------------------------
    from tpu21cmvae.vi import fit_advi
    dt = timed(lambda: fit_advi(
        valgrad, em.params, bounds=bounds, n_steps=600, n_mc=512, seed=0,
    ), repeats=2)
    out["advi"] = {"steps": 600, "n_mc": 512, "wall_s": round(dt, 3),
                   "valgrad_evals_per_s": round(600 * 512 / dt)}

    # -- profile likelihood -------------------------------------------------
    from tpu21cmvae.sampling import profile_likelihood

    grid = np.linspace(lo[3] + 0.02 * (hi[3] - lo[3]),
                       hi[3] - 0.02 * (hi[3] - lo[3]), 41)
    dt = timed(lambda: profile_likelihood(
        valgrad, em.params, 3, grid, n_starts=256, n_steps=300,
        bounds=bounds, seed=0,
    ), repeats=2)
    out["profile"] = {"grid": 41, "starts": 256, "steps": 300,
                      "wall_s": round(dt, 3),
                      "valgrad_evals_per_s": round(
                          41 * 256 * 300 / dt)}

    # -- evidence: rebuilt ladder vs nested --------------------------------
    from tpu21cmvae.nested import nested_sampling
    from tpu21cmvae.sampling import log_evidence

    t0 = time.perf_counter()
    ns = nested_sampling(loglik, em.params, bounds=bounds, n_live=2048,
                         seed=0)
    ns_dt = time.perf_counter() - t0
    ladders = {}
    for K_, S_ in ((32, 400), (64, 1200)):
        t0 = time.perf_counter()
        ev = log_evidence(loglik, em.params, n_rungs=K_, n_walkers=256,
                          n_steps=S_, n_warmup=max(200, S_ // 3),
                          bounds=bounds, seed=0)
        ladders[f"K{K_}_S{S_}"] = {
            "logz": round(ev.logz, 2), "err": round(ev.logz_err, 3),
            "drift": round(ev.ladder_drift, 3),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
    from tpu21cmvae.sampling import sample_smc

    t0 = time.perf_counter()
    smc = sample_smc(loglik, em.params, n_particles=4096, bounds=bounds,
                     seed=0)
    smc_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    smc = sample_smc(loglik, em.params, n_particles=4096, bounds=bounds,
                     seed=1)
    smc_warm = time.perf_counter() - t0
    out["evidence"] = {
        "nested": {"logz": round(ns.logz, 2),
                   "err": round(ns.logz_err, 3),
                   "wall_s": round(ns_dt, 2)},
        "smc": {"logz": round(smc.logz, 2),
                "err": round(smc.logz_err, 3),
                "stages": smc.n_stages,
                "wall_cold_s": round(smc_cold, 2),
                "wall_warm_s": round(smc_warm, 2)},
        "ladder": ladders,
    }

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
