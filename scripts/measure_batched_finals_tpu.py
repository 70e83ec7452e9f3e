"""Round-5 real-batch measurement: the batched definitive evidence tier.

Round 4 measured the escalation loop's wall on the real 64-observation
batch: 68 s for the batched Laplace sweep, then ~1,294 s for 35
sequential flow attempts + 25 sequential per-row nested finals — 95 %
of the wall in the un-batched 5 % of the pipeline (docs/PERF.md;
round-4 VERDICT weak #1/#2). This job measures, on the same batch and
checkpoint:

A. ``method="auto"`` with NO final (Laplace sweep + flow attempts) —
   the stage the batched-nested change does not touch;
B. ``final="nested"`` — now routed through ``nested_sampling_batch``
   (ALL hard rows as one device program). Finals wall ≈ t_B − t_A
   (program caches are warm across calls: the per-row likelihood
   closures are memoized on the model);
C. ``final="smc"`` — the multimodality-capable definitive stage,
   measured head-to-head on the identical hard rows (round-4 VERDICT
   weak #2 / item 5), with per-row logz agreement vs B;
D. sequential per-row nested on a sample of the hard rows — the
   per-row agreement check for the batched tier AND the sequential-
   wall yardstick (extrapolated to all hard rows).

Each stage appends to ``batched_finals_partial.jsonl`` the moment it
lands (tunnel-wedge survivable); the full summary goes to
``batched_finals_tpu.json``.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
    scripts/measure_batched_finals_tpu.py > /tmp/batched_finals.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_OBS = 64
NOISE_VAR = 25.0
SEED = 0
KHAT = 0.7
SEQ_SAMPLE = 4  # sequential nested runs for the agreement/wall check
PARTIAL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "batched_finals_partial.jsonl")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "batched_finals_tpu.json")


def log(rec):
    with open(PARTIAL, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def main():
    stages = os.environ.get("BF_STAGES", "ABCD").upper()
    from tpu21cmvae.data.synthetic import synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator

    model = DirectEmulator.from_checkpoint(
        os.path.join(ROOT, "pretrained", "direct_synthetic.npz")
    )
    rng = np.random.default_rng(SEED)
    theta = synthetic_params(N_OBS, rng).astype(np.float32)
    clean = np.asarray(model.predict(theta))
    obs = (clean + rng.normal(0.0, NOISE_VAR**0.5, clean.shape)).astype(
        np.float32
    )
    summary = {"n_obs": N_OBS, "khat_threshold": KHAT}

    # -- A: laplace + flow attempts, no finals ---------------------------
    t0 = time.time()
    res_a = model.log_evidence_batch(obs, NOISE_VAR, method="auto",
                                     seed=SEED)
    t_a = time.time() - t0
    still = [i for i, r in enumerate(res_a) if not (r.khat < KHAT)]
    summary["A_auto_no_final"] = {
        "wall_s": round(t_a, 1),
        "hard_rows": len(still),
        "flow_adopted": sum(r.method_used == "flow" for r in res_a),
    }
    log({"stage": "A", **summary["A_auto_no_final"]})

    # -- B: batched nested finals ----------------------------------------
    if "B" not in stages:
        with open(OUT, "w") as f:
            json.dump(summary, f, indent=1)
        return
    t0 = time.time()
    res_b = model.log_evidence_batch(obs, NOISE_VAR, method="auto",
                                     final="nested",
                                     final_kwargs=dict(n_live=1024),
                                     seed=SEED)
    t_b = time.time() - t0
    fin_b = [i for i, r in enumerate(res_b)
             if r.method_used == "nested"]
    ok_b = all((r.khat < KHAT) or r.method_used == "nested"
               for r in res_b)
    summary["B_batched_nested_final"] = {
        "wall_s": round(t_b, 1),
        "finals_wall_s": round(t_b - t_a, 1),
        "nested_finalized": len(fin_b),
        "all_trustworthy_or_definitive": bool(ok_b),
    }
    log({"stage": "B", **summary["B_batched_nested_final"]})

    # -- C: smc finals (sequential, 0.38 s/row warm) ---------------------
    if "C" not in stages:
        with open(OUT, "w") as f:
            json.dump(summary, f, indent=1)
        return
    t0 = time.time()
    res_c = model.log_evidence_batch(obs, NOISE_VAR, method="auto",
                                     final="smc",
                                     seed=SEED)
    t_c = time.time() - t0
    fin_c = [i for i, r in enumerate(res_c) if r.method_used == "smc"]
    both = sorted(set(fin_b) & set(fin_c))
    dz = [res_b[i].logz - res_c[i].logz for i in both]
    err = [float(np.hypot(res_b[i].logz_err, res_c[i].logz_err))
           for i in both]
    n_agree = sum(abs(d) <= max(3 * e, 0.5) for d, e in zip(dz, err))
    summary["C_smc_final"] = {
        "wall_s": round(t_c, 1),
        "finals_wall_s": round(t_c - t_a, 1),
        "smc_finalized": len(fin_c),
        "rows_compared": len(both),
        "nested_vs_smc_agree_3sig": n_agree,
        "dlogz_median": round(float(np.median(np.abs(dz))), 3) if both else None,
        "dlogz_max": round(float(np.max(np.abs(dz))), 3) if both else None,
    }
    log({"stage": "C", **summary["C_smc_final"]})

    # -- D: sequential per-row nested on a sample ------------------------
    from tpu21cmvae.nested import nested_sampling

    sample = still[:SEQ_SAMPLE]
    seq = {}
    t0 = time.time()
    for i in sample:
        fr = nested_sampling(
            model.loglik_fn(obs[i], NOISE_VAR, precision="contract"),
            model.params, n_live=1024, seed=SEED + 15_485_863 * (i + 1),
        )
        seq[i] = (fr.logz, fr.logz_err)
    t_d = time.time() - t0
    per_row = t_d / max(len(sample), 1)
    agree = [
        abs(res_b[i].logz - seq[i][0])
        <= max(3 * float(np.hypot(res_b[i].logz_err, seq[i][1])), 0.5)
        for i in sample if res_b[i].method_used == "nested"
    ]
    summary["D_sequential_sample"] = {
        "rows": sample,
        "wall_s": round(t_d, 1),
        "per_row_s": round(per_row, 1),
        "extrapolated_sequential_finals_s": round(per_row * len(still), 1),
        "batched_vs_sequential_agree_3sig":
            f"{sum(agree)}/{len(agree)}",
        "speedup_vs_batched_finals": round(
            per_row * len(still) / max(t_b - t_a, 1e-9), 1
        ),
    }
    log({"stage": "D", **summary["D_sequential_sample"]})

    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
