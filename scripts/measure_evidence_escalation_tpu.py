"""Measure the batched-evidence khat escalation loop on the real TPU.

Reproduces the round-3 PERF.md measurement (pretrained checkpoint, 64
synthetic noisy observations, batched Laplace+AMIS log Z) and then runs
the round-4 ``method="auto"`` policy: rows with khat >= 0.7 are
re-estimated through per-row flow proposals. Reports the before/after
khat distribution, per-row method_used, agreement between the Laplace
and flow estimates on escalated rows, and wall time. Writes a JSON
summary next to this script.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/measure_evidence_escalation_tpu.py
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


def main():
    from tpu21cmvae.data.synthetic import synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator

    model = DirectEmulator.from_checkpoint(
        os.path.join(ROOT, "pretrained", "direct_synthetic.npz")
    )
    rng = np.random.default_rng(SEED)
    theta = synthetic_params(N_OBS, rng).astype(np.float32)
    clean = np.asarray(model.predict(theta))
    obs = clean + rng.normal(0.0, NOISE_VAR**0.5, clean.shape)
    obs = obs.astype(np.float32)

    t0 = time.time()
    base = model.log_evidence_batch(obs, NOISE_VAR, method="laplace",
                                    seed=SEED)
    t_base = time.time() - t0
    khat0 = np.array([r.khat for r in base])
    print(f"laplace sweep: {t_base:.1f}s, khat>=0.7 on "
          f"{(khat0 >= 0.7).sum()}/{N_OBS} rows "
          f"(median {np.median(khat0):.2f}, max {khat0.max():.2f})")

    t0 = time.time()
    res = model.log_evidence_batch(obs, NOISE_VAR, method="auto",
                                   final="nested",
                                   final_kwargs=dict(n_live=1024),
                                   seed=SEED)
    t_auto = time.time() - t0
    khat1 = np.array([r.khat for r in res])
    used = [r.method_used for r in res]
    n_esc = sum(u == "flow" for u in used)
    n_fin = sum(u == "nested" for u in used)
    fin_ok = np.array([(k < 0.7) or (u == "nested")
                       for k, u in zip(khat1, used)])
    print(f"auto+nested sweep: {t_auto:.1f}s total, {n_esc} rows "
          f"flow-adopted, {n_fin} rows nested-finalized; every row "
          f"trustworthy-or-definitive: {fin_ok.all()} "
          f"({fin_ok.sum()}/{N_OBS})")

    dz = np.array([r.logz - b.logz for r, b in zip(res, base)])
    esc = np.array([u == "flow" for u in used])
    if esc.any():
        print(f"escalated-row |dlogz| vs laplace: median "
              f"{np.median(np.abs(dz[esc])):.3f}, max "
              f"{np.abs(dz[esc]).max():.3f} nats")

    out = {
        "n_obs": N_OBS,
        "laplace": {
            "wall_s": round(t_base, 1),
            "khat_ge_07": int((khat0 >= 0.7).sum()),
            "khat_median": round(float(np.median(khat0)), 3),
            "khat_max": round(float(khat0.max()), 3),
        },
        "auto": {
            "wall_s": round(t_auto, 1),
            "escalated": int(n_esc),
            "nested_finalized": int(n_fin),
            "all_trustworthy_or_definitive": bool(fin_ok.all()),
            "khat_ge_07": int((khat1 >= 0.7).sum()),
            "khat_median": round(float(np.nanmedian(khat1)), 3),
            "khat_max": round(float(np.nanmax(khat1)), 3),
            "esc_dlogz_median": (round(float(np.median(np.abs(dz[esc]))), 3)
                                 if esc.any() else None),
            "esc_dlogz_max": (round(float(np.abs(dz[esc]).max()), 3)
                              if esc.any() else None),
        },
        "method_used": used,
        # NaN (nested-finalized rows have no weight diagnostic) → None:
        # literal NaN tokens are not valid JSON
        "khat_before": [None if not np.isfinite(k) else round(float(k), 3)
                        for k in khat0],
        "khat_after": [None if not np.isfinite(k) else round(float(k), 3)
                       for k in khat1],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "evidence_escalation_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
