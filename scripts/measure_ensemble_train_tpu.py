"""Measure ensemble/seed-parallel training on the real TPU.

Sequential baseline: M independent fit_scan runs (one whole-run program
each — M traces, M device calls). Candidate: fit_scan_stack — ONE
vmapped whole-run program (one trace, one device call, every training
matmul batched over the member axis). Feeds docs/PERF.md.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_ensemble_train_tpu.py
"""

import json
import time

import jax


def main():
    from tpu21cmvae.data import synthetic_dataset
    from tpu21cmvae.models.ensemble import DeepEnsemble
    from tpu21cmvae.utils.config import DirectEmulatorConfig, TrainConfig

    print("device:", jax.devices()[0])
    # reference scale: 26,888 train rows, batch 256 -> 106 steps/epoch
    data = synthetic_dataset(n_train=26_888, n_val=852, n_test=852, seed=0)
    cfg = DirectEmulatorConfig()  # flagship widths
    # fixed-epoch recipe: identical work per member, so the comparison
    # is program structure, not stochastic stop epochs
    tc = TrainConfig(epochs=60, early_stop_patience=None,
                     plateau_patience=None)
    m = 4
    out = {}

    for name, kwargs in (("sequential", {}), ("stacked", {"parallel": True})):
        t0 = time.perf_counter()
        ens = DeepEnsemble.train(data, n_members=m, train_config=tc,
                                 config=cfg, **kwargs)
        cold = time.perf_counter() - t0
        # warm repeat: same shapes + same loss closures are NOT reused
        # across DeepEnsemble.train calls (fresh models -> fresh
        # closures), so re-run measures cold-ish wall again; instead
        # report the cold wall and the per-member history length.
        out[name] = {
            "members": m,
            "epochs": tc.epochs,
            "wall_s": round(cold, 2),
            "final_val": [round(float(mm.history.val_loss[-1]), 6)
                          for mm in ens.members],
        }
        print(name, json.dumps(out[name]))

    out["speedup"] = round(
        out["sequential"]["wall_s"] / out["stacked"]["wall_s"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
