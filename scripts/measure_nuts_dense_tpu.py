"""Measure NUTS dense-vs-diag divergence rate + throughput on real TPU.

Round-3 VERDICT weak #5: `metric="auto"` resolves dense for NUTS, which
measured a 0.39 % divergence rate on the production posterior where
diag measured 0 (docs/PERF.md). Round 4 re-adapts the step size under
the refreshed dense metric (third warmup window); this script
re-measures both configs over several seeds on the production posterior
(pretrained checkpoint, real obs + 25 mK², 4,096 walkers x 500 steps,
200 warmup) and writes a JSON block for docs/PERF.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
    scripts/measure_nuts_dense_tpu.py
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_params
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.sampling import sample_nuts

    print("device:", jax.devices()[0])
    em = DirectEmulator.from_checkpoint(
        os.path.join(ROOT, "pretrained", "direct_synthetic.npz")
    )
    rng = np.random.default_rng(1)
    truth = synthetic_params(1, rng)[0].astype(np.float32)
    obs = jnp.asarray(em.predict(truth) + rng.normal(0, 5.0, 451),
                      jnp.float32)
    bounds = np.stack(
        [PAR_RANGES[:, 0], PAR_RANGES[:, 1]], axis=1
    ).astype(np.float32)
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    valgrad = em.loglik_and_grad_fn(obs, 25.0, backend=backend,
                                    grad_precision="default")
    kw = dict(n_walkers=4096, n_steps=500, n_warmup=200, thin=5,
              bounds=bounds, max_depth=6)

    out = {}
    for metric in ("dense", "diag"):
        # compile once, then interleaved seed repeats (tunnel jitter)
        sample_nuts(valgrad, em.params, metric=metric, seed=0, **kw)
        walls, divs, esss, leaps = [], [], [], []
        for seed in (1, 2, 3, 4):
            t0 = time.perf_counter()
            res = sample_nuts(valgrad, em.params, metric=metric,
                              seed=seed, **kw)
            walls.append(time.perf_counter() - t0)
            divs.append(res.divergence_rate)
            esss.append(float(res.ess().min()))
            leaps.append(res.mean_leapfrog)
            print(f"{metric} seed {seed}: wall {walls[-1]:.2f}s, "
                  f"div {100 * divs[-1]:.3f}%, minESS {esss[-1]:.0f}, "
                  f"leapfrog {leaps[-1]:.1f}", flush=True)
        out[metric] = {
            "wall_s": round(float(np.median(walls)), 2),
            "divergence_pct": [round(100 * d, 4) for d in divs],
            "min_ess": [round(e) for e in esss],
            "min_ess_per_s": round(float(np.median(
                [e / w for e, w in zip(esss, walls)]
            ))),
            "mean_leapfrog": round(float(np.mean(leaps)), 1),
        }

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "nuts_dense_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
