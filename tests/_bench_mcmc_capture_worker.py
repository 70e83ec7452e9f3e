"""Subprocess worker for test_bench_capture: bench_mcmc wedge path.

Runs bench_mcmc.main() with tiny sizes and a stubbed candidate list (the
real xla-gram-high followed by a hanging candidate), proving: provisional
headline before the wedge, per-candidate partial persistence, grad table
skipped once wedged, rc 0 via hard exit.

Usage: python _bench_mcmc_capture_worker.py <partial_jsonl_path>
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_mcmc as bm  # noqa: E402

bm.BATCH = 256
bm.ITERS = 2
bm._CHECK = 64
bm._NEAR = 32
bm.CANDIDATE_TIMEOUT_S = 3.0
bm.PARTIAL_PATH = sys.argv[1]

_orig = bm._candidates


def fake_candidates(model, obs):
    real = dict(_orig(model, obs))

    def hang(params, x):
        time.sleep(60)

    return [("xla-gram-high", real["xla-gram-high"]), ("wedger", hang)]


bm._candidates = fake_candidates
bm.main()
