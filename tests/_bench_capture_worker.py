"""Subprocess worker for test_bench_capture: run bench.main() with stub
candidates (fast winner, erroring candidate, hanging candidate) and tiny
sizes, proving the wedge-proof capture path end to end. Runs out of
process because the wedge path hard-exits via ``os._exit``.

Usage: python _bench_capture_worker.py <partial_jsonl_path>
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench.BATCH = 256
bench.ITERS = 2
bench._CHECK = 64
bench.CANDIDATE_TIMEOUT_S = 3.0
bench.PARTIAL_PATH = sys.argv[1]


def fake_candidates(model, native, aligned):
    good = model.predict_fn()

    def hang(params, x):
        time.sleep(60)

    def boom(params, x):
        raise RuntimeError("boom")

    # winner first (provisional headline), then an error (recorded,
    # skipped), then a wedge (timeout -> stop + hard exit)
    p = model.params
    return [("winner", good, p, "f32"), ("exploder", boom, p, "f32"),
            ("wedger", hang, p, "f32")]


bench._candidates = fake_candidates
bench.main()
