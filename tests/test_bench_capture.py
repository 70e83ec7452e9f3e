"""Wedge-proof benchmark capture (round-3 VERDICT #1).

Round 3's headline number was lost because ``bench.py`` printed its one
JSON line only after timing every candidate — a single TPU-tunnel wedge
(CLAUDE.md) erased the whole run (``BENCH_r03.json`` rc=124). The
restructured bench must:

* persist every candidate outcome to a partial JSONL as it lands,
* print a provisional headline as soon as a gate-passer is timed,
* bound each candidate with a timeout and, on a presumed wedge, stop and
  still exit 0 with the best-so-far headline as the LAST stdout line.

The worker (tests/_bench_capture_worker.py) stubs the candidate list
with a fast winner, an erroring candidate, and a hanging one; it runs in
a subprocess because the wedge path hard-exits via ``os._exit``.
"""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_bench_capture_worker.py")
MCMC_WORKER = os.path.join(
    os.path.dirname(__file__), "_bench_mcmc_capture_worker.py"
)


@pytest.mark.slow
def test_bench_survives_wedge_with_headline_and_partials(tmp_path):
    partial = tmp_path / "partial.jsonl"
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)  # worker needs no virtual mesh
    proc = subprocess.run(
        [sys.executable, WORKER, str(partial)],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # the LAST stdout line is the headline, and it names the winner even
    # though a later candidate wedged
    json_lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    assert json_lines, proc.stdout
    last = json_lines[-1]
    assert last["metric"] == "signals_per_sec_batched_inference[winner]"
    assert last["value"] > 0
    assert last["unit"] == "signals/s"
    # provisional emission: the headline appeared at least twice (once
    # when the winner landed, once as the final line)
    assert len(json_lines) >= 2

    # every candidate outcome was persisted the moment it landed
    recs = [json.loads(ln) for ln in partial.read_text().splitlines()]
    by_cand = {r.get("candidate"): r for r in recs if "candidate" in r}
    assert by_cand["winner"]["outcome"] == "ok"
    assert by_cand["winner"]["signals_per_sec"] > 0
    assert by_cand["exploder"]["outcome"] == "error"
    assert "boom" in by_cand["exploder"]["error"]
    assert by_cand["wedger"]["outcome"] == "timeout"
    final = [r for r in recs if r.get("event") == "final"]
    assert final and final[0]["winner"] == "winner" and final[0]["wedged"]


@pytest.mark.slow
def test_bench_mcmc_survives_wedge(tmp_path):
    partial = tmp_path / "mcmc_partial.jsonl"
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, MCMC_WORKER, str(partial)],
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    json_lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith("{")
    ]
    assert json_lines, proc.stdout
    last = json_lines[-1]
    assert last["metric"] == "loglik_per_sec_batched[xla-gram-high]"
    assert last["value"] > 0

    recs = [json.loads(ln) for ln in partial.read_text().splitlines()]
    by_cand = {r.get("candidate"): r for r in recs if "candidate" in r}
    assert by_cand["xla-gram-high"]["outcome"] == "ok"
    assert by_cand["wedger"]["outcome"] == "timeout"
    final = [r for r in recs if r.get("event") == "final"]
    assert final and final[0]["wedged"]
    # grad table must have been skipped once the device was presumed
    # wedged — no grad candidates attempted, no grad winner
    assert final[0]["grad_winner"] is None
    assert not any(str(c).startswith("grad:") for c in by_cand)
