"""Shared wedge-proofing machinery for bench.py / bench_mcmc.py.

The TPU tunnel can stall mid-run (CLAUDE.md): ``jax.devices()`` works but
any execute/transfer blocks forever. Round 3 lost its headline number to
exactly that (``BENCH_r03.json`` rc=124) because everything printed at
the end. The benches therefore:

* run each device-touching step in a daemon worker thread bounded by a
  timeout (:func:`run_bounded`) — a wedge is detected, not waited out;
* persist every candidate outcome to a partial JSONL the moment it lands
  (:func:`append_partial`) — a killed run still leaves a usable record;
* print provisional headline lines early and hard-exit via ``os._exit``
  once the headline is safely on stdout (a wedged runtime's atexit hooks
  can hang forever).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


def append_partial(path: str, rec: dict) -> None:
    """Append one outcome record to ``path`` and fsync immediately."""
    rec = {"ts": round(time.time(), 1), **rec}
    try:
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
    except OSError as e:  # pragma: no cover - read-only mount etc.
        print(f"bench: partial log unwritable: {e}", file=sys.stderr)


def run_bounded(fn, timeout_s: float):
    """Run ``fn()`` in a daemon thread with a deadline.

    Returns ``("ok", result)``, ``("error", "Type: msg")``, or
    ``("timeout", None)`` — the latter meaning the device is presumed
    wedged (the thread is abandoned; it cannot be cancelled, which is why
    callers hard-exit once their result is safe).
    """
    box: dict = {}

    def work():
        try:
            box["result"] = fn()
        except Exception as e:  # noqa: BLE001 - recorded per candidate
            box["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return "timeout", None
    if "error" in box:
        return "error", box["error"]
    return "ok", box["result"]


def hard_exit(code: int) -> None:
    """Flush stdio and exit WITHOUT running atexit hooks (which can hang
    on a wedged device runtime). Only used once results are persisted."""
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
