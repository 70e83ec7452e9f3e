"""Tests for the profiling/timing and metrics-logging subsystems
(SURVEY.md §5: the reference has neither — these pin the replacements)."""

import os

import jax
import jax.numpy as jnp
import pytest

from tpu21cmvae.train.loop import fit
from tpu21cmvae.utils.config import TrainConfig
from tpu21cmvae.utils.logging import (
    MetricsLogger,
    history_to_csv,
    history_to_jsonl,
    read_jsonl,
)
from tpu21cmvae.utils.profiling import (
    annotate,
    benchmark,
    debug_guard,
    device_memory_stats,
)


def test_benchmark_discipline():
    calls = []

    @jax.jit
    def f(x):
        return x * 2.0

    def wrapped(x):
        calls.append(1)
        return f(x)

    x = jnp.ones((8, 8))
    res = benchmark(wrapped, x, iters=5, warmup=2, items_per_call=8, name="dbl")
    assert len(res.times_s) == 5
    assert len(calls) == 7  # warmup excluded from stats but executed
    assert res.mean_s > 0 and res.min_s <= res.mean_s
    assert res.items_per_sec == pytest.approx(8 / res.mean_s)
    assert "dbl" in res.summary() and "items/s" in res.summary()


def test_annotate_context():
    with annotate("region"):
        jax.block_until_ready(jnp.ones(4) + 1)


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert stats is None or isinstance(stats, dict)


def test_debug_guard_restores_config():
    before = jax.config.jax_debug_nans
    with debug_guard(nans=True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises((FloatingPointError, Exception)):
            jax.block_until_ready(jax.jit(lambda x: x / x)(jnp.zeros(4)))
    assert jax.config.jax_debug_nans == before


def _tiny_fit(splits, normalizer, callback=None):
    from tpu21cmvae.ops.losses import relative_mse
    from tpu21cmvae.ops.mlp import init_mlp, mlp_apply
    from tpu21cmvae.ops.transforms import par_transform, preproc

    params = init_mlp(jax.random.key(0), (7, 16, splits.n_bins))
    sm = normalizer.scaled_mean

    def loss_fn(p, x, y):
        return relative_mse(y, mlp_apply(p, x), sm)

    x = par_transform(jnp.asarray(splits.par_train[:128], jnp.float32), normalizer)
    y = preproc(jnp.asarray(splits.signal_train[:128], jnp.float32), normalizer)
    xv = par_transform(jnp.asarray(splits.par_val[:32], jnp.float32), normalizer)
    yv = preproc(jnp.asarray(splits.signal_val[:32], jnp.float32), normalizer)
    cfg = TrainConfig(epochs=3, early_stop_patience=None, plateau_patience=None)
    return fit(params, loss_fn, x, y, xv, yv, cfg, epoch_callback=callback)


def test_metrics_logger_streams_epochs(tmp_path, splits, normalizer):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as logger:
        _, _, hist = _tiny_fit(splits, normalizer, callback=logger.epoch_callback)
    rows = read_jsonl(path)
    assert len(rows) == 3
    assert [r["epoch"] for r in rows] == [0, 1, 2]
    assert rows[0]["loss"] == pytest.approx(hist.loss[0])
    assert all("epoch_time_s" in r and "lr" in r for r in rows)


def test_metrics_logger_appends(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as logger:
        logger.log(epoch=0, loss=1.0)
    with MetricsLogger(path) as logger:
        logger.log(epoch=1, loss=0.5)
    rows = read_jsonl(path)
    assert [r["epoch"] for r in rows] == [0, 1]


def test_history_exports(tmp_path, splits, normalizer):
    _, _, hist = _tiny_fit(splits, normalizer)
    jpath = history_to_jsonl(hist, str(tmp_path / "h.jsonl"))
    cpath = history_to_csv(hist, str(tmp_path / "h.csv"))
    assert len(read_jsonl(jpath)) == len(hist.loss)
    with open(cpath) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0].startswith("epoch,loss,val_loss")
    assert len(lines) == len(hist.loss) + 1


def test_trace_writes_profile(tmp_path):
    pytest.importorskip("tensorflow", reason="profiler backend optional")
    from tpu21cmvae.utils.profiling import trace

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    assert os.path.isdir(logdir)
