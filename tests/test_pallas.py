"""Parity tests: Pallas fused kernel vs the XLA reference path.

Run in interpreter mode on the virtual CPU backend (tests/conftest.py);
on a real TPU the same code compiles through Mosaic. The XLA path
(``mlp_apply`` at HIGHEST precision) is the ground truth the kernel must
match — mirroring the reference's strategy of testing predictions against
golden artifacts (reference ``tests/test_emulator.py:55-69``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.data.synthetic import synthetic_params
from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.ops.mlp import init_mlp, mlp_apply
from tpu21cmvae.ops.pallas import (
    fold_emulator_constants,
    make_fused_emulate,
    make_fused_mlp,
)
from tpu21cmvae.ops.transforms import par_transform, unpreproc
from tpu21cmvae.utils.config import DirectEmulatorConfig


def test_fold_constants_exact(splits, normalizer):
    """Folding the normalizer into first/last layers reproduces
    par_transform → mlp → unpreproc up to float error, given pre-logged
    inputs."""
    cfg = DirectEmulatorConfig(hidden_dims=(32, 48))
    params = init_mlp(jax.random.key(0), cfg.mlp().sizes)
    raw = jnp.asarray(splits.par_test[:17], jnp.float32)

    ref = unpreproc(
        mlp_apply(params, par_transform(raw, normalizer)), normalizer
    )

    folded = fold_emulator_constants(params, normalizer)
    # reproduce only the log/clamp stage of par_transform
    from tpu21cmvae.ops.pallas.fused_mlp import _log_clamp

    got = mlp_apply(folded, _log_clamp(raw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("batch", [8, 100, 256])
def test_fused_mlp_matches_xla(batch):
    """Generic fused MLP == mlp_apply on random weights/inputs, including
    a batch that is not a multiple of the row tile."""
    sizes = (7, 64, 96, 33)
    params = init_mlp(jax.random.key(1), sizes)
    x = jax.random.normal(jax.random.key(2), (batch, 7), jnp.float32)
    fused = make_fused_mlp(sizes, block_rows=64, interpret=True)
    got = fused(params, x)
    want = mlp_apply(params, x)
    assert got.shape == (batch, 33)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_emulate_matches_model(splits):
    """End-to-end: fused kernel == DirectEmulator's jitted predict on raw
    parameter draws, including fx == 0 rows (the log clamp)."""
    model = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(48, 56)))
    rng = np.random.default_rng(3)
    raw = synthetic_params(130, rng).astype(np.float32)
    raw[:5, 2] = 0.0  # exercise the fx clamp in-kernel
    fused = jax.jit(
        make_fused_emulate(
            model.config, model.normalizer, block_rows=64, interpret=True
        )
    )
    got = np.asarray(fused(model.params, jnp.asarray(raw)))
    want = model.predict(raw)
    # mK-scale signals: allow float32-accumulation-order differences
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_fused_emulate_flagship_shapes(splits):
    """Flagship architecture (7→288→352→288→224→451) through the kernel."""
    model = DirectEmulator(splits)
    raw = jnp.asarray(splits.par_test[:32], jnp.float32)
    fused = make_fused_emulate(model.config, model.normalizer, interpret=True)
    out = fused(model.params, raw)
    assert out.shape == (32, 451)
    want = model.predict(np.asarray(raw))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=5e-3)


def test_fused_emulate_rejects_nonrelu(normalizer):
    with pytest.raises(NotImplementedError):
        make_fused_emulate(
            DirectEmulatorConfig(activation="tanh"), normalizer
        )
