import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.ops.mlp import (
    count_params,
    init_mlp,
    mlp_apply,
    mlp_sizes,
)
from tpu21cmvae.utils.config import DirectEmulatorConfig


def _numpy_forward(params, x, relu_hidden=True):
    """Independent NumPy forward pass for parity checks."""
    h = np.asarray(x, dtype=np.float64)
    for i, layer in enumerate(params):
        h = h @ np.asarray(layer["w"], dtype=np.float64) + np.asarray(
            layer["b"], dtype=np.float64
        )
        if relu_hidden and i < len(params) - 1:
            h = np.maximum(h, 0.0)
    return h


def test_shapes_and_param_count():
    # flagship architecture: 371,907 params (reference
    # sample_notebook.ipynb cell 3 output; emulator.py:196)
    cfg = DirectEmulatorConfig()
    params = init_mlp(jax.random.key(0), cfg.mlp().sizes)
    assert mlp_sizes(params) == (7, 288, 352, 288, 224, 451)
    assert count_params(params) == 371907
    assert cfg.mlp().weight_count == 371907


def test_forward_parity_with_numpy():
    params = init_mlp(jax.random.key(1), (7, 32, 16, 451))
    x = jax.random.normal(jax.random.key(2), (10, 7))
    got = np.asarray(mlp_apply(params, x))
    expected = _numpy_forward(params, np.asarray(x))
    assert np.allclose(got, expected, atol=1e-4)


def test_final_layer_is_linear():
    # output layer has no activation (reference emulator.py:45-46) —
    # with zero hidden layers the MLP is exactly affine.
    params = init_mlp(jax.random.key(3), (7, 451))
    x = jnp.ones((3, 7)) * -100.0  # would be zeroed by a ReLU output
    out = mlp_apply(params, x)
    assert np.any(np.asarray(out) < 0)


def test_glorot_limits():
    params = init_mlp(jax.random.key(4), (100, 200))
    w = np.asarray(params[0]["w"])
    limit = np.sqrt(6.0 / 300.0)
    assert w.min() >= -limit and w.max() <= limit
    # uniform(-l, l) has std l/sqrt(3)
    assert np.isclose(w.std(), limit / np.sqrt(3), rtol=0.1)
    assert np.allclose(np.asarray(params[0]["b"]), 0.0)


def test_bad_activation_raises():
    params = init_mlp(jax.random.key(5), (4, 8, 2))
    with pytest.raises(ValueError):
        mlp_apply(params, jnp.ones((1, 4)), activation="not_a_thing")


def test_grad_flows():
    params = init_mlp(jax.random.key(6), (7, 16, 451))
    x = jnp.ones((4, 7))

    def loss(p):
        return jnp.mean(mlp_apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g["w"]).max()) for g in grads]
    assert all(n > 0 for n in norms)


def test_adam_matches_keras_reference():
    """Our Adam reproduces the TF/Keras update rule exactly: lr_t =
    lr*sqrt(1-b2^t)/(1-b1^t), p -= lr_t * m / (sqrt(v) + eps) — epsilon
    OUTSIDE the bias-corrected sqrt (optax puts it inside v_hat). Ten
    steps against an independent float64 NumPy implementation."""
    import jax
    import jax.numpy as jnp

    from tpu21cmvae.train.adam import adam_init, adam_update

    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    state = adam_init(params)
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-7

    ref_p = p0.astype(np.float64)
    ref_m = np.zeros_like(ref_p)
    ref_v = np.zeros_like(ref_p)
    for step in range(1, 11):
        g = rng.standard_normal(ref_p.shape).astype(np.float32)
        params, state = adam_update(
            {"w": jnp.asarray(g)}, params, state, jnp.float32(lr),
            beta_1=b1, beta_2=b2, epsilon=eps,
        )
        g64 = g.astype(np.float64)
        ref_m = b1 * ref_m + (1 - b1) * g64
        ref_v = b2 * ref_v + (1 - b2) * g64 * g64
        lr_t = lr * np.sqrt(1 - b2**step) / (1 - b1**step)
        ref_p = ref_p - lr_t * ref_m / (np.sqrt(ref_v) + eps)
    np.testing.assert_allclose(np.asarray(params["w"]), ref_p, rtol=1e-4, atol=1e-6)
    assert int(state.step) == 10


def test_per_layer_precision_hook():
    """`precision` accepts one entry per layer (the mixed-tier hook —
    measured a dead end for the flagship, docs/PERF.md, but kept for
    families with different sensitivity profiles): a uniform tuple
    matches the scalar spelling exactly, and a wrong-length tuple is
    refused with the expected count in the message."""
    rng = np.random.default_rng(0)
    params = init_mlp(jax.random.key(0), (7, 16, 12, 9))
    x = jnp.asarray(rng.uniform(-1, 1, (32, 7)).astype(np.float32))
    hi = jax.lax.Precision.HIGHEST
    uniform = mlp_apply(params, x, precision=hi)
    tupled = mlp_apply(params, x, precision=(hi, hi, hi))
    np.testing.assert_array_equal(np.asarray(uniform), np.asarray(tupled))
    with pytest.raises(ValueError, match="3 entries"):
        mlp_apply(params, x, precision=(hi, hi))
