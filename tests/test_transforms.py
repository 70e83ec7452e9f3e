import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.ops.transforms import (
    Normalizer,
    par_transform,
    preproc,
    unpreproc,
)


def _reference_par_transform(parameters, params_train):
    """Independent NumPy re-derivation of the reference's par_transform
    semantics (reference preprocess.py:49-110) for parity checking."""
    parameters = np.atleast_2d(np.asarray(parameters, dtype=np.float64))

    def logcols(p):
        out = p.astype(np.float64).copy()
        fx = out[:, 2].copy()
        fx[fx == 0] = 1e-6
        out[:, 0] = np.log10(out[:, 0])
        out[:, 1] = np.log10(out[:, 1])
        out[:, 2] = np.log10(fx)
        return out

    q = logcols(parameters)
    qt = logcols(np.asarray(params_train, dtype=np.float64))
    mx, mn = qt.max(axis=0), qt.min(axis=0)
    return 2 * (q - mn) / (mx - mn) - 1


def test_preproc_zero_mean(splits, normalizer):
    # mirrors reference tests/test_preprocess.py:12-18
    proc = np.asarray(preproc(jnp.asarray(splits.signal_train), normalizer))
    assert np.allclose(proc.mean(axis=0), 0.0, atol=1e-3)
    unproc = np.asarray(unpreproc(jnp.asarray(proc), normalizer))
    assert np.allclose(unproc, splits.signal_train, atol=5e-4)


def test_preproc_matches_numpy_semantics(splits, normalizer):
    sig = splits.signal_val
    expected = (sig - splits.signal_train.mean(axis=0)) / splits.signal_train.std()
    got = np.asarray(preproc(jnp.asarray(sig, dtype=jnp.float32), normalizer))
    assert np.allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_par_transform_training_set_maps_to_unit_box(splits, normalizer):
    # mirrors reference tests/test_preprocess.py:21-26
    t = np.asarray(par_transform(jnp.asarray(splits.par_train), normalizer))
    assert np.allclose(t.max(axis=0), 1.0, atol=1e-5)
    assert np.allclose(t.min(axis=0), -1.0, atol=1e-5)


def test_par_transform_parity_with_reference_semantics(splits, normalizer):
    got = np.asarray(par_transform(jnp.asarray(splits.par_val), normalizer))
    expected = _reference_par_transform(splits.par_val, splits.par_train)
    assert np.allclose(got, expected, atol=1e-4)


def test_par_transform_fx_zero_clamp(splits, normalizer):
    pars = splits.par_val[:4].copy()
    pars[:, 2] = 0.0
    got = np.asarray(par_transform(jnp.asarray(pars), normalizer))
    expected = _reference_par_transform(pars, splits.par_train)
    assert np.all(np.isfinite(got))
    assert np.allclose(got, expected, atol=1e-4)


def test_par_transform_1d_input_promoted(splits, normalizer):
    row = jnp.asarray(splits.par_val[0])
    out = par_transform(row, normalizer)
    assert out.shape == (1, 7)


def test_normalizer_is_pytree(normalizer):
    leaves = jax.tree_util.tree_leaves(normalizer)
    assert len(leaves) == 4
    rebuilt = jax.tree_util.tree_map(lambda x: x, normalizer)
    assert isinstance(rebuilt, Normalizer)


def test_transforms_jit_and_vmap(splits, normalizer):
    f = jax.jit(lambda p: par_transform(p, normalizer))
    batch = jnp.asarray(splits.par_val[:8])
    assert np.allclose(f(batch), par_transform(batch, normalizer), atol=1e-6)
    g = jax.jit(lambda s: unpreproc(preproc(s, normalizer), normalizer))
    sig = jnp.asarray(splits.signal_val[:8], dtype=jnp.float32)
    assert np.allclose(g(sig), sig, atol=1e-3)
