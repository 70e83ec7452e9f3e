import numpy as np
import pytest

from tpu21cmvae.utils.frequency import default_frequencies
from tpu21cmvae.utils.metrics import error


def test_zero_error_on_identical(splits):
    # mirrors reference tests/test_emulator.py:42-47
    s = splits.signal_train
    assert np.allclose(error(s, s), np.zeros(len(s)))


def test_absolute_vs_relative(rng):
    true = rng.normal(size=(4, 451)) * 50
    pred = true + 1.0  # constant offset → RMSE exactly 1 mK
    assert np.allclose(error(true, pred, relative=False), 1.0)
    rel = error(true, pred, relative=True)
    amp = np.max(np.abs(true), axis=1)
    assert np.allclose(rel, 100.0 / amp)


def test_single_signal_squeeze(rng):
    true = rng.normal(size=451)
    pred = true + 0.5
    e = error(true, pred, relative=False)
    assert np.ndim(e) == 0
    assert np.isclose(e, 0.5)


def test_band_selection(rng):
    nu = default_frequencies()
    true = rng.normal(size=(3, 451))
    pred = true.copy()
    # corrupt only bins outside [50, 100] MHz
    out_band = (nu < 50) | (nu > 100)
    pred[:, out_band] += 10.0
    assert np.allclose(
        error(true, pred, relative=False, nu_arr=nu, flow=50, fhigh=100), 0.0
    )
    # single-sided bands keep the row shape (reference emulator.py:180-182
    # shape-warps here)
    e = error(true, pred, relative=False, nu_arr=nu, flow=50)
    assert e.shape == (3,)


def test_flow_zero_is_valid_bound(rng):
    # the reference's truthiness test ignores flow=0 (emulator.py:168,177)
    nu = default_frequencies()
    true = rng.normal(size=(2, 451))
    pred = true + 1.0
    e_all = error(true, pred, relative=False, nu_arr=nu, flow=0.0)
    assert np.allclose(e_all, 1.0)


def test_band_without_nu_raises():
    x = np.zeros((2, 451))
    with pytest.raises(ValueError):
        error(x, x, flow=50.0)


def test_error_jnp_matches_host_version():
    import jax
    import jax.numpy as jnp

    from tpu21cmvae.utils.metrics import band_mask, error, error_jnp
    from tpu21cmvae.utils.frequency import default_frequencies

    rng = np.random.default_rng(5)
    true = rng.normal(0, 50, (12, 451))
    pred = true + rng.normal(0, 1, (12, 451))
    nu = default_frequencies()

    for relative in (True, False):
        host = error(true, pred, relative=relative)
        dev = np.asarray(jax.jit(
            lambda t, p: error_jnp(t, p, relative=relative)
        )(jnp.asarray(true), jnp.asarray(pred)))
        np.testing.assert_allclose(dev, host, rtol=1e-5)

    mask = band_mask(nu, flow=50.0, fhigh=100.0)
    host = error(true, pred, relative=True, nu_arr=nu, flow=50.0, fhigh=100.0)
    dev = np.asarray(error_jnp(jnp.asarray(true), jnp.asarray(pred), mask=mask))
    np.testing.assert_allclose(dev, host, rtol=1e-5)

    # flow=0 is a valid bound in both versions (reference quirk fixed)
    m0 = band_mask(nu, flow=0.0)
    assert m0.all()
