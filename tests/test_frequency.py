import numpy as np

from tpu21cmvae.utils.frequency import (
    NU_0,
    default_frequencies,
    default_redshifts,
    freq2redshift,
    redshift2freq,
)


def test_z_nu_roundtrip():
    # mirrors reference tests/test_emulator.py:36-39
    z = 30.0
    nu = redshift2freq(z)
    assert np.isclose(z, freq2redshift(nu))


def test_roundtrip_array():
    z = default_redshifts()
    assert np.allclose(freq2redshift(redshift2freq(z)), z)


def test_no_input_mutation():
    # the reference's freq2redshift mutates its input (emulator.py:124);
    # ours must not.
    nu = np.array([50.0, 100.0])
    nu_copy = nu.copy()
    freq2redshift(nu)
    assert np.array_equal(nu, nu_copy)


def test_known_value():
    # z = 0 → the 21-cm rest frequency in MHz
    assert np.isclose(redshift2freq(0.0), NU_0 / 1e6)


def test_default_axes():
    z = default_redshifts()
    assert z.shape == (451,)
    assert z[0] == 5.0 and z[-1] == 50.0
    nu = default_frequencies()
    assert nu.shape == (451,)
    # frequency decreases with redshift
    assert np.all(np.diff(nu) < 0)
