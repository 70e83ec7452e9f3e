import numpy as np

from tpu21cmvae.data import DataSplits, synthetic_dataset
from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_signals


def test_shapes_and_determinism():
    d1 = synthetic_dataset(n_train=64, n_val=16, n_test=8, seed=3)
    d2 = synthetic_dataset(n_train=64, n_val=16, n_test=8, seed=3)
    assert isinstance(d1, DataSplits)
    assert d1.par_train.shape == (64, 7)
    assert d1.signal_train.shape == (64, 451)
    assert d1.signal_test.shape == (8, 451)
    assert d1.n_params == 7 and d1.n_bins == 451
    assert np.array_equal(d1.signal_train, d2.signal_train)
    d3 = synthetic_dataset(n_train=64, n_val=16, n_test=8, seed=4)
    assert not np.array_equal(d3.signal_train, d1.signal_train)


def test_params_in_prior_ranges(splits):
    pars = splits.par_train
    nonzero_fx = pars[pars[:, 2] > 0]
    assert (pars[:, 2] == 0).any(), "dataset must exercise the fx==0 clamp"
    for c in range(7):
        col = (nonzero_fx if c == 2 else pars)[:, c]
        assert col.min() >= PAR_RANGES[c, 0] - 1e-12
        assert col.max() <= PAR_RANGES[c, 1] + 1e-12


def test_signals_look_like_global_signals(splits):
    sig = splits.signal_train
    assert np.all(np.isfinite(sig))
    # absorption-dominated: most curves dip well below zero
    assert (sig.min(axis=1) < -20).mean() > 0.5
    # amplitudes in a plausible mK range
    assert np.abs(sig).max() < 400


def test_signals_depend_on_each_parameter(splits):
    base = splits.par_train[0].copy()
    base[2] = 1.0  # nonzero fx so perturbations matter
    s0 = synthetic_signals(base[None])
    for c in range(7):
        p = base.copy()
        lo, hi = PAR_RANGES[c]
        p[c] = hi if abs(base[c] - hi) > abs(base[c] - lo) else lo
        s1 = synthetic_signals(p[None])
        assert np.abs(s1 - s0).max() > 1e-3, f"param {c} has no effect"
