"""Deep-ensemble emulation: stacked-vmap parity, uncertainty, I/O."""

import numpy as np
import pytest

from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.models.ensemble import DeepEnsemble
from tpu21cmvae.utils.config import DirectEmulatorConfig, TrainConfig


@pytest.fixture(scope="module")
def ensemble(splits):
    return DeepEnsemble.train(
        splits,
        n_members=3,
        config=DirectEmulatorConfig(hidden_dims=(32, 48)),
        train_config=TrainConfig(epochs=8, early_stop_patience=None),
    )


def test_vmapped_matches_members(ensemble, splits):
    """One stacked-vmap device call == each member's own predict."""
    raw = splits.par_test[:6]
    stacked = ensemble.member_predictions(raw)
    assert stacked.shape == (3, 6, splits.n_bins)
    for i, m in enumerate(ensemble.members):
        np.testing.assert_allclose(stacked[i], m.predict(raw), atol=1e-5)


def test_mean_and_uncertainty(ensemble, splits):
    mean, std = ensemble.predict_with_uncertainty(splits.par_test[:6])
    assert mean.shape == std.shape == (6, splits.n_bins)
    assert (std >= 0).all() and std.max() > 0  # seeds actually disagree
    one_m, one_s = ensemble.predict_with_uncertainty(splits.par_test[0])
    assert one_m.shape == one_s.shape == (splits.n_bins,)
    # ensemble-mean error is a valid metric and members differ from mean
    err = ensemble.test_error()
    assert err.shape == (len(splits.par_test),) and np.isfinite(err).all()


def test_checkpoint_roundtrip(ensemble, splits, tmp_path):
    paths = ensemble.save(str(tmp_path))
    assert len(paths) == 3
    back = DeepEnsemble.load(str(tmp_path), splits)
    np.testing.assert_allclose(
        back.predict(splits.par_test[:4]),
        ensemble.predict(splits.par_test[:4]),
        atol=1e-6,
    )


def test_mismatched_architectures_rejected(splits):
    a = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(32,)))
    b = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(48,)))
    with pytest.raises(ValueError):
        DeepEnsemble([a, b])
    with pytest.raises(ValueError):
        DeepEnsemble([])


def test_mismatched_normalizers_rejected(splits):
    """Members trained against different normalization constants must be
    refused: the vmapped predict closes over member 0's Normalizer, so
    mixing statistics would silently corrupt predictions (regression)."""
    from tpu21cmvae.data import synthetic_dataset

    other = synthetic_dataset(n_train=256, n_val=64, n_test=64, seed=99)
    cfg = DirectEmulatorConfig(hidden_dims=(32,))
    a = DirectEmulator(splits, config=cfg)
    b = DirectEmulator(other, config=cfg)
    with pytest.raises(ValueError, match="normalization constants"):
        DeepEnsemble([a, b])
