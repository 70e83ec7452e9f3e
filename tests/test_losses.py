import jax.numpy as jnp
import numpy as np

from tpu21cmvae.ops.losses import kl_divergence, mse, relative_mse
from tpu21cmvae.ops.transforms import preproc


def test_relative_mse_matches_reference_semantics(splits, normalizer):
    # mirrors reference tests/test_emulator.py:24-33: loss equals
    # MSE / amplitude^2 with amplitude recomputed independently.
    strain = splits.signal_train
    y_true = np.asarray(preproc(jnp.asarray(strain[:10], jnp.float32), normalizer))
    y_pred = np.asarray(preproc(jnp.asarray(strain[-10:], jnp.float32), normalizer))
    got = np.asarray(
        relative_mse(jnp.asarray(y_true), jnp.asarray(y_pred), normalizer.scaled_mean)
    )
    m = np.mean((y_true - y_pred) ** 2, axis=1)
    amp = np.max(np.abs(strain[:10] / strain.std()), axis=1)
    expected = m / amp**2
    assert got.shape == (10,)
    assert np.allclose(got, expected, rtol=1e-4)


def test_mse_per_sample():
    a = jnp.zeros((5, 451))
    b = jnp.ones((5, 451)) * 2.0
    assert np.allclose(np.asarray(mse(a, b)), 4.0)


def test_kl_zero_at_standard_normal():
    mu = jnp.zeros((3, 9))
    logvar = jnp.zeros((3, 9))
    assert np.allclose(np.asarray(kl_divergence(mu, logvar)), 0.0)


def test_kl_positive_and_grows():
    mu = jnp.ones((1, 9))
    logvar = jnp.zeros((1, 9))
    kl1 = float(kl_divergence(mu, logvar)[0])
    kl2 = float(kl_divergence(2 * mu, logvar)[0])
    assert kl1 > 0 and kl2 > kl1
    # analytic: KL = 0.5 * sum(mu^2) when logvar = 0
    assert np.isclose(kl1, 0.5 * 9.0)


def test_history_as_dict_roundtrips():
    from tpu21cmvae.train.loop import History

    h = History(loss=[1.0, 0.5], val_loss=[0.9, 0.6], lr=[0.01, 0.01],
                epoch_time_s=[0.1, 0.1], stopped_epoch=1, best_epoch=1)
    d = h.as_dict()
    assert d["loss"] == [1.0, 0.5] and d["stopped_epoch"] == 1


def test_keras_h5_loader_rejects_weightless_file(tmp_path):
    import h5py
    import pytest

    from tpu21cmvae.models.io_keras import load_keras_mlp

    path = str(tmp_path / "empty.h5")
    with h5py.File(path, "w") as f:
        f.create_group("model_weights")
    with pytest.raises(ValueError, match="No weight-bearing layers"):
        load_keras_mlp(path)


def test_checkpoint_rejects_future_format(tmp_path):
    import json

    import numpy as np
    import pytest

    from tpu21cmvae.models.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "c.npz")
    save_checkpoint(path, {"a": np.ones(3)})
    # rewrite the header with a bumped version
    data = dict(np.load(path))
    header = json.loads(bytes(data["__header__"]).decode())
    header["format_version"] = 999
    data["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8
    )
    np.savez(path, **data)
    with pytest.raises(ValueError, match="format_version"):
        load_checkpoint(path)
