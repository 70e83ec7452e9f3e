"""Parity: the device-resident trainer (fit_scan) must reproduce the
host-loop trainer (fit) — same shuffles, same Adam, same callback state
machines — so the two are interchangeable."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.ops.losses import relative_mse
from tpu21cmvae.ops.mlp import init_mlp, mlp_apply
from tpu21cmvae.ops.transforms import par_transform, preproc
from tpu21cmvae.train.loop import fit
from tpu21cmvae.train.scan import fit_scan
from tpu21cmvae.utils.config import TrainConfig


def _setup(splits, normalizer):
    params = init_mlp(jax.random.key(0), (7, 24, splits.n_bins))
    sm = normalizer.scaled_mean

    def loss_fn(p, x, y):
        return relative_mse(y, mlp_apply(p, x), sm)

    x = par_transform(jnp.asarray(splits.par_train[:200], jnp.float32), normalizer)
    y = preproc(jnp.asarray(splits.signal_train[:200], jnp.float32), normalizer)
    xv = par_transform(jnp.asarray(splits.par_val[:64], jnp.float32), normalizer)
    yv = preproc(jnp.asarray(splits.signal_val[:64], jnp.float32), normalizer)
    return params, loss_fn, x, y, xv, yv


BASE = TrainConfig(
    epochs=6, batch_size=64, learning_rate=0.003,
    early_stop_patience=None, plateau_patience=None,
)


def _compare(splits, normalizer, cfg, check_lr=True):
    params, loss_fn, x, y, xv, yv = _setup(splits, normalizer)
    pa, _, ha = fit(params, loss_fn, x, y, xv, yv, cfg)
    pb, _, hb = fit_scan(params, loss_fn, x, y, xv, yv, cfg)
    assert len(hb.loss) == len(ha.loss)
    np.testing.assert_allclose(hb.loss, ha.loss, rtol=1e-6)
    np.testing.assert_allclose(hb.val_loss, ha.val_loss, rtol=1e-6)
    if check_lr:
        np.testing.assert_allclose(hb.lr, ha.lr, rtol=1e-6)
    assert hb.stopped_epoch == ha.stopped_epoch
    assert hb.best_epoch == ha.best_epoch
    for la, lb in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(la["w"]), np.asarray(lb["w"]), rtol=1e-6, atol=1e-7
        )
    return ha, hb


def test_scan_matches_fit_plain(splits, normalizer):
    _compare(splits, normalizer, BASE)


def test_scan_matches_fit_with_plateau(splits, normalizer):
    cfg = dataclasses.replace(
        BASE, epochs=8, plateau_patience=2, plateau_factor=0.5,
        plateau_min_delta=10.0, plateau_min_lr=1e-4,
    )
    _compare(splits, normalizer, cfg)


def test_scan_matches_fit_with_early_stop(splits, normalizer):
    cfg = dataclasses.replace(
        BASE, epochs=10, early_stop_patience=2,
        early_stop_min_delta=10.0,  # nothing improves by 10 → stops early
        restore_best_weights=True,
    )
    ha, hb = _compare(splits, normalizer, cfg)
    assert hb.stopped_epoch is not None


def test_scan_matches_fit_full_recipe(splits, normalizer):
    """Both callbacks on, defaults shaped like the published recipe."""
    cfg = dataclasses.replace(
        BASE, epochs=10, learning_rate=0.01,
        early_stop_patience=4, early_stop_min_delta=1e-10,
        plateau_patience=2, plateau_factor=0.95,
        plateau_min_delta=5e-9, plateau_min_lr=1e-4,
    )
    _compare(splits, normalizer, cfg)


def test_scan_stochastic_loss(splits, normalizer):
    """VAE-style stochastic loss path (fresh key per batch)."""
    params, loss_fn, x, y, xv, yv = _setup(splits, normalizer)

    def sto_loss(p, bx, by, key):
        noise = jax.random.normal(key, by.shape, by.dtype) * 1e-6
        return loss_fn(p, bx, by + noise)

    cfg = BASE
    pa, _, ha = fit(params, sto_loss, x, y, xv, yv, cfg, stochastic=True)
    pb, _, hb = fit_scan(params, sto_loss, x, y, xv, yv, cfg, stochastic=True)
    np.testing.assert_allclose(hb.loss, ha.loss, rtol=1e-6)
    np.testing.assert_allclose(hb.val_loss, ha.val_loss, rtol=1e-6)


def test_scan_device_loop_in_model(splits):
    """DirectEmulator.train(device_loop=True) runs the scan trainer."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(16,)))
    cfg = dataclasses.replace(BASE, epochs=3)
    loss, val_loss = model.train(train_config=cfg, device_loop=True)
    assert len(loss) == 3
    assert model.history.epoch_time_s == []  # no per-epoch host timing


def test_ae_vae_device_loop(splits):
    """Both two-stage families train through the scan path."""
    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.models.vae import VAEEmulator
    from tpu21cmvae.utils.config import AutoEncoderConfig, VAEConfig

    cfg = dataclasses.replace(BASE, epochs=2)
    ae = AutoEncoderEmulator(
        splits,
        config=AutoEncoderConfig(
            latent_dim=4, enc_hidden_dims=(16,), dec_hidden_dims=(16,),
            em_hidden_dims=(12,),
        ),
    )
    out = ae.train(ae_train_config=cfg, em_train_config=cfg, device_loop=True)
    assert all(len(h) == 2 for h in out)

    vae = VAEEmulator(
        splits,
        config=VAEConfig(
            latent_dim=4, enc_hidden_dims=(16,), dec_hidden_dims=(16,),
            em_hidden_dims=(12,),
        ),
    )
    out = vae.train(vae_train_config=cfg, em_train_config=cfg, device_loop=True)
    assert all(len(h) == 2 for h in out)


def test_tuner_device_loop(splits):
    from tpu21cmvae.tuner import SearchSpace, tune_direct

    res = tune_direct(
        splits, n_trials=1,
        space=SearchSpace(min_layers=1, max_layers=1, width_choices=(16,)),
        train_config=dataclasses.replace(BASE, epochs=2),
        device_loop=True,
    )
    assert np.isfinite(res.best.val_error)
