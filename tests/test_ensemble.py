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


def test_parallel_training_matches_sequential(ensemble, splits):
    """fit_scan_stack (one vmapped whole-run program) reproduces the
    sequential per-member fit_scan runs: same histories, same weights."""
    par = DeepEnsemble.train(
        splits,
        n_members=3,
        config=DirectEmulatorConfig(hidden_dims=(32, 48)),
        train_config=TrainConfig(epochs=8, early_stop_patience=None),
        parallel=True,
    )
    for mp, ms in zip(par.members, ensemble.members):
        np.testing.assert_allclose(mp.history.loss, ms.history.loss,
                                   rtol=1e-5)
        np.testing.assert_allclose(mp.history.val_loss, ms.history.val_loss,
                                   rtol=1e-5)
        for lp, ls in zip(mp.params, ms.params):
            np.testing.assert_allclose(np.asarray(lp["w"]),
                                       np.asarray(ls["w"]),
                                       rtol=1e-5, atol=1e-6)


def test_parallel_training_per_member_early_stop(splits):
    """Under vmap each member's EarlyStopping/plateau state machine runs
    independently (masking-based): stop epochs and restored-best weights
    match the sequential runs member by member."""
    cfg = DirectEmulatorConfig(hidden_dims=(24,))
    tc = TrainConfig(epochs=20, early_stop_patience=2,
                     early_stop_min_delta=1e-3, plateau_patience=1,
                     plateau_factor=0.5)
    seq = DeepEnsemble.train(splits, n_members=2, config=cfg,
                             train_config=tc, seeds=[3, 11])
    par = DeepEnsemble.train(splits, n_members=2, config=cfg,
                             train_config=tc, seeds=[3, 11], parallel=True)
    for mp, ms in zip(par.members, seq.members):
        assert mp.history.stopped_epoch == ms.history.stopped_epoch
        assert mp.history.best_epoch == ms.history.best_epoch
        np.testing.assert_allclose(mp.history.lr, ms.history.lr, rtol=1e-6)
        for lp, ls in zip(mp.params, ms.params):
            np.testing.assert_allclose(np.asarray(lp["b"]),
                                       np.asarray(ls["b"]),
                                       rtol=1e-5, atol=1e-6)


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


# -- inference stack: mixture likelihood, sampling, evidence, serving ------


@pytest.fixture(scope="module")
def obs(ensemble, splits):
    sig = ensemble.predict(splits.par_test[0])
    return np.asarray(
        sig + np.random.default_rng(7).normal(0, 5.0, sig.shape), np.float32
    )


def test_mixture_loglik_is_logmeanexp(ensemble, splits, obs):
    """Mixture logL == logsumexp of member logLs − log M, member logLs
    taken from each member's OWN loglik_fn at the same tier."""
    import jax

    raw = splits.par_test[:9]
    mix = ensemble.loglik_fn(obs, 25.0, method="direct",
                             precision="highest")
    got = np.asarray(mix(ensemble.stacked_params, raw))
    member_lls = np.stack([
        np.asarray(
            m.loglik_fn(obs, 25.0, method="direct", precision="highest")(
                m.params, raw
            )
        )
        for m in ensemble.members
    ])
    want = jax.scipy.special.logsumexp(
        member_lls, axis=0
    ) - np.log(len(ensemble.members))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-4)


def test_single_member_mixture_degenerates(splits, obs):
    """A 1-member ensemble's mixture logL is exactly that member's logL."""
    m = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(32,)))
    ens = DeepEnsemble([m])
    raw = splits.par_test[:5]
    got = np.asarray(
        ens.loglik_fn(obs, 25.0, precision="highest")(ens.stacked_params, raw)
    )
    want = np.asarray(
        m.loglik_fn(obs, 25.0, precision="highest")(m.params, raw)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_mixture_valgrad_matches_autodiff(ensemble, splits, obs):
    """The softmax-weighted member-gradient combination == autodiff of
    the mixture log-likelihood itself."""
    import jax
    import jax.numpy as jnp

    raw = jnp.asarray(splits.par_test[:6], jnp.float32)
    mix = ensemble.loglik_fn(obs, 25.0, method="direct",
                             precision="highest")
    vg = ensemble.loglik_and_grad_fn(
        obs, 25.0, method="direct", precision="highest",
        grad_precision="highest",
    )
    got_val, got_grad = vg(ensemble.stacked_params, raw)
    auto_val, auto_grad = jax.vmap(
        jax.value_and_grad(
            lambda row: mix(ensemble.stacked_params, row[None])[0]
        )
    )(raw)
    np.testing.assert_allclose(np.asarray(got_val), np.asarray(auto_val),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(auto_grad),
                               rtol=2e-3, atol=2e-3)


def test_ensemble_sampling_and_fit(ensemble, obs):
    """MH + HMC chains and the ML fit run end-to-end on the mixture."""
    res = ensemble.sample_posterior(
        obs, 25.0, sampler="mh", n_walkers=32, n_steps=20, n_warmup=10,
        thin=5, seed=0,
    )
    assert res.final.shape == (32, 7) and np.isfinite(res.logp).all()
    res = ensemble.sample_posterior(
        obs, 25.0, sampler="hmc", n_walkers=16, n_steps=8, n_warmup=4,
        n_leapfrog=3, thin=2, seed=0,
    )
    assert res.final.shape == (16, 7) and np.isfinite(res.logp).all()
    fit = ensemble.fit_params(obs, 25.0, n_starts=32, n_steps=20, seed=0)
    assert fit.params.shape == (32, 7) and np.isfinite(fit.best).all()


def test_ensemble_evidence_smoke(ensemble, obs):
    res = ensemble.log_evidence(
        obs, 25.0, n_live=64, n_mh=8, max_iters=192, seed=0,
    )
    assert np.isfinite(res.logz)


def test_predict_fn_is_ensemble_mean(ensemble, splits):
    fn = ensemble.predict_fn()
    raw = splits.par_test[:4]
    got = np.asarray(fn(ensemble.params, raw))
    np.testing.assert_allclose(got, ensemble.predict(raw), atol=1e-5)


def test_load_model_dispatches_directory(ensemble, splits, tmp_path):
    from tpu21cmvae.models import load_model

    ensemble.save(str(tmp_path))
    back = load_model(str(tmp_path), splits)
    assert isinstance(back, DeepEnsemble)
    np.testing.assert_allclose(
        back.predict(splits.par_test[:3]),
        ensemble.predict(splits.par_test[:3]),
        atol=1e-6,
    )


def test_ensemble_serves(ensemble, splits, obs):
    """EmulatorService works on an ensemble unmodified: /predict is the
    ensemble mean, /loglik the member mixture."""
    from tpu21cmvae.serve import EmulatorService

    svc = EmulatorService(ensemble)
    raw = splits.par_test[:8]
    np.testing.assert_allclose(
        svc.predict(raw), ensemble.predict(raw), atol=1e-4, rtol=1e-4
    )
    mix = ensemble.loglik_fn(obs, 25.0)
    np.testing.assert_allclose(
        svc.loglik(raw, obs, 25.0),
        np.asarray(mix(ensemble.stacked_params, raw)),
        rtol=1e-4, atol=1e-3,
    )


def test_posterior_predictive_mixture_widens(ensemble, splits):
    """The ensemble's mixture predictive pools member predictions, so
    its per-bin spread is at least any single member's (same samples);
    the model-level method on a single member also round-trips."""
    samples = np.asarray(splits.par_test[:32], np.float32)
    band_e = ensemble.posterior_predictive(samples)
    bands_m = [m.posterior_predictive(samples) for m in ensemble.members]
    assert band_e.bands.shape == bands_m[0].bands.shape == (3, 451)
    # law of total variance: pooled var = mean member var + between-
    # member disagreement, so it dominates the AVERAGE member variance
    mean_var = np.mean([b.std**2 for b in bands_m], axis=0)
    assert (band_e.std**2 >= mean_var - 1e-6).all()
    assert np.isfinite(band_e.bands).all()
