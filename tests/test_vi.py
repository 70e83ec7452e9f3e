"""ADVI (tpu21cmvae/vi.py): full-rank Gaussian variational posteriors.

Statistical exactness is pinned on analytic targets where the true
posterior IS Gaussian (ADVI must recover it, correlations included);
the model-level path is smoke-checked against the MCMC stack on a real
emulator likelihood.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.utils.config import DirectEmulatorConfig
from tpu21cmvae.vi import fit_advi


def test_advi_recovers_diagonal_gaussian():
    mu = np.array([0.5, -1.0, 2.0], np.float32)
    sig = np.array([0.4, 0.7, 0.2], np.float32)
    bounds = np.array([[-4.0, 4.0], [-5.0, 5.0], [0.0, 4.0]])

    def valgrad(params, x):
        z = (jnp.asarray(x) - mu) / sig
        return -0.5 * jnp.sum(z * z, axis=-1), -z / sig

    res = fit_advi(valgrad, None, bounds=bounds, n_steps=600, n_mc=256,
                   seed=0)
    np.testing.assert_allclose(res.mean(), mu, atol=0.03)
    np.testing.assert_allclose(res.std(), sig, rtol=0.08)
    # converged: the ELBO tail is flat relative to the early transient
    assert res.elbo[-50:].std() < 0.1 * res.elbo[:50].std()
    # draws respect the box
    draws = res.sample(10000, seed=1)
    assert (draws >= bounds[:, 0]).all() and (draws <= bounds[:, 1]).all()


def test_advi_full_rank_recovers_correlation():
    """The full-rank factor must capture a strong off-diagonal — a
    mean-field fit would report ~0 correlation here."""
    rho = 0.8
    cov = np.array([[1.0, rho], [rho, 1.0]], np.float32)
    prec = np.linalg.inv(cov).astype(np.float32)
    bounds = np.array([[-6.0, 6.0]] * 2)

    def valgrad(params, x):
        x = jnp.asarray(x)
        return -0.5 * jnp.sum((x @ prec) * x, axis=-1), -(x @ prec)

    res = fit_advi(valgrad, None, bounds=bounds, n_steps=800, n_mc=512,
                   seed=0)
    draws = res.sample(40000, seed=2)
    got = np.corrcoef(draws.T)[0, 1]
    assert abs(got - rho) < 0.05
    np.testing.assert_allclose(draws.std(0), 1.0, rtol=0.1)


def test_advi_with_prior_matches_conjugate():
    """log_prior folds into the target: flat-likelihood x Gaussian
    prior fits the prior itself (conjugate sanity)."""
    from tpu21cmvae.priors import GaussianBoxPrior

    bounds = np.array([[-5.0, 5.0]] * 2)
    prior = GaussianBoxPrior.for_params(
        {0: (1.0, 0.5), 1: (-0.5, 0.3)}, n_params=2, bounds=bounds
    )

    def valgrad(params, x):
        x = jnp.asarray(x)
        return jnp.zeros(x.shape[:-1]), jnp.zeros_like(x)

    res = fit_advi(valgrad, None, bounds=bounds, n_steps=600, n_mc=256,
                   seed=0, log_prior=prior.log_prior)
    np.testing.assert_allclose(res.mean(), [1.0, -0.5], atol=0.03)
    np.testing.assert_allclose(res.std(), [0.5, 0.3], rtol=0.1)


def test_model_level_advi_concentrates(splits):
    """On a real (trained) emulator likelihood, the ADVI posterior
    concentrates at the observation's likelihood level and its draws
    respect the box. (Moment agreement with MCMC is NOT asserted here:
    the raw-space posterior of the log-scaled parameters is strongly
    non-Gaussian, which is exactly the documented reach-for-a-chain
    regime; exactness is pinned by the analytic tests above.)"""
    from tpu21cmvae.utils.config import TrainConfig

    em = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(16,)))
    em.train(train_config=TrainConfig(epochs=20, early_stop_patience=None),
             device_loop=True)
    truth = np.asarray(splits.par_test[0], np.float32)
    obs = em.predict(truth)
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1)
    advi = em.fit_advi(obs, 25.0, bounds=bounds, n_steps=400, n_mc=256,
                       seed=0, x0=truth)
    loglik = em.loglik_fn(obs, 25.0)
    lp_truth = float(np.asarray(loglik(em.params, truth[None, :]))[0])
    draws = advi.sample(256, seed=3)
    lp_draws = np.asarray(loglik(em.params, draws))
    # the fitted cloud sits at the observation's likelihood level, far
    # above prior draws (which sit thousands of nats below)
    assert np.median(lp_draws) > lp_truth - 60.0
    assert (draws >= bounds[:, 0]).all() and (draws <= bounds[:, 1]).all()
    # x0 validation
    with pytest.raises(ValueError, match="x0"):
        em.fit_advi(obs, 25.0, bounds=bounds, n_steps=4,
                    x0=np.zeros((3, 7)))


def test_advi_batch_recovers_independent_rows():
    """Round-5 batched ADVI: two observations' full-rank Gaussians fit
    as one program, each recovering its own analytic posterior; per-row
    results match what sequential fit_advi converges to."""
    from tpu21cmvae.vi import fit_advi, fit_advi_batch

    mus = np.stack([[0.5, -1.0, 2.0], [-0.5, 0.3, 1.0]]).astype(
        np.float32
    )
    sig = np.array([0.3, 0.7, 0.2], np.float32)
    lo, hi = mus.min(0) - 5 * sig, mus.max(0) + 5 * sig
    bounds = np.stack([lo, hi], 1)

    def vg_multi(params, x):
        xr = x.reshape(2, x.shape[0] // 2, 3)
        z = (xr - mus[:, None, :]) / sig
        ll = (-0.5 * jnp.sum(z * z, -1)).reshape(-1)
        g = (-(xr - mus[:, None, :]) / sig**2).reshape(-1, 3)
        return ll, g

    res = fit_advi_batch(vg_multi, None, 2, bounds=bounds,
                         n_steps=400, n_mc=256, seed=0,
                         x0=mus)  # per-row centers accepted
    assert len(res) == 2
    for o in range(2):
        assert np.allclose(res[o].mean(), mus[o], atol=0.1)
        assert np.allclose(res[o].std(), sig, atol=0.2)

    def vg0(params, x):
        z = (x - mus[0]) / sig
        return -0.5 * jnp.sum(z * z, -1), -(x - mus[0]) / sig**2

    seq = fit_advi(vg0, None, bounds=bounds, n_steps=400, n_mc=256,
                   seed=0)
    assert np.allclose(res[0].mean(), seq.mean(), atol=0.1)
    # one cached auto-keyed program serves repeated batch fits
    fit_advi_batch(vg_multi, None, 2, bounds=bounds, n_steps=400,
                   n_mc=256, seed=1)
    assert len(vg_multi._t21_chain_cache) == 1
    # shape guard: wrong x0 row count is refused
    with pytest.raises(ValueError):
        fit_advi_batch(vg_multi, None, 2, bounds=bounds, n_steps=10,
                       n_mc=16, x0=mus[0])
