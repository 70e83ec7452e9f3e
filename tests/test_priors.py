"""Informative priors across the inference stack: density view for the
chain samplers / fitter / PT ladder, unit-cube transform view for nested
sampling. All checks are against analytic conjugate-Gaussian results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.priors import GaussianBoxPrior

# a 3-parameter box wide enough that truncation is negligible
MU_L = np.array([0.5, -1.0, 2.0])
SIG_L = np.array([0.4, 0.3, 0.5])
MU_P = np.array([0.0, -0.5, 2.5])
SIG_P = np.array([0.5, 0.4, 0.3])
BOUNDS = np.stack([MU_P - 12 * SIG_P, MU_P + 12 * SIG_P], axis=1)

# conjugate product: N(x|mu_l,s_l^2)·N(x|mu_p,s_p^2) ∝ N(x|mu_c,s_c^2)
VAR_C = 1.0 / (1.0 / SIG_L**2 + 1.0 / SIG_P**2)
MU_C = VAR_C * (MU_L / SIG_L**2 + MU_P / SIG_P**2)
SIG_C = np.sqrt(VAR_C)
# evidence of the normalized-likelihood × normalized-prior product:
# log Z = sum_j log N(mu_l_j | mu_p_j, s_l_j^2 + s_p_j^2)
LOGZ = float(
    np.sum(
        -0.5 * np.log(2 * np.pi * (SIG_L**2 + SIG_P**2))
        - 0.5 * (MU_L - MU_P) ** 2 / (SIG_L**2 + SIG_P**2)
    )
)


def normalized_loglik(params, x):
    """A NORMALIZED Gaussian 'likelihood' density in the parameters."""
    z = (jnp.asarray(x) - MU_L) / SIG_L
    return -0.5 * jnp.sum(z**2, axis=-1) - float(
        0.5 * np.log(2 * np.pi * SIG_L**2).sum()
    )


def valgrad(params, x):
    x = jnp.asarray(x)
    z = (x - MU_L) / SIG_L
    ll = -0.5 * jnp.sum(z**2, axis=-1)
    return ll, -(z / SIG_L).astype(x.dtype)


@pytest.fixture(scope="module")
def prior():
    return GaussianBoxPrior.build(MU_P, SIG_P, bounds=BOUNDS)


def test_log_prior_density_and_flat_dims(prior):
    x = np.random.default_rng(0).normal(0.0, 1.0, (16, 3)).astype(np.float32)
    got = np.asarray(prior.log_prior(x))
    want = (-0.5 * ((x - MU_P) / SIG_P) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # sigma=None dims contribute nothing
    mixed = GaussianBoxPrior.build(
        [MU_P[0], None, None], [SIG_P[0], None, None], bounds=BOUNDS
    )
    got = np.asarray(mixed.log_prior(x))
    want = -0.5 * ((x[:, 0] - MU_P[0]) / SIG_P[0]) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # all-flat prior is exactly zero
    flat = GaussianBoxPrior.build([None] * 3, [None] * 3, bounds=BOUNDS)
    assert np.all(np.asarray(flat.log_prior(x)) == 0.0)


def test_for_params_and_validation():
    p = GaussianBoxPrior.for_params({1: (0.054, 0.006)}, n_params=7)
    assert np.isfinite(p.sigma[1]) and not np.isfinite(p.sigma[0])
    with pytest.raises(ValueError, match="length"):
        GaussianBoxPrior.build([0.0], [1.0], bounds=BOUNDS)
    with pytest.raises(ValueError, match="positive"):
        GaussianBoxPrior.build(MU_P, [-1.0, 1.0, 1.0], bounds=BOUNDS)
    with pytest.raises(ValueError, match="finite mean"):
        GaussianBoxPrior.build([None, -0.5, 2.5], SIG_P, bounds=BOUNDS)


def test_prior_transform_gives_prior_samples(prior):
    """Uniform u through the transform reproduces the (truncated)
    Gaussian prior's moments; flat dims map affinely to the box."""
    key = jax.random.key(1)
    u = jax.random.uniform(key, (200_000, 3))
    x = np.asarray(prior.prior_transform(u))
    np.testing.assert_allclose(
        (x.mean(0) - MU_P) / SIG_P, np.zeros(3), atol=4 / np.sqrt(200_000)
    )
    np.testing.assert_allclose(x.std(0), SIG_P, rtol=0.02)
    assert (x >= BOUNDS[:, 0]).all() and (x <= BOUNDS[:, 1]).all()
    mixed = GaussianBoxPrior.build(
        [None, -0.5, None], [None, 0.4, None], bounds=BOUNDS
    )
    xm = np.asarray(mixed.prior_transform(u))
    # flat dims: affine map of u
    lo, hi = BOUNDS[0, 0], BOUNDS[0, 1]
    np.testing.assert_allclose(
        xm[:, 0], lo + (hi - lo) * np.asarray(u)[:, 0], rtol=1e-5, atol=1e-4
    )


def test_mh_targets_likelihood_times_prior(prior):
    from tpu21cmvae.sampling import sample_mh

    res = sample_mh(
        normalized_loglik, None, n_walkers=256, n_steps=500, n_warmup=300,
        thin=5, bounds=BOUNDS, seed=0, log_prior=prior.log_prior,
    )
    flat = res.flat
    assert np.allclose(flat.mean(0), MU_C, atol=5 * SIG_C / np.sqrt(500))
    assert np.allclose(flat.std(0), SIG_C, rtol=0.12)


def test_stretch_targets_likelihood_times_prior(prior):
    from tpu21cmvae.sampling import sample_ensemble

    res = sample_ensemble(
        normalized_loglik, None, n_walkers=256, n_steps=600, n_warmup=300,
        thin=5, bounds=BOUNDS, seed=1, log_prior=prior.log_prior,
    )
    flat = res.flat
    assert np.allclose(flat.mean(0), MU_C, atol=5 * SIG_C / np.sqrt(500))
    assert np.allclose(flat.std(0), SIG_C, rtol=0.12)


def test_hmc_targets_likelihood_times_prior(prior):
    from tpu21cmvae.sampling import sample_hmc

    res = sample_hmc(
        valgrad, None, n_walkers=256, n_steps=300, n_warmup=150,
        n_leapfrog=6, thin=5, bounds=BOUNDS, seed=2,
        log_prior=prior.log_prior,
    )
    flat = res.flat
    assert np.allclose(flat.mean(0), MU_C, atol=5 * SIG_C / np.sqrt(300))
    assert np.allclose(flat.std(0), SIG_C, rtol=0.12)


def test_fit_map_finds_the_map(prior):
    from tpu21cmvae.sampling import fit_map

    res = fit_map(
        valgrad, None, n_starts=64, n_steps=200, bounds=BOUNDS, seed=3,
        log_prior=prior.log_prior,
    )
    np.testing.assert_allclose(res.best, MU_C, atol=0.02)
    # without the prior the optimum is the bare-likelihood mode
    res0 = fit_map(valgrad, None, n_starts=64, n_steps=200, bounds=BOUNDS,
                   seed=3)
    np.testing.assert_allclose(res0.best, MU_L, atol=0.02)


def test_nested_evidence_under_gaussian_prior(prior):
    from tpu21cmvae.nested import nested_sampling

    res = nested_sampling(
        normalized_loglik, None, n_live=512, n_mh=16, bounds=BOUNDS,
        seed=0, prior_transform=prior.prior_transform,
    )
    assert abs(res.logz - LOGZ) < max(0.3, 3 * res.logz_err)
    # posterior samples come back in RAW units with conjugate moments
    post = res.posterior(20000, seed=1)
    np.testing.assert_allclose(post.mean(0), MU_C, atol=0.1)
    np.testing.assert_allclose(post.std(0), SIG_C, rtol=0.15)


def test_ladder_evidence_under_gaussian_prior(prior):
    from tpu21cmvae.sampling import log_evidence

    res = log_evidence(
        normalized_loglik, None, n_rungs=24, n_walkers=256, n_steps=400,
        n_warmup=200, bounds=BOUNDS, seed=0, log_prior=prior.log_prior,
    )
    assert abs(res.logz - LOGZ) < max(0.5, 4 * res.logz_err)


def test_smc_evidence_under_gaussian_prior(prior):
    """SMC with an external prior: the uncredited box→prior conversion
    stage plus the tempered anneal must reproduce the analytic
    conjugate evidence AND the conjugate posterior moments."""
    from tpu21cmvae.sampling import sample_smc

    res = sample_smc(
        normalized_loglik, None, n_particles=2048, bounds=BOUNDS,
        seed=0, log_prior=prior.log_prior,
    )
    assert abs(res.logz - LOGZ) < max(0.3, 4 * res.logz_err)
    assert np.allclose(res.final.mean(0), MU_C, atol=0.05)
    assert np.allclose(res.final.std(0), SIG_C, rtol=0.15)


def test_model_level_prior_passthrough(splits):
    """log_prior flows through sample_posterior/fit_params on a real
    emulator (smoke + the prior visibly shifts the fit)."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    em = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(32,)))
    obs = em.predict(splits.par_test[0])
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1)
    mid = 0.5 * (lo + hi)
    tight = GaussianBoxPrior.for_params(
        {3: (mid[3], 1e-4 * (hi[3] - lo[3]))}, n_params=7, bounds=bounds
    )
    res = em.sample_posterior(
        obs, 25.0, sampler="mh", bounds=bounds, n_walkers=64, n_steps=40,
        n_warmup=40, thin=5, seed=0, log_prior=tight.log_prior,
    )
    # the essentially-delta prior pins parameter 3 at its center
    assert abs(res.flat[:, 3].mean() - mid[3]) < 0.02 * (hi[3] - lo[3])
    fit = em.fit_params(
        obs, 25.0, bounds=bounds, n_starts=32, n_steps=60, seed=0,
        log_prior=tight.log_prior,
    )
    assert abs(fit.best[3] - mid[3]) < 0.02 * (hi[3] - lo[3])


def test_reweight_matches_analytic_conjugate():
    """Importance reweighting a flat-prior chain to a Gaussian prior
    reproduces the analytic conjugate posterior (the same contract the
    direct log_prior= sampling path is tested against), and the Kish
    ESS honestly collapses when the new prior excludes the cloud."""
    import jax.numpy as jnp

    from tpu21cmvae.priors import GaussianBoxPrior
    from tpu21cmvae.sampling import reweight, sample_mh

    bounds = np.array([[-6.0, 6.0]] * 2)
    sig_l = 0.8

    def loglik(params, x):
        return -0.5 * jnp.sum((jnp.asarray(x) / sig_l) ** 2, axis=-1)

    res = sample_mh(loglik, None, n_walkers=512, n_steps=400,
                    n_warmup=200, thin=5, bounds=bounds, seed=0)
    prior = GaussianBoxPrior.for_params(
        {0: (1.0, 0.5)}, n_params=2, bounds=bounds
    )
    wp = reweight(res, prior.log_prior)
    # conjugate: posterior on dim 0 = N(mu*, s*) with
    # 1/s*^2 = 1/sig_l^2 + 1/0.5^2, mu* = s*^2 * (1.0/0.5^2)
    s2 = 1.0 / (1.0 / sig_l**2 + 1.0 / 0.25)
    mu = s2 * (1.0 / 0.25)
    assert wp.ess() > 1000
    assert abs(wp.mean()[0] - mu) < 0.05
    assert abs(wp.std()[0] - np.sqrt(s2)) < 0.05
    # dim 1 untouched by the prior
    assert abs(wp.mean()[1]) < 0.05
    # weighted median ≈ weighted mean for a symmetric posterior
    assert abs(wp.quantile(0.5)[0] - wp.mean()[0]) < 0.05
    draws = wp.resample(4000, seed=1)
    assert abs(draws[:, 0].mean() - mu) < 0.08
    # a prior far outside the cloud collapses the ESS
    far = GaussianBoxPrior.for_params(
        {0: (5.5, 0.01)}, n_params=2, bounds=bounds
    )
    assert reweight(res, far.log_prior).ess() < 50
