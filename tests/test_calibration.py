"""Stacked-observation inference + simulation-based calibration.

The multi-observation likelihood must agree exactly with the single-
observation one per block; batched sampling must reproduce per-
observation posteriors; and SBC over the model's own forward model
must come out calibrated (ranks uniform) — the end-to-end correctness
certificate for the whole sampler+likelihood stack."""

import numpy as np
import pytest

from tpu21cmvae.calibration import _ks_uniform_pvalue, sbc
from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.utils.config import DirectEmulatorConfig


@pytest.fixture(scope="module")
def model(splits):
    return DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(32,))
    )


@pytest.fixture(scope="module")
def bounds(splits):
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    return np.stack([lo, hi], axis=1)


def test_loglik_multi_matches_single(model, splits):
    """Row o·W+w of the stacked likelihood == obs o's single-obs
    likelihood on row w, for both methods."""
    rng = np.random.default_rng(0)
    obs_batch = model.predict(splits.par_test[:3]) + rng.normal(
        0, 3.0, (3, 451)
    )
    raw = np.asarray(splits.par_test[:12], np.float32)  # 3 obs × 4 rows
    for method in ("direct", "gram"):
        multi = model.loglik_multi_fn(obs_batch, 25.0, method=method)
        got = np.asarray(multi(model.params, raw)).reshape(3, 4)
        for o in range(3):
            single = model.loglik_fn(
                obs_batch[o], 25.0, method=method
            )
            want = np.asarray(single(model.params, raw[o * 4:(o + 1) * 4]))
            np.testing.assert_allclose(got[o], want, rtol=1e-5, atol=1e-3)
    # per-bin shared noise accepted; per-obs noise rejected
    model.loglik_multi_fn(obs_batch, np.full(451, 25.0))
    with pytest.raises(ValueError, match="shared"):
        model.loglik_multi_fn(obs_batch, np.full((3, 451), 25.0))
    # non-dividing batches fail loudly
    multi = model.loglik_multi_fn(obs_batch, 25.0)
    with pytest.raises(ValueError, match="divide"):
        multi(model.params, raw[:10])


def test_loglik_and_grad_multi_matches_autodiff(model, splits):
    import jax

    rng = np.random.default_rng(1)
    obs_batch = model.predict(splits.par_test[:2]) + rng.normal(
        0, 3.0, (2, 451)
    )
    raw = np.asarray(splits.par_test[:8], np.float32)
    from tpu21cmvae.ops.loglik import (
        make_loglik_and_grad_multi,
        make_loglik_multi,
    )

    vg = jax.jit(make_loglik_and_grad_multi(
        model.config, model.normalizer, obs_batch, 25.0
    ))
    val, grad = vg(model.params, raw)
    base = jax.jit(make_loglik_multi(
        model.config, model.normalizer, obs_batch, 25.0
    ))
    want = np.asarray(base(model.params, raw))
    np.testing.assert_allclose(np.asarray(val), want, rtol=1e-5, atol=1e-3)
    assert grad.shape == (8, 7)
    assert np.isfinite(np.asarray(grad)).all()


def test_batched_sampling_matches_per_obs(model, splits, bounds):
    """Two stacked observations sample the same posteriors their
    individual runs do (moment agreement), and the result views
    unstack consistently."""
    rng = np.random.default_rng(2)
    truths = np.asarray(splits.par_test[:2], np.float32)
    obs_batch = model.predict(truths) + rng.normal(0, 5.0, (2, 451))
    common = dict(n_steps=200, n_warmup=200, thin=5, bounds=bounds)
    batch = model.sample_posterior_batch(
        obs_batch, 25.0, sampler="mh", n_walkers=128, seed=0, **common
    )
    assert batch.chain.shape[1:] == (2, 128, 7)
    assert batch.walkers_per_obs == 128
    for o in range(2):
        solo = model.sample_posterior(
            obs_batch[o], 25.0, sampler="mh", n_walkers=128, seed=7,
            **common,
        )
        got, want = batch.flat(o), solo.flat
        span = bounds[:, 1] - bounds[:, 0]
        # same posterior, different chains: means agree within a few
        # multiples of the wider per-dim spread
        tol = 4.0 * np.maximum(got.std(0), want.std(0)) / np.sqrt(50)
        assert (np.abs(got.mean(0) - want.mean(0)) < tol + 0.02 * span).all()
        # per_obs view is the same data as flat(o)
        np.testing.assert_array_equal(
            batch.per_obs(o).flat, got
        )
    with pytest.raises(ValueError, match="stretch"):
        model.sample_posterior_batch(obs_batch, 25.0, sampler="ensemble")


def test_batched_hmc_smoke(model, splits, bounds):
    rng = np.random.default_rng(3)
    obs_batch = model.predict(splits.par_test[:2]) + rng.normal(
        0, 5.0, (2, 451)
    )
    batch = model.sample_posterior_batch(
        obs_batch, 25.0, sampler="hmc", n_walkers=32, n_steps=30,
        n_warmup=30, n_leapfrog=4, thin=5, bounds=bounds, seed=0,
    )
    assert batch.chain.shape[1:] == (2, 32, 7)
    assert np.isfinite(batch.result.logp).all()


def test_ks_uniform_pvalue():
    rng = np.random.default_rng(4)
    # uniform sample: large p; shifted sample: tiny p
    assert _ks_uniform_pvalue(rng.uniform(size=500)) > 0.01
    assert _ks_uniform_pvalue(rng.uniform(size=500) ** 3) < 1e-6


def test_sbc_calibrated_on_own_forward_model(model, bounds):
    """The full stack (uniform prior draws → forward model + noise →
    batched MH posteriors → ranks) is calibrated: no parameter's rank
    distribution rejects uniformity."""
    res = sbc(
        model, n_sims=96, n_walkers=64, n_steps=250, n_warmup=400,
        thin=10, noise_var=25.0, bounds=bounds, seed=0,
    )
    assert res.ranks.shape == (96, 7)
    assert (res.ranks >= 0).all() and (res.ranks <= 64).all()
    # with 7 params at alpha=0.005 a calibrated run passes w.p. ~0.97
    assert (res.pvalues > 0.005).all(), res.summary(model.par_labels)
    assert "calibrated" in res.summary(model.par_labels)


def test_two_stage_family_batched_sampling(splits, bounds):
    """The AE family's sample_posterior_batch runs over the generic
    stacked-observation likelihood, and its multi loglik matches the
    single-observation one per block."""
    import jax

    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.ops.loglik import make_loglik_multi_from_predict
    from tpu21cmvae.utils.config import AutoEncoderConfig

    ae = AutoEncoderEmulator(
        splits,
        config=AutoEncoderConfig(
            latent_dim=4, enc_hidden_dims=(16,), dec_hidden_dims=(16,),
            em_hidden_dims=(16,),
        ),
    )
    rng = np.random.default_rng(5)
    obs_batch = np.atleast_2d(ae.predict(splits.par_test[:2])) + rng.normal(
        0, 3.0, (2, 451)
    )
    multi = jax.jit(make_loglik_multi_from_predict(
        ae.predict_fn(), obs_batch, 25.0
    ))
    raw = np.asarray(splits.par_test[:8], np.float32)
    got = np.asarray(multi(ae.params, raw)).reshape(2, 4)
    for o in range(2):
        want = np.asarray(
            ae.loglik_fn(obs_batch[o], 25.0)(ae.params, raw[o * 4:(o + 1) * 4])
        )
        np.testing.assert_allclose(got[o], want, rtol=1e-5, atol=1e-3)
    batch = ae.sample_posterior_batch(
        obs_batch, 25.0, sampler="hmc", n_walkers=16, n_steps=20,
        n_warmup=20, n_leapfrog=4, thin=5, bounds=bounds, seed=0,
    )
    assert batch.chain.shape[1:] == (2, 16, 7)
    assert np.isfinite(batch.result.logp).all()


def test_ensemble_batched_mixture(splits, bounds):
    """The ensemble's batched mixture equals logmeanexp of the members'
    stacked likelihoods, and the batched chain runs."""
    import jax

    from tpu21cmvae.models.ensemble import DeepEnsemble
    from tpu21cmvae.ops.loglik import make_loglik_multi

    members = [
        DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(32,)),
                       seed=s)
        for s in (0, 1)
    ]
    ens = DeepEnsemble(members)
    rng = np.random.default_rng(6)
    obs_batch = np.atleast_2d(ens.predict(splits.par_test[:2])) + rng.normal(
        0, 3.0, (2, 451)
    )
    raw = np.asarray(splits.par_test[:8], np.float32)
    member_ll = jax.jit(make_loglik_multi(
        ens.config, ens.normalizer, obs_batch, 25.0
    ))
    per_member = np.stack([
        np.asarray(member_ll(m.params, raw)) for m in members
    ])
    want = np.log(np.exp(per_member - per_member.max(0)).mean(0)) + \
        per_member.max(0)
    batch = ens.sample_posterior_batch(
        obs_batch, 25.0, sampler="mh", n_walkers=16, n_steps=20,
        n_warmup=20, thin=5, bounds=bounds, seed=0,
    )
    assert batch.chain.shape[1:] == (2, 16, 7)
    # check the mixture values through the builder used by the chain
    got = np.asarray(
        jax.jit(lambda s, r: ens.loglik_fn(obs_batch[0], 25.0)(s, r))(
            ens.stacked_params, raw[:4]
        )
    )
    np.testing.assert_allclose(got, want[:4], rtol=1e-4, atol=1e-2)


def test_sbc_with_informative_prior(model, bounds):
    """Drawing truths from a Gaussian prior AND sampling L·π stays
    calibrated — certifying the prior machinery end to end. (A
    deliberately inconsistent study — prior-drawn truths, flat-prior
    chains — must FAIL the uniformity test on the constrained
    parameter, proving the test has teeth.)"""
    from tpu21cmvae.priors import GaussianBoxPrior

    lo, hi = bounds[:, 0], bounds[:, 1]
    mid = 0.5 * (lo + hi)
    prior = GaussianBoxPrior.for_params(
        {3: (mid[3], 0.05 * (hi[3] - lo[3])),
         4: (mid[4], 0.1 * (hi[4] - lo[4]))},
        n_params=7, bounds=bounds,
    )
    res = sbc(
        model, n_sims=96, n_walkers=64, n_steps=250, n_warmup=400,
        thin=10, noise_var=100.0, bounds=bounds, seed=1, prior=prior,
    )
    assert (res.pvalues > 0.005).all(), res.summary(model.par_labels)
    # truths really came from the prior
    assert abs(res.thetas[:, 3].std() / (0.05 * (hi[3] - lo[3])) - 1) < 0.25
    # teeth check — an INCONSISTENT study must fail: truths from the
    # prior but flat-prior chains, in a near-flat-likelihood regime
    # (huge noise) where the prior dominates the posterior. The chains
    # then sample the whole box while truths cluster at the prior
    # center → under-dispersed ranks → KS rejects on parameter 3.
    incons = sbc(
        model, n_sims=96, n_walkers=64, n_steps=250, n_warmup=400,
        thin=10, noise_var=1e8, bounds=bounds, seed=1, prior=prior,
        log_prior=None,
    )
    assert incons.pvalues[3] < 1e-4, incons.pvalues


def test_sbc_calibrated_under_marginalized_specs(model, bounds):
    """SBC with the composed foreground+level-marginalized likelihood,
    observations drawn from the spec's OWN generative model (per-sim
    foreground injections, per-sim InvGamma level draws): the analytic
    marginalization must come out calibrated end to end — a wrong
    n_eff, prior convention, or folded constant slopes the ranks. Then
    the teeth check: the SAME generative data scored by the plain
    known-level likelihood must FAIL (levels vary, the plain likelihood
    is alternately over- and under-confident -> non-uniform ranks)."""
    from tpu21cmvae.noisescale import marginalize_noise_scale

    nv = np.full(451, 25.0)
    mn = model.marginalize_foreground(nv, n_terms=4)
    # wide proper level prior: E[sigma^2]=2, sd ~ 2 -> strong variation
    smfg = marginalize_noise_scale(mn, alpha=2.5, beta=3.0)
    res = sbc(
        model, n_sims=96, n_walkers=64, n_steps=250, n_warmup=400,
        thin=10, noise_var=smfg, bounds=bounds, seed=2,
    )
    assert (res.pvalues > 0.005).all(), res.summary(model.par_labels)

    # teeth: generate under a scale-marginal model whose levels are
    # DECISIVELY away from 1x (InvGamma(4,12): mean 4, mode 2.4 — the
    # (2.5,3) prior above peaks at 0.86, too close to 1x to detect),
    # score at the FIXED 1x level — systematically overconfident, so
    # truths pile into the rank tails — fg kept marginalized so the
    # failure isolates the LEVEL
    import dataclasses as _dc

    from tpu21cmvae.foregrounds import MarginalizedNoise

    gen = marginalize_noise_scale(mn, alpha=4.0, beta=12.0)

    class _GenerateSmfgScoreMn(MarginalizedNoise):
        """scores as mn (inherited) but GENERATES from gen"""
        def sample_noise(self, rng, n, **kw):
            return gen.sample_noise(rng, n, **kw)

    mismatch = _GenerateSmfgScoreMn(
        **{f.name: getattr(mn, f.name) for f in _dc.fields(mn)}
    )
    incons = sbc(
        model, n_sims=96, n_walkers=64, n_steps=250, n_warmup=400,
        thin=10, noise_var=mismatch, bounds=bounds, seed=2,
    )
    assert (incons.pvalues < 0.005).any(), incons.pvalues


def test_gof_calibrated_and_misfit_teeth(model, splits, bounds):
    """Posterior predictive check: data generated by the model's own
    family passes; an un-modeled foreground drives p -> 0 with the
    bin_z diagnostic localizing it; a 100x over-stated noise drives
    p -> 1 ("residuals implausibly small")."""
    rng = np.random.default_rng(7)
    truth = np.asarray(splits.par_test[0], np.float32)
    clean = np.asarray(model.predict(truth))
    obs = clean + rng.normal(0.0, 5.0, clean.shape)
    common = dict(sampler="mh", n_walkers=256, n_steps=150,
                  n_warmup=300, thin=10, bounds=bounds, seed=0)
    res = model.sample_posterior(obs, 25.0, **common)
    gof = model.goodness_of_fit(obs, 25.0, res)
    assert 0.01 < gof.p_value < 0.99, gof.summary()
    assert gof.dof == clean.shape[0]
    assert abs(float(np.mean(gof.q)) / gof.dof - 1.0) < 0.15
    assert "no evidence" in gof.summary()

    # un-modeled smooth foreground: the 7-parameter signal family
    # cannot absorb it -> tiny p, bin_z blows up
    nu = np.asarray(model.frequencies, np.float64)
    fg = 40.0 * (nu / nu.mean()) ** -2.5
    obs_bad = obs + fg
    res_bad = model.sample_posterior(obs_bad, 25.0, **common)
    bad = model.goodness_of_fit(obs_bad, 25.0, res_bad)
    assert bad.p_value < 0.01, bad.summary()
    assert "MISFIT" in bad.summary()
    assert np.abs(bad.bin_z).max() > 3.0

    # noise over-stated 100x: residuals implausibly small -> p -> 1
    res_over = model.sample_posterior(obs, 2500.0, **common)
    over = model.goodness_of_fit(obs, 2500.0, res_over)
    assert over.p_value > 0.99, over.summary()
    assert "implausibly small" in over.summary()

    # raw-array draws path + max_draws subsampling agree with the
    # SampleResult path on the same data
    sub = model.goodness_of_fit(obs, 25.0, res.flat, max_draws=128)
    assert abs(sub.p_value - gof.p_value) < 0.2


def test_gof_marginalized_foreground_and_refusals(model, splits, bounds):
    """Under a flat-prior MarginalizedNoise any in-basis foreground is
    invisible (exact invariance, dof = n - K); structure OUTSIDE the
    basis still trips the check; the scale-marginal spec and missing
    draws are refused with actionable errors."""
    from tpu21cmvae.noisescale import marginalize_noise_scale

    rng = np.random.default_rng(8)
    truth = np.asarray(splits.par_test[1], np.float32)
    clean = np.asarray(model.predict(truth))
    nv = np.full(clean.shape[0], 25.0)
    mn = model.marginalize_foreground(nv, n_terms=4)
    fg_in = mn.basis @ np.array([300.0, -40.0, 10.0, 2.0])
    obs = clean + fg_in + rng.normal(0.0, 5.0, clean.shape)
    common = dict(sampler="mh", n_walkers=256, n_steps=150,
                  n_warmup=300, thin=10, bounds=bounds, seed=1)
    res = model.sample_posterior(obs, mn, **common)
    gof = model.goodness_of_fit(obs, mn, res)
    assert 0.01 < gof.p_value < 0.99, gof.summary()
    assert gof.dof == clean.shape[0] - 4
    assert np.abs(gof.bin_z).max() < 5.0  # fg-cleaned diagnostic

    # out-of-basis structure: a ripple no smooth 4-term basis spans
    nu = np.asarray(model.frequencies, np.float64)
    ripple = 12.0 * np.sin(2 * np.pi * (nu - nu.min()) / 10.0)
    obs_bad = obs + ripple
    res_bad = model.sample_posterior(obs_bad, mn, **common)
    bad = model.goodness_of_fit(obs_bad, mn, res_bad)
    assert bad.p_value < 0.01, bad.summary()

    with pytest.raises(ValueError, match="sigma2_posterior"):
        model.goodness_of_fit(
            obs, marginalize_noise_scale(nv), res
        )
    with pytest.raises(ValueError, match="draws"):
        model.goodness_of_fit(obs, 25.0)


def test_gof_batch_flags_the_corrupted_observation(model, splits, bounds):
    """Survey-scale check: 3 observations sampled as one batched chain,
    checked as one batched predict — the corrupted one (and only it)
    is flagged, and the per-observation numbers match the single-obs
    path on the same draws."""
    from tpu21cmvae.calibration import goodness_of_fit

    rng = np.random.default_rng(9)
    truths = np.asarray(splits.par_test[:3], np.float32)
    clean = np.asarray(model.predict(truths))
    obs = clean + rng.normal(0.0, 5.0, clean.shape)
    nu = np.asarray(model.frequencies, np.float64)
    obs[1] += 40.0 * (nu / nu.mean()) ** -2.5  # un-modeled foreground
    batch = model.sample_posterior_batch(
        obs, 25.0, sampler="mh", n_walkers=256, n_steps=300,
        n_warmup=1000, thin=10, bounds=bounds, seed=0,
    )
    res = model.goodness_of_fit_batch(obs, 25.0, batch, max_draws=256)
    assert res.p_values.shape == (3,)
    assert list(res.flagged) == [1], res.summary()
    assert res.p_values[1] < 0.01 < min(res.p_values[0], res.p_values[2])
    assert "obs 1" in res.summary()
    assert np.abs(res.bin_z[1]).max() > np.abs(res.bin_z[0]).max()
    # single-obs path on the same draws agrees
    solo = goodness_of_fit(
        model, obs[0], 25.0,
        batch.per_obs(0).flat, max_draws=256, seed=0,
    )
    np.testing.assert_allclose(res.p_values[0], solo.p_value, atol=0.05)
    # (O, B, P) array input and shape validation
    arr = np.stack([batch.flat(i)[:64] for i in range(3)])
    res2 = model.goodness_of_fit_batch(obs, 25.0, arr)
    assert res2.p_values.shape == (3,)
    with pytest.raises(ValueError, match="O, B, n_params"):
        model.goodness_of_fit_batch(obs, 25.0, arr[0])
    with pytest.raises(ValueError, match="observations"):
        model.goodness_of_fit_batch(obs[:2], 25.0, batch)


def test_gof_rejects_batch_result_with_redirect(model, splits, bounds):
    """A BatchSampleResult into the single-observation check must raise
    the redirect error, not an opaque TypeError (its .flat is a method,
    not a property)."""
    import pytest

    obs_batch = np.asarray(splits.signal_test[:2], np.float64)
    batch = model.sample_posterior_batch(
        obs_batch, 25.0, n_walkers=16, n_steps=4, n_warmup=4, thin=2,
        bounds=bounds, seed=0,
    )
    with pytest.raises(ValueError, match="goodness_of_fit_batch"):
        model.goodness_of_fit(obs_batch[0], 25.0, batch)
    # the documented per-observation escape hatch works
    gof = model.goodness_of_fit(obs_batch[0], 25.0, batch.per_obs(0))
    assert np.isfinite(gof.p_value)


def test_sbc_thin_zero_raises_friendly_error(model, bounds):
    """thin=0 stores no chain; the guard must fire before the
    BatchSampleResult.chain reshape view chokes on a size-0 array."""
    import pytest

    from tpu21cmvae.calibration import sbc

    with pytest.raises(ValueError, match="thin > 0"):
        sbc(model, noise_var=25.0, n_sims=2, n_walkers=8, n_steps=4,
            n_warmup=4, thin=0, bounds=bounds, seed=0)


def test_sbc_defaults_bounds_to_prior_box(model):
    """A prior over a custom box: sbc adopts the prior's box for the
    chains when bounds is omitted, and refuses an explicit mismatch."""
    import pytest

    from tpu21cmvae.calibration import sbc
    from tpu21cmvae.priors import GaussianBoxPrior

    par = np.asarray(model.data.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    mid = 0.5 * (lo + hi)
    custom = np.stack([lo + 0.2 * (mid - lo), hi - 0.2 * (hi - mid)],
                      axis=1)
    mean = [None] * par.shape[1]
    sigma = [None] * par.shape[1]
    mean[3], sigma[3] = mid[3], 0.2 * (hi[3] - lo[3])
    prior = GaussianBoxPrior.build(mean, sigma, bounds=custom)
    study = sbc(model, noise_var=25.0, n_sims=2, n_walkers=8, n_steps=4,
                n_warmup=4, thin=2, prior=prior, seed=0)
    assert study.ranks.shape == (2, par.shape[1])
    with pytest.raises(ValueError, match="prior box"):
        sbc(model, noise_var=25.0, n_sims=2, n_walkers=8, n_steps=4,
            n_warmup=4, thin=2, prior=prior,
            bounds=np.stack([lo, hi], axis=1), seed=0)


def test_batched_nuts_smoke(model, splits, bounds):
    """sampler="nuts" on batched observations: per-block step sizes +
    per-block metrics, per-walker trees; posteriors concentrate near
    their own truths."""
    rng = np.random.default_rng(9)
    truths = np.asarray(splits.par_test[:2], np.float32)
    obs_batch = model.predict(truths) + rng.normal(0, 5.0, (2, 451))
    batch = model.sample_posterior_batch(
        obs_batch, 25.0, sampler="nuts", n_walkers=32, n_steps=30,
        n_warmup=40, max_depth=4, thin=5, bounds=bounds, seed=0,
    )
    assert batch.chain.shape[1:] == (2, 32, 7)
    assert np.isfinite(batch.result.logp).all()
    assert batch.result.block_step_sizes.shape == (2,)
