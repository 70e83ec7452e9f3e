"""Nested-sampling evidence (tpu21cmvae/nested.py).

Validation targets have closed-form log Z under the flat box prior, so
these tests check the full pipeline — constrained replacement, exact
batched volume bookkeeping, log-space weights, stopping — against
truth, including the two regimes where the PT stepping-stone ladder
measurably fails: high likelihood dynamic range and multimodality.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.nested import NestedResult, nested_sampling

MU = np.array([0.5, -1.0, 2.0], np.float32)
SIG = np.array([0.3, 0.7, 0.2], np.float32)
LO, HI = MU - 4 * SIG, MU + 4 * SIG
BOUNDS = np.stack([LO, HI], axis=1)
LOG_V = float(np.log((HI - LO).astype(np.float64)).sum())


def _gauss_logz(sig, trunc=4.0):
    """log ∫ exp(-q/2) dx / V for an axis-aligned Gaussian ±trunc·σ."""
    logz = -LOG_V
    for s in np.atleast_1d(sig):
        logz += math.log(s * math.sqrt(2 * math.pi)) + math.log(
            math.erf(trunc / math.sqrt(2))
        )
    return logz


def test_matches_analytic_gaussian():
    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / SIG) ** 2, axis=-1)

    logz_true = _gauss_logz(SIG)
    res = nested_sampling(loglik, None, bounds=BOUNDS, n_live=512,
                          n_batch=64, n_mh=20, seed=0)
    assert isinstance(res, NestedResult)
    assert not res.truncated
    assert abs(res.logz - logz_true) < max(0.25, 3 * res.logz_err)
    # weights are normalized in log space
    assert np.isclose(np.logaddexp.reduce(res.log_w), 0.0, atol=1e-6)
    # posterior mean recovers the mode location
    p = np.exp(res.log_w)
    mean = (p[:, None] * res.samples).sum(0)
    assert np.allclose(mean, MU, atol=0.2 * SIG)
    draws = res.posterior(512, seed=1)
    assert draws.shape == (512, 3)
    assert (draws >= LO - 1e-5).all() and (draws <= HI + 1e-5).all()
    assert res.ess > 100
    assert "log Z" in res.summary()


def test_sharp_high_dynamic_range():
    """σ = 1e-4 of the box: ~23 nats of compression and ~1e7 likelihood
    dynamic range — the regime where the PT ladder needs hundreds of
    rungs. Nested sampling compresses geometrically by construction."""
    sig = (1e-4 * (HI - LO)).astype(np.float32)

    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / sig) ** 2, axis=-1)

    logz_true = float(
        np.log(sig.astype(np.float64) * math.sqrt(2 * math.pi)).sum()
        - LOG_V
    )
    res = nested_sampling(loglik, None, bounds=BOUNDS, n_live=512,
                          n_batch=64, n_mh=20, seed=0)
    assert not res.truncated
    assert abs(res.logz - logz_true) < max(0.7, 3 * res.logz_err)
    assert res.h > 15  # really did compress


def test_bimodal_unequal_mass():
    """Two well-separated sharp modes with 80/20 mass: logZ must count
    both, and the posterior weights must split the mass correctly —
    the multimodality contract PT metastability breaks."""
    mu2 = (MU + 3.2 * SIG).astype(np.float32)
    sig = (0.1 * SIG).astype(np.float32)
    w1, w2 = 0.8, 0.2

    def loglik(params, x):
        a = -0.5 * jnp.sum(((x - MU) / sig) ** 2, axis=-1) + math.log(w1)
        b = -0.5 * jnp.sum(((x - mu2) / sig) ** 2, axis=-1) + math.log(w2)
        return jnp.logaddexp(a, b)

    logz_true = float(
        math.log(w1 + w2)
        + np.log(sig.astype(np.float64) * math.sqrt(2 * math.pi)).sum()
        - LOG_V
    )
    res = nested_sampling(loglik, None, bounds=BOUNDS, n_live=1024,
                          n_batch=128, n_mh=24, seed=0)
    assert not res.truncated
    assert abs(res.logz - logz_true) < max(0.4, 3 * res.logz_err)
    d1 = ((res.samples - MU) ** 2).sum(1)
    d2 = ((res.samples - mu2) ** 2).sum(1)
    frac2 = np.exp(res.log_w)[d2 < d1].sum()
    assert abs(frac2 - w2 / (w1 + w2)) < 0.08


def test_truncation_flag_and_guards():
    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / SIG) ** 2, axis=-1)

    res = nested_sampling(loglik, None, bounds=BOUNDS, n_live=256,
                          n_batch=32, n_mh=8, max_iters=8,
                          iters_per_chunk=4, seed=0)
    assert res.truncated
    assert "LOWER bound" in res.summary()
    assert res.n_iters == 8 * 32
    with pytest.raises(ValueError, match="n_batch"):
        nested_sampling(loglik, None, bounds=BOUNDS, n_live=64, n_batch=64)


def test_seed_stability():
    """The headline reliability property: independent seeds agree to
    well under a nat (the PT ladder scatters by ~100 on comparable
    problems — docs/PERF.md)."""
    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / SIG) ** 2, axis=-1)

    vals = [
        nested_sampling(loglik, None, bounds=BOUNDS, n_live=512,
                        n_batch=64, n_mh=16, seed=s).logz
        for s in range(3)
    ]
    assert max(vals) - min(vals) < 0.5


def test_model_level_default_is_nested(tiny_direct):
    model, obs, bounds = tiny_direct
    res = model.log_evidence(obs, 25.0, bounds=bounds, n_live=256,
                             n_mh=8, seed=0)
    assert isinstance(res, NestedResult)
    assert np.isfinite(res.logz)
    with pytest.raises(ValueError, match="method"):
        model.log_evidence(obs, 25.0, bounds=bounds, method="bogus")


@pytest.fixture(scope="module")
def tiny_direct(splits):
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    obs = np.asarray(model.predict(splits.par_test[0]))
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    pad = 0.05 * (hi - lo) + 1e-6
    lo, hi = lo - pad, hi + pad
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1).astype(np.float32)
    return model, obs, bounds


def test_compare_evidence_prefers_generating_family(splits):
    """compare_evidence ranks the generating model above a broken
    variant of itself, reports Bayes factors relative to the winner,
    and flags insignificant gaps."""
    import numpy as np

    from tpu21cmvae import compare_evidence
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig, TrainConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(24,))
    )
    model.train(
        train_config=TrainConfig(epochs=15, early_stop_patience=None),
        device_loop=True,
    )
    rng = np.random.default_rng(5)
    truth = np.asarray(splits.par_test[0], np.float32)
    obs = model.predict(truth) + rng.normal(0, 5.0, splits.n_bins)
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1)

    class Broken:
        """Same family, signal scaled 25% — cannot fit the data."""

        def log_evidence(self, obs, noise_var, **kw):
            import jax.numpy as jnp

            from tpu21cmvae.nested import nested_sampling

            base = model.predict_fn()

            def loglik(params, raw):
                pred = 1.25 * base(params, raw)
                r = pred - jnp.asarray(obs)
                return -0.5 * jnp.sum(r * r, axis=-1) / noise_var

            return nested_sampling(loglik, model.params, **kw)

    kwargs = dict(bounds=bounds, n_live=256, n_mh=8, seed=0)
    comp = compare_evidence(
        {"direct": model, "broken": Broken()}, obs, 25.0, **kwargs
    )
    assert comp.names[int(np.argmax(comp.logz))] == "direct"
    assert comp.log_bayes.max() == 0.0
    assert comp.logz[comp.names.index("direct")] > (
        comp.logz[comp.names.index("broken")] + 10.0
    )
    assert "preferred" in comp.summary()
    assert comp.results["direct"].posterior(8).shape == (8, 7)
    with pytest.raises(ValueError, match=">= 2"):
        compare_evidence({"only": model}, obs, 25.0)


def test_laplace_evidence_analytic_gaussian():
    """Laplace log Z matches the closed form on a wide-box Gaussian
    (sigmoid-map distortion is second order at σ/span = 1/20), with a
    correct raw-space covariance and in-box posterior draws; the
    default IS sharpening turns it into an exact estimate with a real
    MC error bar and near-full weight ESS."""
    from tpu21cmvae.sampling import LaplaceResult, laplace_evidence

    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / SIG) ** 2, axis=-1)

    lo, hi = MU - 10 * SIG, MU + 10 * SIG
    bounds = np.stack([lo, hi], axis=1)
    logz_true = -float(np.log((hi - lo).astype(np.float64)).sum())
    for s in SIG:
        logz_true += math.log(s * math.sqrt(2 * math.pi))
    kw = dict(bounds=bounds, n_starts=256, n_steps=300, seed=0)
    # raw saddle point (n_is=0): systematic-only contract
    res0 = laplace_evidence(loglik, None, n_is=0, **kw)
    assert isinstance(res0, LaplaceResult)
    assert res0.pd
    assert abs(res0.logz - logz_true) < 0.05
    assert np.isnan(res0.logz_err)  # systematic, not MC
    assert np.allclose(res0.map_params, MU, atol=0.02 * SIG)
    assert np.allclose(np.sqrt(np.diag(res0.cov)), SIG, rtol=0.03)
    draws = res0.posterior(4096, seed=1)
    assert draws.shape == (4096, 3)
    assert (draws >= lo - 1e-5).all() and (draws <= hi + 1e-5).all()
    assert np.allclose(draws.mean(0), MU, atol=0.1 * SIG)
    # default: IS sharpening — exact within its own (tiny) error bar
    res = laplace_evidence(loglik, None, **kw)
    assert abs(res.logz - logz_true) < max(3 * res.logz_err, 1e-2)
    assert res.logz_err < 0.01
    assert res.is_ess > 0.8 * 4096
    assert res.logz_laplace == pytest.approx(res0.logz)
    # importance-resampled posterior: exact moments, in the box
    d = res.posterior(5000, seed=1)
    assert (d >= lo - 1e-5).all() and (d <= hi + 1e-5).all()
    assert np.allclose(d.mean(0), MU, atol=0.1 * SIG)
    assert np.allclose(d.std(0), SIG, rtol=0.1)
    assert "±" in res.summary() and "ESS" in res.summary()


def test_laplace_matches_nested_on_emulator(tiny_direct):
    """Cross-estimator consistency on a real emulator posterior: the
    IS-sharpened Laplace estimate agrees with a CONVERGED nested run
    and beats the raw saddle point's non-Gaussianity gap.

    Budget note (measured): nested at 512 live / 12 MH reads this
    posterior 1.4 nats LOW (−23.9 vs the −22.4…−22.6 that 2048+ live /
    24+ MH and 65k–262k-draw t-IS independently converge to) — the
    under-budgeted comparison is the wrong reference, so this test pays
    for the converged one."""
    model, obs, bounds = tiny_direct
    lap = model.log_evidence(obs, 25.0, bounds=bounds, method="laplace",
                             n_starts=512, n_steps=400, seed=0)
    nes = model.log_evidence(obs, 25.0, bounds=bounds, n_live=2048,
                             n_mh=24, seed=0)
    assert lap.pd
    assert np.isfinite(lap.logz_err) and lap.is_ess > 50
    err = float(np.hypot(lap.logz_err, nes.logz_err))
    assert abs(lap.logz - nes.logz) < max(0.5, 4.0 * err)
    # the IS stage must beat the raw saddle point against nested
    assert abs(lap.logz - nes.logz) <= abs(lap.logz_laplace - nes.logz)
    # the Laplace MAP sits in the posterior bulk nested found
    p = np.exp(nes.log_w)
    mean = (p[:, None] * nes.samples).sum(0)
    sd = np.sqrt((p[:, None] * (nes.samples - mean) ** 2).sum(0))
    assert (np.abs(lap.map_params - mean) < 4.0 * sd + 1e-6).all()


def test_laplace_evidence_multi_analytic():
    """Batched Laplace+IS: two analytic Gaussian 'observations' in one
    call — each logz matches the closed form, and observation 0's
    estimate matches the single-observation path."""
    import math

    from tpu21cmvae.sampling import laplace_evidence, laplace_evidence_multi

    SIGB = np.array([0.3, 0.7, 0.2], np.float32)
    MUS = np.stack([
        np.array([0.5, -1.0, 2.0]), np.array([-0.5, 0.3, 1.0])
    ]).astype(np.float32)
    lo, hi = MUS.min(0) - 10 * SIGB, MUS.max(0) + 10 * SIGB
    bounds = np.stack([lo, hi], 1)

    def loglik_multi(params, x):
        x = jnp.atleast_2d(x)
        xr = x.reshape(2, x.shape[0] // 2, 3)
        z = (xr - MUS[:, None, :]) / SIGB
        return (-0.5 * jnp.sum(z * z, axis=-1)).reshape(-1)

    kw = dict(bounds=bounds, n_starts=128, n_steps=300, n_is=8192, seed=0)
    res = laplace_evidence_multi(loglik_multi, None, 2, **kw)
    true = -float(np.log((hi - lo).astype(np.float64)).sum()) + sum(
        math.log(s * math.sqrt(2 * math.pi)) for s in SIGB
    )
    assert len(res) == 2
    for o, r in enumerate(res):
        assert r.pd
        assert abs(r.logz - true) < max(4 * r.logz_err, 0.02)
        assert np.allclose(r.map_params, MUS[o], atol=0.05)
        d = r.posterior(2000, seed=1)
        assert np.allclose(d.mean(0), MUS[o], atol=0.15 * SIGB)

    def loglik0(params, x):
        return -0.5 * jnp.sum(((x - MUS[0]) / SIGB) ** 2, axis=-1)

    s0 = laplace_evidence(loglik0, None, **kw)
    assert abs(res[0].logz - s0.logz) < max(
        0.05, 4 * float(np.hypot(res[0].logz_err, s0.logz_err))
    )


def test_log_evidence_batch_matches_single(tiny_direct, splits):
    """Model-level survey evidence: the batched result agrees with the
    per-observation laplace path on a real emulator posterior."""
    model, obs, bounds = tiny_direct
    obs2 = np.asarray(model.predict(splits.par_test[1]))
    batch = np.stack([obs, obs2])
    kw = dict(bounds=bounds, n_starts=512, n_steps=400, n_is=4096, seed=0)
    res = model.log_evidence_batch(batch, 25.0, **kw)
    assert len(res) == 2
    for o, r in enumerate(res):
        single = model.log_evidence(
            batch[o], 25.0, method="laplace", **kw
        )
        err = float(np.hypot(r.logz_err, single.logz_err))
        assert abs(r.logz - single.logz) < max(0.5, 5 * err)
        d = r.posterior(64, seed=0)
        assert d.shape == (64, 7)
        assert (d >= bounds[:, 0] - 1e-5).all()
        assert (d <= bounds[:, 1] + 1e-5).all()


def test_log_evidence_batch_two_stage_family(splits):
    """The em->decoder families run the same batched path (generic
    stacked-observation likelihood): shapes, finiteness, in-box MAP."""
    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.utils.config import AutoEncoderConfig

    model = AutoEncoderEmulator(splits, config=AutoEncoderConfig(
        latent_dim=3, enc_hidden_dims=(16,), dec_hidden_dims=(16,),
        em_hidden_dims=(16,),
    ))
    batch = np.stack([
        np.asarray(model.predict(splits.par_test[0])),
        np.asarray(model.predict(splits.par_test[1])),
    ])
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], 1)
    res = model.log_evidence_batch(
        batch, 25.0, bounds=bounds, n_starts=64, n_steps=150,
        n_is=1024, seed=0,
    )
    assert len(res) == 2
    for r in res:
        assert np.isfinite(r.logz) and np.isfinite(r.logz_err)
        assert (r.map_params >= bounds[:, 0] - 1e-6).all()
        assert (r.map_params <= bounds[:, 1] + 1e-6).all()


def test_amis_adaptation_lifts_ess_on_sharp_mode_wide_bulk():
    """The adaptive IS rounds (_amis_sharpen) earn their keep on a
    target whose mode curvature is far sharper than its bulk — a
    scale-mixture Gaussian with 70 % of the mass in a 12x-wider
    component (the measured real-posterior pathology: Hessian up to
    ~80x sharper than the posterior spread, docs/PERF.md). Closed-form
    evidence; 3 adaptive rounds must match it and lift the weight-ESS
    fraction by well over an order of magnitude vs the one-shot
    Hessian proposal (measured here: 0.4 % -> 59 %)."""
    from tpu21cmvae.sampling import laplace_evidence

    sig = np.array([0.1, 0.15, 0.08], np.float64)
    mu = np.array([0.2, -0.4, 1.0], np.float64)
    wide = 12.0
    lo, hi = mu - 60 * sig, mu + 60 * sig
    bounds = np.stack([lo, hi], 1).astype(np.float32)
    p = 3

    def loglik(params, x):
        zn = jnp.sum(((x - mu) / sig) ** 2, axis=-1)
        zw = jnp.sum(((x - mu) / (wide * sig)) ** 2, axis=-1)
        return jnp.logaddexp(
            math.log(0.3) - 0.5 * zn,
            math.log(0.7) - p * math.log(wide) - 0.5 * zw,
        )

    # both components integrate to prod(sig*sqrt(2pi)) after the
    # wide one's W^-p normalization, so Z = prod(sig*sqrt(2pi)) / V
    true = -float(np.log(hi - lo).sum()) + float(
        np.log(sig * math.sqrt(2 * math.pi)).sum()
    )
    kw = dict(bounds=bounds, n_starts=256, n_steps=400, n_is=4096,
              seed=0)
    one = laplace_evidence(loglik, None, n_rounds=1, **kw)
    ada = laplace_evidence(loglik, None, n_rounds=3, **kw)
    assert abs(ada.logz - true) < max(4 * ada.logz_err, 0.03)
    # ESS as a fraction of draws: adaptation must at least 10x it
    frac_one = one.is_ess / one._is_logw.shape[0]
    frac_ada = ada.is_ess / ada._is_logw.shape[0]
    assert frac_ada > 10 * frac_one, (frac_one, frac_ada)
    # the adapted error bar is real: truth inside 4 sigma, and the
    # bar itself an order of magnitude tighter than the one-shot's
    assert ada.logz_err < 0.2 * one.logz_err


def test_psis_recovers_tail_index_and_preserves_bulk():
    """_psis on weights with a known generalized-Pareto tail: khat
    recovers the true index, only the tail is touched, and the
    smoothed maximum never exceeds the raw maximum."""
    from tpu21cmvae.sampling import _psis

    rng = np.random.default_rng(0)
    k_true = 0.45
    n = 20000
    u = rng.uniform(size=n)
    w = np.expm1(-k_true * np.log1p(-u)) / k_true  # GPD(k, sigma=1)
    logw = np.log(w + 1e-12) + 3.0
    sm, khat = _psis(logw)
    assert abs(khat - k_true) < 0.12
    assert sm.max() <= logw.max() + 1e-12
    # bulk untouched: all but the fitted tail are bit-identical
    changed = np.sum(~np.isclose(sm, logw))
    assert changed <= int(3 * np.sqrt(n)) + 1
    # smoothing must not move the normalization materially for a
    # healthy (k < 0.5) weight set
    lse = np.logaddexp.reduce
    assert abs(lse(sm) - lse(logw)) < 0.05


def test_laplace_prior_normalization_convention():
    """With an external ``log_prior`` the Laplace/IS evidence must use
    the same convention as the ladder/SMC/nested paths — evidence under
    the BOX-NORMALIZED prior — and be invariant to a constant shift of
    the raw log-density (the contract :mod:`tpu21cmvae.priors`
    documents). Checked against 1-D quadrature for Gaussian L ×
    truncated-Gaussian prior, through both the analytic
    (``GaussianBoxPrior.log_box_mean``) and generic-MC normalizer
    routes."""
    from tpu21cmvae.priors import GaussianBoxPrior
    from tpu21cmvae.sampling import _prior_log_box_mean, laplace_evidence

    # tight prior on dim 0 (sigma ~ span/48), flat elsewhere
    prior = GaussianBoxPrior.for_params(
        {0: (float(MU[0] + 0.2), 0.05)}, n_params=3, bounds=BOUNDS
    )

    def loglik(params, x):
        return -0.5 * jnp.sum(((x - MU) / SIG) ** 2, axis=-1)

    # truth by per-dim quadrature: Z = prod_j int L_j dpi_j with pi the
    # box-normalized prior (truncated Gaussian on dim 0, flat else)
    logz_true = 0.0
    for j in range(3):
        g = np.linspace(float(LO[j]), float(HI[j]), 200001,
                        dtype=np.float64)
        like = np.exp(-0.5 * ((g - float(MU[j])) / float(SIG[j])) ** 2)
        if j == 0:
            pi = np.exp(-0.5 * ((g - float(MU[0]) - 0.2) / 0.05) ** 2)
        else:
            pi = np.ones_like(g)
        logz_true += math.log(
            np.trapezoid(like * pi, g) / np.trapezoid(pi, g)
        )

    # the analytic normalizer agrees with the generic MC fallback
    lbm_exact = _prior_log_box_mean(prior.log_prior, LO, HI)
    lbm_mc = _prior_log_box_mean(
        lambda x: prior.log_prior(x), LO, HI
    )
    assert lbm_exact == pytest.approx(
        prior.log_box_mean(LO, HI)
    )
    assert abs(lbm_mc - lbm_exact) < 0.05

    kw = dict(bounds=BOUNDS, n_starts=256, n_steps=400, seed=0)
    res = laplace_evidence(loglik, None, log_prior=prior.log_prior,
                           **kw)
    assert abs(res.logz - logz_true) < max(4 * res.logz_err, 0.05)
    # the raw saddle point carries a real systematic here (tight prior
    # x likelihood product is skewed in the whitened space) — the IS
    # stage is what removes it; just pin the convention constant
    assert abs(res.logz_laplace - logz_true) < 0.25

    # constant-shift invariance through the MC route: +5 nats on the
    # raw density must not move logz (same MC seed, exact cancellation)
    base = laplace_evidence(
        loglik, None, log_prior=lambda x: prior.log_prior(x), **kw
    )
    shifted = laplace_evidence(
        loglik, None, log_prior=lambda x: prior.log_prior(x) + 5.0,
        **kw
    )
    assert shifted.logz == pytest.approx(base.logz, abs=1e-3)
    assert abs(base.logz - res.logz) < 0.1


def test_batch_matches_sequential():
    """The batched definitive tier (round-5): per-row logz from
    ``nested_sampling_batch`` agrees with the sequential path within
    the combined statistical error, and with the closed form."""
    from tpu21cmvae.nested import nested_sampling_batch

    MUS = np.stack([
        np.array([0.5, -1.0, 2.0]), np.array([-0.2, 0.4, 1.2]),
        np.array([0.0, 0.0, 1.6]),
    ]).astype(np.float32)
    SIGS = np.stack([
        np.array([0.3, 0.7, 0.2]), np.array([0.5, 0.2, 0.4]),
        np.array([0.2, 0.3, 0.5]),
    ]).astype(np.float32)
    lo = MUS.min(0) - 3.0
    hi = MUS.max(0) + 3.0
    bounds = np.stack([lo, hi], 1)
    log_v = float(np.log((hi - lo).astype(np.float64)).sum())

    def loglik_multi(params, x):
        xr = x.reshape(3, x.shape[0] // 3, 3)
        z = (xr - MUS[:, None, :]) / SIGS[:, None, :]
        return (-0.5 * jnp.sum(z * z, axis=-1)).reshape(-1)

    kw = dict(bounds=bounds, n_live=512, n_batch=64, n_mh=16, seed=0)
    batch = nested_sampling_batch(loglik_multi, None, 3, **kw)
    assert len(batch) == 3
    for o in range(3):
        def row_ll(params, x, o=o):
            z = (x - MUS[o]) / SIGS[o]
            return -0.5 * jnp.sum(z * z, axis=-1)

        seq = nested_sampling(row_ll, None,
                              **{**kw, "seed": 17})
        true = -log_v + sum(
            math.log(s * math.sqrt(2 * math.pi)) for s in SIGS[o]
        )  # erf factor negligible: box >> 3 sigma on every axis? no —
        # keep the exact truncated form per axis
        true = -log_v
        for j in range(3):
            t = (hi[j] - MUS[o][j]) / SIGS[o][j]
            b = (lo[j] - MUS[o][j]) / SIGS[o][j]
            true += math.log(SIGS[o][j] * math.sqrt(2 * math.pi)) + \
                math.log(0.5 * (math.erf(t / math.sqrt(2))
                                - math.erf(b / math.sqrt(2))))
        assert not batch[o].truncated
        tol = max(0.4, 3 * math.hypot(batch[o].logz_err, seq.logz_err))
        assert abs(batch[o].logz - seq.logz) < tol
        assert abs(batch[o].logz - true) < max(0.4, 4 * batch[o].logz_err)
    # a batch program serves the single-obs path too: caching attaches
    # to the likelihood closure with an auto-derived structural key
    assert hasattr(loglik_multi, "_t21_chain_cache")


def test_auto_escalation_routes_finals_through_the_batch(monkeypatch):
    """``laplace_evidence_multi_auto(final='nested', rows_loglik=...)``
    must settle ALL remaining hard rows via ONE
    ``nested_sampling_batch`` call — never the per-row sequential
    path (round-4 VERDICT item 1)."""
    from tpu21cmvae.sampling import laplace_evidence_multi_auto
    import tpu21cmvae.nested as nested_mod

    MUS = np.stack([
        np.array([0.5, -1.0, 2.0]), np.array([-0.5, 0.3, 1.0])
    ]).astype(np.float32)
    SIGB = np.array([0.3, 0.7, 0.2], np.float32)
    lo, hi = MUS.min(0) - 6 * SIGB, MUS.max(0) + 6 * SIGB
    bounds = np.stack([lo, hi], 1)

    def make_multi(mus):
        def loglik_multi(params, x):
            xr = x.reshape(len(mus), x.shape[0] // len(mus), 3)
            z = (xr - np.asarray(mus)[:, None, :]) / SIGB
            return (-0.5 * jnp.sum(z * z, axis=-1)).reshape(-1)

        return loglik_multi

    def row_loglik(i):
        def ll(params, x):
            z = (x - MUS[i]) / SIGB
            return -0.5 * jnp.sum(z * z, axis=-1)

        return ll

    calls = {"seq": 0}
    real_seq = nested_mod.nested_sampling

    def guard_seq(*a, **k):
        calls["seq"] += 1
        return real_seq(*a, **k)

    monkeypatch.setattr(nested_mod, "nested_sampling", guard_seq)

    # khat_threshold=-1: no row can pass (khat >= 0), so with
    # method="laplace" every row lands in the definitive final stage
    res = laplace_evidence_multi_auto(
        make_multi(MUS), None, 2,
        row_loglik=row_loglik,
        row_valgrad=None,  # never reached with method="laplace"
        rows_loglik=lambda idx: make_multi(MUS[np.asarray(idx)]),
        method="laplace", khat_threshold=-1.0,
        final="nested",
        final_kwargs=dict(n_live=256, n_batch=32, n_mh=12),
        bounds=bounds, n_starts=128, n_steps=200, n_is=1024, seed=0,
    )
    assert calls["seq"] == 0  # the batched tier, not per-row runs
    import math as _m

    true = -float(np.log((hi - lo).astype(np.float64)).sum()) + sum(
        _m.log(s * _m.sqrt(2 * _m.pi)) for s in SIGB
    )
    for r in res:
        assert r.method_used == "nested"
        assert np.isnan(r.khat)
        assert r.final_result is not None and not r.final_result.truncated
        assert abs(r.logz - true) < max(0.5, 4 * r.logz_err)
        draws = r.posterior(64, seed=3)
        assert draws.shape == (64, 3)
