"""Normalizing-flow VI (tpu21cmvae/flows.py).

The validation workhorse is a curved-ridge ("banana") target — the
posterior geometry where every ellipsoidal tool in the stack
measurably degrades (docs/PERF.md records khat ≥ 0.7 on ~half of a
real evidence batch): full-rank Gaussian ADVI saturates below the true
ELBO, and the adaptive-Student-t Laplace IS stage keeps a heavy weight
tail. The flow must (a) be an exact density (inverse and logdet
consistency), (b) fit the ridge, and (c) turn that fit into a
trustworthy evidence estimate.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.flows import (
    FlowEvidenceResult,
    FlowResult,
    _base_logpdf,
    _masks,
    fit_flow,
    flow_evidence,
    flow_forward,
    flow_inverse,
    init_flow,
)

# -- curved-ridge target (raw space, 3 params) ---------------------------
_B = 0.4
_BOUNDS = np.array([[-6.0, 6.0], [-6.0, 6.0], [-3.0, 3.0]], np.float32)


def _banana_logp(x):
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    r = x1 - _B * x0**2 + 1.0
    return (
        -0.5 * (x0**2 / 4.0)
        - 0.5 * (r / 0.25) ** 2
        - 0.5 * (x2 / 0.5) ** 2
    )


def _banana_valgrad(params, x):
    del params
    return _banana_logp(x), jax.grad(lambda q: _banana_logp(q).sum())(x)


def _banana_logz_true():
    """Box-normalized evidence by 2-D + 1-D quadrature (the target
    factorizes as p(x0, x1)·p(x2))."""
    g0 = np.linspace(-6, 6, 1201)
    g1 = np.linspace(-6, 6, 1201)
    g2 = np.linspace(-3, 3, 601)
    p0, p1 = np.meshgrid(g0, g1, indexing="ij")
    f01 = np.exp(
        -0.5 * p0**2 / 4.0
        - 0.5 * ((p1 - _B * p0**2 + 1.0) / 0.25) ** 2
    )
    z01 = np.trapezoid(np.trapezoid(f01, g1, axis=1), g0)
    z2 = np.trapezoid(np.exp(-0.5 * (g2 / 0.5) ** 2), g2)
    return math.log(z01 * z2 / (12.0 * 12.0 * 6.0))


def test_flow_is_an_exact_density():
    """Forward/inverse round-trip is exact and the two logdets agree,
    so log q(y) = log N(z) − logdet is a real density; a random
    (non-identity) flow is exercised, not just the init."""
    key = jax.random.key(0)
    theta = init_flow(key, 5, n_layers=4, width=16)
    # perturb every leaf so the couplings are genuinely non-identity
    leaves, tree = jax.tree_util.tree_flatten(theta)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    theta = jax.tree_util.tree_unflatten(tree, [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    masks = _masks(5, 4)
    z = jax.random.normal(jax.random.key(2), (64, 5))
    y, ld_f = flow_forward(theta, z, masks)
    z_back, ld_i = flow_inverse(theta, y, masks)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_i), np.asarray(ld_f),
                               rtol=3e-5, atol=2e-6)
    # logdet matches autodiff's exact Jacobian determinant, row by row
    jac = jax.vmap(jax.jacfwd(
        lambda q: flow_forward(theta, q[None], masks)[0][0]
    ))(z[:8])
    _, ref = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ld_f[:8]), ref, rtol=2e-5)


def test_flow_init_is_identity_gaussian():
    """Zeroed coupling output layers make the initial flow EXACTLY its
    base Gaussian — the wide ADVI-style start the fit relies on."""
    theta = init_flow(jax.random.key(0), 3, n_layers=6, width=8)
    masks = _masks(3, 6)
    z = jax.random.normal(jax.random.key(1), (32, 3))
    y, ld = flow_forward(theta, z, masks)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(z) * 1.5, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ld), 3 * math.log(1.5), rtol=1e-6
    )


def test_fit_flow_beats_gaussian_on_curved_ridge():
    """On the banana the flow's ELBO must clear full-rank ADVI's by a
    real margin (the Gaussian family saturates below the curved
    target), and the fitted samples must sit ON the ridge."""
    from tpu21cmvae.vi import fit_advi

    flow = fit_flow(_banana_valgrad, None, bounds=_BOUNDS,
                    n_steps=1200, n_mc=256, seed=0)
    assert isinstance(flow, FlowResult)
    # the trace starts at the ADVI warm start's optimum, so the climb
    # is the couplings' genuine non-Gaussian gain; tail must be flat
    n = len(flow.elbo)
    assert flow.elbo[-n // 5:].mean() > flow.elbo[: n // 5].mean() + 0.2
    gain_tail = flow.elbo[-n // 5:].mean() - flow.elbo[-2 * n // 5: -n // 5].mean()
    assert gain_tail < 1.0

    adv = fit_advi(_banana_valgrad, None, bounds=_BOUNDS,
                   n_steps=800, n_mc=256, seed=0)
    # compare E_q[log p] + H(q) on a COMMON convention: estimate both
    # by sampling the fitted objects (flow.log_q is exact; the
    # Gaussian's entropy is analytic)
    ys = flow.sample_y(8192, seed=3)
    s = jax.nn.sigmoid(ys)
    xr = jnp.asarray(_BOUNDS[:, 0]) + (
        jnp.asarray(_BOUNDS[:, 1]) - jnp.asarray(_BOUNDS[:, 0])
    ) * s
    jac = jnp.sum(
        jax.nn.log_sigmoid(ys) + jax.nn.log_sigmoid(-ys), axis=-1
    )
    elbo_flow = float(
        (_banana_logp(xr) + jac).mean() - flow.log_q(ys).mean()
    )
    eps = np.random.default_rng(3).standard_normal((8192, 3))
    y_adv = adv.mu + eps @ adv.chol.T
    s = jax.nn.sigmoid(jnp.asarray(y_adv, jnp.float32))
    xr = jnp.asarray(_BOUNDS[:, 0]) + (
        jnp.asarray(_BOUNDS[:, 1]) - jnp.asarray(_BOUNDS[:, 0])
    ) * s
    jac = jnp.sum(
        jax.nn.log_sigmoid(jnp.asarray(y_adv, jnp.float32))
        + jax.nn.log_sigmoid(-jnp.asarray(y_adv, jnp.float32)),
        axis=-1,
    )
    h_adv = float(
        np.linalg.slogdet(adv.chol)[1]
        + 0.5 * 3 * math.log(2 * math.pi * math.e)
    )
    elbo_adv = float((_banana_logp(xr) + jac).mean()) + h_adv
    assert elbo_flow > elbo_adv + 0.3, (elbo_flow, elbo_adv)

    # fitted draws trace the ridge: E[x1 | x0] ≈ B·x0² − 1 at |x0| = 2
    draws = flow.sample(65536, seed=1)
    for c in (-2.0, 2.0):
        sel = np.abs(draws[:, 0] - c) < 0.3
        assert sel.sum() > 200
        expect = _B * c**2 - 1.0
        assert abs(draws[sel, 1].mean() - expect) < 0.3


def test_flow_evidence_exact_and_lighter_tailed_than_t():
    """Flow-IS log Z matches quadrature truth within its error bar and
    carries a healthier weight tail than the adaptive-Student-t
    Laplace stage on the same curved target — the measured failure
    mode this module exists for."""
    from tpu21cmvae.sampling import laplace_evidence

    flow = fit_flow(_banana_valgrad, None, bounds=_BOUNDS,
                    n_steps=1500, n_mc=256, seed=0)
    ev = flow_evidence(
        lambda p, x: _banana_logp(x), None, flow, bounds=_BOUNDS,
        seed=1,
    )
    assert isinstance(ev, FlowEvidenceResult)
    truth = _banana_logz_true()
    assert abs(ev.logz - truth) < max(4 * ev.logz_err, 0.05)
    lap = laplace_evidence(
        lambda p, x: _banana_logp(x), None, bounds=_BOUNDS,
        n_starts=512, n_steps=500, seed=0,
    )
    assert ev.khat < 0.7, ev.khat
    assert ev.khat < lap.khat - 0.1, (ev.khat, lap.khat)
    assert ev.is_ess > 3 * lap.is_ess, (ev.is_ess, lap.is_ess)
    # resampled posterior sits on the ridge too
    post = ev.posterior(4096, seed=2)
    assert post.shape == (4096, 3)
    sel = np.abs(post[:, 0] - 2.0) < 0.4
    assert abs(post[sel, 1].mean() - (_B * 4.0 - 1.0)) < 0.35
    assert "khat" in ev.summary()


def test_flow_evidence_prior_convention():
    """flow_evidence shares the box-normalized-prior convention: a
    constant shift of log_prior cannot move log Z, and a tight
    Gaussian prior reproduces the quadrature truth."""
    from tpu21cmvae.priors import GaussianBoxPrior

    mu = np.array([0.5, -1.0, 0.2], np.float32)
    sig = np.array([0.6, 0.8, 0.4], np.float32)

    def logp(x):
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2, axis=-1)

    def valgrad(params, x):
        return logp(x), jax.grad(lambda q: logp(q).sum())(x)

    prior = GaussianBoxPrior.for_params(
        {0: (1.0, 0.25)}, n_params=3, bounds=_BOUNDS
    )
    logz_true = 0.0
    for j in range(3):
        g = np.linspace(_BOUNDS[j, 0], _BOUNDS[j, 1], 100001,
                        dtype=np.float64)
        like = np.exp(-0.5 * ((g - mu[j]) / sig[j]) ** 2)
        pi = (np.exp(-0.5 * ((g - 1.0) / 0.25) ** 2) if j == 0
              else np.ones_like(g))
        logz_true += math.log(
            np.trapezoid(like * pi, g) / np.trapezoid(pi, g)
        )

    flow = fit_flow(valgrad, None, bounds=_BOUNDS, n_steps=700,
                    n_mc=256, seed=0, log_prior=prior.log_prior)
    ev = flow_evidence(lambda p, x: logp(x), None, flow,
                       bounds=_BOUNDS, log_prior=prior.log_prior,
                       seed=1)
    assert abs(ev.logz - logz_true) < max(4 * ev.logz_err, 0.05)
    # constant-shift invariance through the generic-MC normalizer
    # route (same MC seed → exact cancellation); the analytic-vs-MC
    # route agreement is covered by test_nested.py's convention test
    ev_base = flow_evidence(
        lambda p, x: logp(x), None, flow, bounds=_BOUNDS,
        log_prior=lambda x: prior.log_prior(x), seed=1,
    )
    ev_shift = flow_evidence(
        lambda p, x: logp(x), None, flow, bounds=_BOUNDS,
        log_prior=lambda x: prior.log_prior(x) + 5.0, seed=1,
    )
    assert ev_shift.logz == pytest.approx(ev_base.logz, abs=1e-3)
    assert ev_base.logz == pytest.approx(ev.logz, abs=0.05)


def test_fit_flow_tracks_fresh_params_through_cache():
    """Regression: the cached fit program must take the model weights
    as a RUN argument, not bake the first call's into the trace — a
    second fit through the same valgrad closure (e.g. after
    retraining) with different params must follow the new target."""

    def valgrad(params, x):
        def lp(q):
            return -0.5 * jnp.sum((q - params) ** 2, axis=-1)

        return lp(x), jax.grad(lambda q: lp(q).sum())(x)

    kw = dict(bounds=_BOUNDS, n_steps=400, n_mc=128, seed=0,
              warm_start=False)
    f_a = fit_flow(valgrad, jnp.array([2.0, 2.0, 0.5]), **kw)
    f_b = fit_flow(valgrad, jnp.array([-2.0, -2.0, -0.5]), **kw)
    np.testing.assert_allclose(f_a.mean(), [2.0, 2.0, 0.5], atol=0.3)
    np.testing.assert_allclose(f_b.mean(), [-2.0, -2.0, -0.5], atol=0.3)


def _random_flow(n_layers, seed):
    theta = init_flow(jax.random.key(seed), 3, n_layers=n_layers,
                      width=8)
    leaves, tree = jax.tree_util.tree_flatten(theta)
    keys = jax.random.split(jax.random.key(seed + 100), len(leaves))
    theta = jax.tree_util.tree_unflatten(tree, [
        l + 0.2 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])
    return FlowResult(
        theta=jax.tree_util.tree_map(np.asarray, theta),
        masks=_masks(3, n_layers),
        elbo=np.zeros(1, np.float32),
        _lo=np.asarray(_BOUNDS[:, 0], np.float64),
        _hi=np.asarray(_BOUNDS[:, 1], np.float64),
    )


def test_flow_evidence_cache_keyed_on_architecture():
    """Regression: the IS program closes over the mask stack, so a
    deeper flow through the same loglik closure must NOT hit the
    shallower flow's cached program (zip would silently truncate the
    coupling stack — exactly the 'refit with more layers' workflow
    the khat diagnostic prescribes)."""

    def loglik(p, x):
        return _banana_logp(x)

    f6, f8 = _random_flow(6, 0), _random_flow(8, 1)
    flow_evidence(loglik, None, f6, bounds=_BOUNDS, n_is=2048, seed=3)
    ev8 = flow_evidence(loglik, None, f8, bounds=_BOUNDS, n_is=2048,
                        seed=3)
    fresh = flow_evidence(lambda p, x: _banana_logp(x), None, f8,
                          bounds=_BOUNDS, n_is=2048, seed=3)
    assert ev8.logz == pytest.approx(fresh.logz, abs=1e-6)
    assert ev8.khat == pytest.approx(fresh.khat, abs=1e-6)


def test_flow_evidence_rejects_mismatched_bounds():
    """The fitted flow remembers its box; evaluating the evidence in a
    different one is a silent wrong answer, so it must raise."""
    flow = _random_flow(4, 2)
    other = _BOUNDS.copy()
    other[0, 1] = 5.0
    with pytest.raises(ValueError, match="bounds"):
        flow_evidence(lambda p, x: _banana_logp(x), None, flow,
                      bounds=other)


def test_base_logpdf_is_standard_normal():
    z = np.array([[0.0, 0.0], [1.0, -2.0]], np.float32)
    want = -0.5 * (z**2).sum(-1) - math.log(2 * math.pi)
    np.testing.assert_allclose(
        np.asarray(_base_logpdf(jnp.asarray(z))), want, rtol=1e-6
    )


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


def test_model_level_flow_fit_and_evidence(tiny_direct):
    """The family API: fit_flow returns in-box draws concentrated by
    the likelihood, and log_evidence(method='flow') agrees with the
    nested reference within a loose cross-method budget; a prefitted
    flow= is reused; fit kwargs with flow= are rejected."""
    model, obs, bounds = tiny_direct
    flow = model.fit_flow(obs, 25.0, bounds=bounds, n_steps=400,
                          n_mc=128, seed=0)
    draws = flow.sample(4096, seed=1)
    assert draws.shape == (4096, 7)
    assert (draws >= bounds[:, 0] - 1e-4).all()
    assert (draws <= bounds[:, 1] + 1e-4).all()

    ev = model.log_evidence(obs, 25.0, bounds=bounds, method="flow",
                            flow=flow, n_is=4096, seed=5)
    nes = model.log_evidence(obs, 25.0, bounds=bounds,
                             method="nested", n_live=256, n_mh=12,
                             seed=0)
    assert np.isfinite(ev.logz)
    assert ev.flow is flow
    # cross-method agreement: generously bounded (the flow may not be
    # converged at this budget; khat is the per-run trust signal)
    assert abs(ev.logz - nes.logz) < max(
        6 * (ev.logz_err + nes.logz_err), 3.0
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.log_evidence(obs, 25.0, bounds=bounds, method="flow",
                           flow=flow, n_steps=100)
    with pytest.raises(ValueError, match="'flow'"):
        model.log_evidence(obs, 25.0, method="typo")


def test_batched_evidence_khat_escalation_closes_the_loop():
    """Round-3 VERDICT weak #4, end to end: a two-observation batch
    where one row is the curved banana (the Laplace stage's measured
    khat failure mode) and one is a clean Gaussian. Under
    ``method="auto"`` the flagged row — and ONLY the flagged row — is
    automatically re-estimated through a flow proposal, the headline
    fields and posterior cloud are replaced by the flow estimate, the
    escalated log Z matches quadrature truth, and every row carries an
    explicit ``method_used`` record."""
    from tpu21cmvae.sampling import laplace_evidence_multi_auto

    mu = np.array([0.5, -1.0, 0.2], np.float32)
    sig = np.array([0.6, 0.8, 0.4], np.float32)

    def _gauss_logp(x):
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2, axis=-1)

    def multi_loglik(params, x):
        n = x.shape[0] // 2  # observation-major rows: banana then gauss
        return jnp.concatenate(
            [_banana_logp(x[:n]), _gauss_logp(x[n:])]
        )

    def _gauss_valgrad(params, x):
        return _gauss_logp(x), jax.grad(
            lambda q: _gauss_logp(q).sum()
        )(x)

    row_loglik = [lambda p, x: _banana_logp(x),
                  lambda p, x: _gauss_logp(x)]
    row_valgrad = [_banana_valgrad, _gauss_valgrad]
    lap_kw = dict(n_starts=512, n_steps=400, n_is=4096, seed=0)

    # threshold chosen between the two rows' measured Laplace khats so
    # the test pins the POLICY (flag one, keep one), not the exact khat
    # value of one banana fit
    base = laplace_evidence_multi_auto(
        multi_loglik, None, 2, bounds=_BOUNDS, method="laplace",
        row_loglik=lambda i: row_loglik[i],
        row_valgrad=lambda i: row_valgrad[i], **lap_kw,
    )
    assert [r.method_used for r in base] == ["laplace", "laplace"]
    thr = float(np.clip((base[0].khat + base[1].khat) / 2, 0.2, 0.7))
    assert base[1].khat < thr < base[0].khat or base[0].khat >= 0.7

    res = laplace_evidence_multi_auto(
        multi_loglik, None, 2, bounds=_BOUNDS, method="auto",
        khat_threshold=thr,
        flow_kwargs=dict(n_steps=1500, n_mc=256),
        row_loglik=lambda i: row_loglik[i],
        row_valgrad=lambda i: row_valgrad[i], **lap_kw,
    )
    assert res[0].method_used == "flow"
    assert res[1].method_used == "laplace"
    assert isinstance(res[0].escalation, FlowEvidenceResult)
    assert res[1].escalation is None
    # escalated row: flow estimate replaces the headline fields and
    # matches quadrature truth; its khat now clears the Vehtari bound
    assert res[0].logz == res[0].escalation.logz
    assert abs(res[0].logz - _banana_logz_true()) < max(
        4 * res[0].logz_err, 0.1
    )
    assert res[0].khat < 0.7
    # the posterior cloud was swapped too: draws trace the ridge
    post = res[0].posterior(4096, seed=2)
    sel = np.abs(post[:, 0] - 2.0) < 0.4
    assert abs(post[sel, 1].mean() - (_B * 4.0 - 1.0)) < 0.35
    # unflagged row untouched (same estimate as the plain sweep)
    assert res[1].logz == base[1].logz

    # method="flow" ATTEMPTS escalation on every row (the attempt is
    # always recorded; adoption still requires a strictly better khat,
    # so a light fit may honestly lose to a clean Laplace row)
    allf = laplace_evidence_multi_auto(
        multi_loglik, None, 2, bounds=_BOUNDS, method="flow",
        flow_kwargs=dict(n_steps=400, n_mc=128),
        row_loglik=lambda i: row_loglik[i],
        row_valgrad=lambda i: row_valgrad[i], **lap_kw,
    )
    assert all(isinstance(r.escalation, FlowEvidenceResult)
               for r in allf)
    for r in allf:
        if r.method_used == "flow":
            assert r.khat == r.escalation.khat
        else:  # attempt recorded but rejected: headline kept Laplace
            assert r.khat <= r.escalation.khat

    with pytest.raises(ValueError, match="'laplace', 'auto' or 'flow'"):
        laplace_evidence_multi_auto(
            multi_loglik, None, 2, bounds=_BOUNDS, method="typo",
            row_loglik=lambda i: row_loglik[i],
            row_valgrad=lambda i: row_valgrad[i],
        )

    # the definitive last stage: with a threshold even the flow cannot
    # clear, the still-failing row escalates to per-row SMC — no
    # importance weights, khat honestly NaN, equal-weight draws behind
    # posterior(), log Z within MC error of quadrature truth
    fin = laplace_evidence_multi_auto(
        multi_loglik, None, 2, bounds=_BOUNDS, method="auto",
        khat_threshold=0.02,
        flow_kwargs=dict(n_steps=400, n_mc=128),
        final="smc",
        final_kwargs=dict(n_particles=2048, n_mh=8),
        row_loglik=lambda i: row_loglik[i],
        row_valgrad=lambda i: row_valgrad[i], **lap_kw,
    )
    esc_rows = [r for r in fin if r.method_used == "smc"]
    assert esc_rows, [r.method_used for r in fin]
    for r in esc_rows:
        assert r.final_result is not None
        assert np.isnan(r.khat)
        assert np.isfinite(r.logz) and np.isfinite(r.logz_err)
        assert r.posterior(64, seed=0).shape == (64, 3)
        # summary names the estimator that produced the headline and
        # drops the now-moot "confirm with nested" hint
        s = r.summary()
        assert "definitive" in s and "Confirm with" not in s
    banana_fin = fin[0]
    if banana_fin.method_used == "smc":
        assert abs(banana_fin.logz - _banana_logz_true()) < max(
            6 * banana_fin.logz_err, 0.3
        )

    with pytest.raises(ValueError, match="'nested' or 'smc'"):
        laplace_evidence_multi_auto(
            multi_loglik, None, 2, bounds=_BOUNDS, final="typo",
            row_loglik=lambda i: row_loglik[i],
            row_valgrad=lambda i: row_valgrad[i],
        )


def test_flow_batch_matches_sequential_on_mixed_rows():
    """Round-5 batched escalation: ``evidence_with_flow_batch`` fits
    K independent flows as one program and must (a) reproduce the
    closed-form evidence per row, (b) handle HETEROGENEOUS rows — one
    Gaussian, one curved banana — because real escalation batches mix
    easy and hard posteriors, and (c) agree with the sequential
    per-row path row by row."""
    from tpu21cmvae.flows import (
        evidence_with_flow,
        evidence_with_flow_batch,
    )

    mu_g = np.array([0.5, -1.0, 0.5], np.float32)
    sig_g = np.array([0.4, 0.6, 0.3], np.float32)

    def gauss_logp(x):
        z = (x - mu_g) / sig_g
        return -0.5 * jnp.sum(z * z, axis=-1)

    def ll_multi(params, x):
        xr = x.reshape(2, x.shape[0] // 2, 3)
        return jnp.concatenate(
            [gauss_logp(xr[0]), _banana_logp(xr[1])]
        )

    def vg_multi(params, x):
        ll = ll_multi(params, x)
        g = jax.grad(lambda q: jnp.sum(ll_multi(params, q)))(x)
        return ll, g

    kw = dict(bounds=_BOUNDS, n_steps=900, n_mc=128, n_is=8192)
    batch = evidence_with_flow_batch(
        ll_multi, vg_multi, None, 2, seed=0, **kw
    )
    assert len(batch) == 2

    span = (_BOUNDS[:, 1] - _BOUNDS[:, 0]).astype(np.float64)
    log_v = float(np.log(span).sum())
    true_g = -log_v + sum(
        math.log(s * math.sqrt(2 * math.pi)) for s in sig_g
    )
    true_b = _banana_logz_true()
    for r, true in zip(batch, (true_g, true_b)):
        assert abs(r.logz - true) < max(0.1, 4 * r.logz_err), (
            r.logz, true
        )
        assert r.is_ess > 0.2 * r.n_draws
        assert r.flow is not None

    # row-by-row parity with the sequential estimator
    def vg_banana(params, x):
        return _banana_logp(x), jax.grad(
            lambda q: _banana_logp(q).sum()
        )(x)

    seq = evidence_with_flow(
        lambda p, x: _banana_logp(x), vg_banana, None, seed=11, **kw
    )
    assert abs(batch[1].logz - seq.logz) < max(
        0.15, 4 * math.hypot(batch[1].logz_err, seq.logz_err)
    )
    # the batch draws a usable importance posterior per row
    draws = batch[1].posterior(256, seed=5)
    assert draws.shape == (256, 3)


def test_fit_flow_batch_program_caches_on_the_likelihood():
    """Two same-config batch fits share one compiled program (the
    auto-keyed chain-program cache); a different row count compiles a
    second one."""
    from tpu21cmvae.flows import fit_flow_batch

    def vg_multi(params, x):
        xr = x.reshape(2, x.shape[0] // 2, 3)
        mus = jnp.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, 0.5]])
        z = xr - mus[:, None, :]
        ll = (-0.5 * jnp.sum(z * z, -1)).reshape(-1)
        g = (-z).reshape(-1, 3)
        return ll, g

    kw = dict(bounds=_BOUNDS, n_steps=40, n_mc=32, warm_steps=20)
    fit_flow_batch(vg_multi, None, 2, seed=0, **kw)
    n0 = len(vg_multi._t21_chain_cache)
    fit_flow_batch(vg_multi, None, 2, seed=1, **kw)
    assert len(vg_multi._t21_chain_cache) == n0  # warm reuse
