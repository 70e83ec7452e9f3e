"""Adaptive tempered SMC (tpu21cmvae/sampling/::sample_smc).

Checks against analytic evidences and moments, the 80/20 bimodal
mode-weight target that freezes single-temperature samplers, agreement
with nested sampling on a real trained-emulator posterior, and the
model-level method="smc" dispatch. Runs on the virtual CPU mesh.
"""

import numpy as np
import pytest

from tpu21cmvae.sampling import sample_smc

MU = np.array([0.5, -0.3, 0.1], np.float32)
SIG = np.array([0.3, 0.1, 0.6], np.float32)
BOUNDS = np.stack([MU - 6 * SIG, MU + 6 * SIG], axis=1).astype(np.float32)
LOGZ_BOX = float(-np.log(BOUNDS[:, 1] - BOUNDS[:, 0]).sum())


def normalized_loglik(params, x):
    import jax.numpy as jnp

    z = (jnp.asarray(x) - MU) / SIG
    return -0.5 * jnp.sum(z * z, axis=-1) - float(
        0.5 * np.log(2 * np.pi * SIG**2).sum()
    )


def test_smc_gaussian_evidence_and_moments():
    """On a normalized Gaussian likelihood log Z must equal -log(box
    volume); the β=1 population carries the exact posterior moments;
    the schedule is monotone, ends exactly at 1, and the replication
    error honestly brackets the truth."""
    res = sample_smc(
        normalized_loglik, None, n_particles=2048, bounds=BOUNDS, seed=0
    )
    assert abs(res.logz - LOGZ_BOX) < 0.2
    assert abs(res.logz - LOGZ_BOX) < max(0.15, 4 * res.logz_err)
    assert np.allclose(res.final.mean(0), MU, atol=0.05)
    assert np.allclose(res.final.std(0), SIG, rtol=0.12)
    assert res.flat is res.final
    assert np.isfinite(res.logp).all()
    # schedule diagnostics: strictly increasing β from 0 to exactly 1
    assert res.betas[0] == 0.0 and res.betas[-1] == 1.0
    assert (np.diff(res.betas) > 0).all()
    assert res.n_stages == len(res.betas) - 1
    assert (res.stage_ess > 0.2).all()  # the bisection hit its target
    assert (res.accept_rate > 0.2).all()
    # seed-to-seed spread consistent with the reported error scale
    res2 = sample_smc(
        normalized_loglik, None, n_particles=2048, bounds=BOUNDS, seed=3
    )
    assert abs(res2.logz - res.logz) < 0.5


def test_smc_recovers_mode_weights_and_bimodal_evidence():
    """The 80/20 two-Gaussian target (a ~400σ barrier) that freezes
    every single-temperature sampler (see the sample_pt test): SMC's
    gentle ESS-targeted anneal + resampling preserves the mode split
    AND integrates the exact evidence log(σ√(2π)/V)."""
    import jax.numpy as jnp

    mu_a, mu_b, sig, w_a = -3.0, 3.0, 0.1, 0.8
    bounds = np.array([[-6.0, 6.0]], np.float32)

    def loglik(params, x):
        x = jnp.asarray(x)[..., 0]
        la = jnp.log(w_a) - 0.5 * ((x - mu_a) / sig) ** 2
        lb = jnp.log(1 - w_a) - 0.5 * ((x - mu_b) / sig) ** 2
        return jnp.logaddexp(la, lb)

    res = sample_smc(loglik, None, n_particles=4096, bounds=bounds,
                     seed=0)
    frac = float((res.final[:, 0] < 0).mean())
    assert abs(frac - w_a) < 0.05, frac
    in_a = res.final[res.final[:, 0] < 0, 0]
    assert abs(in_a.mean() - mu_a) < 0.02
    assert abs(in_a.std() - sig) < 0.02
    logz_true = float(np.log(sig * np.sqrt(2 * np.pi) / 12.0))
    assert abs(res.logz - logz_true) < max(0.2, 4 * res.logz_err)


def test_smc_agrees_with_nested_on_emulator_posterior(splits):
    """Cross-estimator consistency on a real (tiny, trained) emulator
    likelihood: SMC's log Z within a few nats of nested sampling's,
    and its posterior mean near the nested posterior mean."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.nested import nested_sampling
    from tpu21cmvae.utils.config import DirectEmulatorConfig, TrainConfig

    model = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    model.train(
        train_config=TrainConfig(
            epochs=10, early_stop_patience=None, plateau_patience=None
        ),
        device_loop=True,
    )
    rng = np.random.default_rng(3)
    obs = model.predict(splits.par_test[0]) + rng.normal(
        0, 5.0, splits.n_bins
    )
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1)

    smc = model.log_evidence(
        obs, 25.0, method="smc", bounds=bounds, n_particles=2048, seed=0
    )
    ns = nested_sampling(
        model.loglik_fn(obs, 25.0), model.params, bounds=bounds,
        n_live=1024, seed=0,
    )
    assert abs(smc.logz - ns.logz) < 3.0, (smc.logz, ns.logz)
    post = ns.posterior(4096, seed=1)
    # compare scaled by the box so every parameter weighs equally
    span = bounds[:, 1] - bounds[:, 0]
    d = (smc.final.mean(0) - post.mean(0)) / span
    assert np.abs(d).max() < 0.05, d


def test_smc_model_entry_and_summary(splits):
    """sampler="smc" dispatches through sample_posterior on a real
    emulator likelihood; the result renders a summary and carries the
    evidence alongside the particles."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    em = DirectEmulator(
        splits, config=DirectEmulatorConfig(hidden_dims=(16,))
    )
    obs = em.predict(splits.par_test[0])
    par = np.asarray(splits.par_train, np.float64)
    lo, hi = par.min(0), par.max(0)
    lo[:3] = np.maximum(lo[:3], 1e-6)
    bounds = np.stack([lo, hi], axis=1)
    res = em.sample_posterior(
        obs, 25.0, sampler="smc", bounds=bounds, n_particles=512, seed=0
    )
    assert res.final.shape == (512, 7)
    assert np.isfinite(res.logp).all()
    assert np.isfinite(res.logz)
    s = res.summary(em.par_labels)
    assert "log Z" in s and "fstar" in s


def test_smc_validation_and_truncation():
    with pytest.raises(ValueError, match="divisible by 4"):
        sample_smc(normalized_loglik, None, n_particles=130,
                   bounds=BOUNDS)
    with pytest.raises(ValueError, match="span"):
        sample_smc(normalized_loglik, None, n_particles=8, bounds=BOUNDS)
    with pytest.raises(ValueError, match="target_ess_frac"):
        sample_smc(normalized_loglik, None, bounds=BOUNDS,
                   target_ess_frac=1.5)
    with pytest.raises(ValueError, match="max_stages"):
        sample_smc(normalized_loglik, None, bounds=BOUNDS, max_stages=1)
    with pytest.raises(ValueError, match="stretch scale"):
        sample_smc(normalized_loglik, None, bounds=BOUNDS, a=0.5)
    # a schedule that cannot reach β=1 in the stage budget must raise,
    # not silently return a partial anneal
    with pytest.raises(RuntimeError, match="truncated"):
        sample_smc(normalized_loglik, None, n_particles=512,
                   bounds=BOUNDS, max_stages=2, target_ess_frac=0.99)


def test_smc_program_cache_no_retrace():
    """Repeated calls with the same statics reuse ONE cached program
    (the _chain_program contract every sampler here honors)."""
    from tpu21cmvae.sampling import _chain_program  # noqa: F401

    def loglik(params, x):
        import jax.numpy as jnp

        z = (jnp.asarray(x) - MU) / SIG
        return -0.5 * jnp.sum(z * z, axis=-1)

    sample_smc(loglik, None, n_particles=512, bounds=BOUNDS, seed=0)
    cache = loglik._t21_chain_cache
    n = len(cache)
    sample_smc(loglik, None, n_particles=512, bounds=BOUNDS, seed=9)
    assert len(cache) == n  # same program, new seed
    sample_smc(loglik, None, n_particles=1024, bounds=BOUNDS, seed=0)
    assert len(cache) == n + 1  # new statics, new program
