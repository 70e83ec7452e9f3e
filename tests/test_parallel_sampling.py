"""Mesh-sharded inference: every sampler/fitter/evidence path accepts a
device mesh and shards its walker axis, keeping moments/optima/evidence
statistically exact (checked against analytic Gaussian results on the
virtual 8-device CPU mesh from conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.nested import nested_sampling
from tpu21cmvae.parallel import make_mesh
from tpu21cmvae.sampling import (
    _shard_walkers,
    fit_map,
    log_evidence,
    sample_ensemble,
    sample_hmc,
    sample_mh,
)

MU = np.array([0.3, -0.6, 1.2])
SIG = np.array([0.5, 0.25, 0.8])
BOUNDS = np.stack([MU - 10 * SIG, MU + 10 * SIG], axis=1)
# flat box prior: log Z of a NORMALIZED likelihood is -log(box volume)
LOGZ_BOX = float(-np.log(BOUNDS[:, 1] - BOUNDS[:, 0]).sum())


def normalized_loglik(params, x):
    z = (jnp.asarray(x) - MU) / SIG
    return -0.5 * jnp.sum(z * z, axis=-1) - float(
        0.5 * np.log(2 * np.pi * SIG**2).sum()
    )


def valgrad(params, x):
    x = jnp.asarray(x)
    z = (x - MU) / SIG
    return -0.5 * jnp.sum(z * z, axis=-1), -(z / SIG).astype(x.dtype)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def _check_moments(flat, n_steps):
    assert np.allclose(flat.mean(0), MU, atol=5 * SIG / np.sqrt(n_steps))
    assert np.allclose(flat.std(0), SIG, rtol=0.12)


def test_shard_walkers_places_and_validates(mesh):
    n_dev = mesh.devices.size
    xs = _shard_walkers(jnp.zeros((8 * n_dev, 3)), mesh)
    assert not xs.sharding.is_fully_replicated
    assert len(xs.sharding.device_set) == n_dev
    # no-op without a mesh
    x = jnp.zeros((5, 3))
    assert _shard_walkers(x, None) is x
    with pytest.raises(ValueError, match="divide"):
        _shard_walkers(jnp.zeros((8 * n_dev - 1, 3)), mesh)


def test_mh_sharded_moments(mesh):
    res = sample_mh(
        normalized_loglik, None, n_walkers=256, n_steps=400, n_warmup=300,
        thin=5, bounds=BOUNDS, seed=0, mesh=mesh,
    )
    _check_moments(res.flat, 400)


def test_stretch_sharded_moments(mesh):
    res = sample_ensemble(
        normalized_loglik, None, n_walkers=256, n_steps=500, n_warmup=300,
        thin=5, bounds=BOUNDS, seed=1, mesh=mesh,
    )
    _check_moments(res.flat, 500)


def test_hmc_sharded_moments(mesh):
    res = sample_hmc(
        valgrad, None, n_walkers=256, n_steps=300, n_warmup=150,
        n_leapfrog=6, thin=5, bounds=BOUNDS, seed=2, mesh=mesh,
    )
    _check_moments(res.flat, 300)


def test_fit_map_sharded(mesh):
    res = fit_map(
        valgrad, None, n_starts=64, n_steps=200, bounds=BOUNDS, seed=3,
        mesh=mesh,
    )
    np.testing.assert_allclose(res.best, MU, atol=0.02)


def test_ladder_evidence_sharded(mesh):
    res = log_evidence(
        normalized_loglik, None, n_rungs=16, n_walkers=128, n_steps=400,
        n_warmup=200, bounds=BOUNDS, seed=0, mesh=mesh,
    )
    assert abs(res.logz - LOGZ_BOX) < max(0.5, 4 * res.logz_err)
    # the rung axis must divide across the mesh
    with pytest.raises(ValueError, match="divide"):
        log_evidence(
            normalized_loglik, None, n_rungs=9, n_walkers=64, n_steps=10,
            n_warmup=5, bounds=BOUNDS, mesh=mesh,
        )


def test_nested_evidence_sharded(mesh):
    res = nested_sampling(
        normalized_loglik, None, n_live=512, n_mh=12, bounds=BOUNDS,
        seed=0, mesh=mesh,
    )
    assert abs(res.logz - LOGZ_BOX) < max(0.3, 3 * res.logz_err)
    post = res.posterior(20000, seed=1)
    np.testing.assert_allclose(post.mean(0), MU, atol=0.1)
    with pytest.raises(ValueError, match="divide"):
        nested_sampling(
            normalized_loglik, None, n_live=100, n_batch=25, n_mh=2,
            bounds=BOUNDS, mesh=mesh,
        )


def test_model_level_mesh_passthrough(splits, mesh):
    """The real emulator likelihood (MLP matmuls) compiles and runs
    under GSPMD with sharded walkers through the model-level API."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import DirectEmulatorConfig

    em = DirectEmulator(splits, config=DirectEmulatorConfig(hidden_dims=(16,)))
    obs = em.predict(splits.par_test[0])
    res = em.sample_posterior(
        obs, 25.0, sampler="mh", n_walkers=64, n_steps=20, n_warmup=10,
        thin=5, seed=0, mesh=mesh,
    )
    assert res.final.shape == (64, 7)
    assert np.isfinite(res.logp).all()
    ev = em.log_evidence(
        obs, 25.0, n_live=128, n_batch=16, n_mh=4, max_iters=64,
        seed=0, mesh=mesh,
    )
    assert np.isfinite(ev.logz)


def test_pt_sharded_moments_and_evidence_free_swaps(mesh):
    from tpu21cmvae.sampling import sample_pt

    res = sample_pt(
        normalized_loglik, None, n_rungs=16, n_walkers=128, n_steps=400,
        n_warmup=200, thin=5, bounds=BOUNDS, seed=0, mesh=mesh,
    )
    _check_moments(res.flat, 400)
    assert res.swap_rate.shape == (15,)
    with pytest.raises(ValueError, match="divide"):
        sample_pt(
            normalized_loglik, None, n_rungs=9, n_walkers=64, n_steps=10,
            n_warmup=5, bounds=BOUNDS, mesh=mesh,
        )


def test_chees_sharded_moments(mesh):
    """ChEES under a mesh: the warmup's ChEES-gradient ensemble mean
    and the metric's cross-walker std are the only collectives — the
    sharded chain must still adapt (trajectory grows from its tiny
    init) and recover exact moments."""
    from tpu21cmvae.sampling import sample_chees

    res = sample_chees(
        valgrad, None, n_walkers=256, n_steps=300, n_warmup=200,
        thin=5, bounds=BOUNDS, seed=2, mesh=mesh,
    )
    _check_moments(res.flat, 300)
    assert res.trajectory_length > 0.2  # adapted above the 0.08 init


def test_nuts_sharded_moments(mesh):
    """NUTS under a mesh: per-walker trees are walker-local (masked
    where-updates, no cross-walker data flow), so only the all-done
    early-exit reduction, the accept-stat mean, and the DENSE ensemble
    metric (cross-walker covariance + eigh — metric="auto" resolves
    dense for NUTS) are collectives. Exact moments on the analytic
    Gaussian prove the sharded program is the same sampler."""
    from tpu21cmvae.sampling import sample_nuts

    res = sample_nuts(
        valgrad, None, n_walkers=256, n_steps=300, n_warmup=200,
        thin=5, bounds=BOUNDS, seed=2, mesh=mesh, max_depth=6,
    )
    _check_moments(res.flat, 300)
    assert res.divergence_rate < 0.01
    assert res.ess().min() > 1000.0


def test_smc_sharded_evidence_and_moments(mesh):
    """SMC under a mesh: the per-sub-population particle axis shards
    (weighting/ESS bisection reduce via GSPMD collectives; systematic
    resampling gathers — particles are tiny rows); exact logz and
    moments on the normalized Gaussian prove the sharded anneal is the
    same algorithm."""
    from tpu21cmvae.sampling import sample_smc

    res = sample_smc(
        normalized_loglik, None, n_particles=512, bounds=BOUNDS,
        seed=0, mesh=mesh,
    )
    assert abs(res.logz - LOGZ_BOX) < max(0.3, 4 * res.logz_err)
    assert np.allclose(res.final.mean(0), MU, atol=6 * SIG / np.sqrt(512))
    assert np.allclose(res.final.std(0), SIG, rtol=0.15)
    assert res.betas[-1] == 1.0


def test_laplace_evidence_sharded(mesh):
    """Laplace under a mesh: starts shard, logz matches -log V for the
    normalized likelihood (wide box, Gaussian-exact regime)."""
    from tpu21cmvae.sampling import laplace_evidence

    res = laplace_evidence(
        normalized_loglik, None, bounds=BOUNDS, n_starts=64,
        n_steps=300, seed=0, mesh=mesh,
    )
    assert res.pd
    assert abs(res.logz - LOGZ_BOX) < 0.05


def test_mh_adapt_blocks_sharded(mesh):
    """Per-block adaptation under a mesh (the batched-observation
    survey path's shape): block statistics are a reshape+mean over the
    SHARDED walker axis — GSPMD must reduce them correctly even when a
    block spans devices. Two blocks with a 50x width split recover
    their own moments and adapted scales."""
    sig_blk = np.array([1.0, 0.02], np.float32)

    def loglik(params, x):
        s = jnp.repeat(jnp.asarray(sig_blk), x.shape[0] // 2)[:, None]
        return -0.5 * jnp.sum((jnp.asarray(x) / s) ** 2, axis=-1)

    bounds = np.array([[-8.0, 8.0]] * 3)
    res = sample_mh(
        loglik, None, n_walkers=256, adapt_blocks=2, n_steps=800,
        n_warmup=600, thin=5, bounds=bounds, seed=0, mesh=mesh,
    )
    wide = res.chain[:, :128].reshape(-1, 3)
    narrow = res.chain[:, 128:].reshape(-1, 3)
    assert np.allclose(wide.std(0), 1.0, rtol=0.15)
    assert np.allclose(narrow.std(0), 0.02, rtol=0.15)
    assert res.block_step_sizes[0] > 8 * res.block_step_sizes[1]


def test_nuts_adapt_blocks_sharded(mesh):
    """Per-block NUTS under a mesh (the batched-observation survey
    path's shape): the per-block ensemble METRIC is a reshape + vmapped
    covariance/eigh over the SHARDED walker axis and the per-block
    accept means reduce per slab — GSPMD must keep both exact when a
    block spans devices. Opposite-anisotropy blocks recover their own
    moments with whitened (shallow) trees."""
    from tpu21cmvae.sampling import sample_nuts

    sig_blk = np.array([[2.0, 0.2, 2.0], [0.2, 2.0, 0.2]], np.float32)

    def valgrad_blk(params, x):
        s = jnp.repeat(jnp.asarray(sig_blk), x.shape[0] // 2, axis=0)
        z = jnp.asarray(x) / s
        return -0.5 * jnp.sum(z * z, axis=-1), -z / s

    bounds = np.array([[-8.0, 8.0]] * 3)
    res = sample_nuts(
        valgrad_blk, None, n_walkers=256, adapt_blocks=2, n_steps=150,
        n_warmup=400, thin=5, bounds=bounds, seed=0, mesh=mesh,
        max_depth=7,
    )
    draws = res.chain.reshape(res.chain.shape[0], 2, 128, 3)
    for b in range(2):
        flat = draws[:, b].reshape(-1, 3)
        np.testing.assert_allclose(flat.std(0), sig_blk[b], rtol=0.15)
        assert np.abs(flat.mean(0)).max() < 0.3
    assert res.block_step_sizes.shape == (2,)
    assert res.divergence_rate < 0.02
    # each block's dense metric whitens ITS anisotropy: trees stay
    # shallow (a pooled metric would pay depth for the mixture shape)
    assert res.mean_leapfrog < 8
