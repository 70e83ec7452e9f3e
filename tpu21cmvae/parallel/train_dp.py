"""Data-parallel training over a device mesh.

The reference trains single-device via ``Model.fit``
(reference ``emulator.py:369-378``). Here the same jitted epoch loop runs
data-parallel: weights and optimizer state replicated, every batch
sharded on the ``data`` axis; XLA inserts the gradient all-reduce (psum)
over ICI automatically from the shardings — no NCCL/MPI analogue needed
(SURVEY.md §2.3/§5).

``dp_fit`` is a drop-in for :func:`tpu21cmvae.train.loop.fit` with a
``mesh`` argument; ``make_dp_train_step`` exposes the single fused
train step for custom loops and the multi-chip dry run.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu21cmvae.parallel.mesh import (
    batch_sharding,
    replicate,
    replicated_sharding,
    shard_batch,
)
from tpu21cmvae.train.adam import adam_init, adam_update
from tpu21cmvae.train.loop import fit
from tpu21cmvae.utils.config import TrainConfig


def make_dp_train_step(loss_fn, cfg: TrainConfig, mesh: Mesh):
    """One data-parallel train step: ``(params, opt_state, lr, bx, by) →
    (params, opt_state, loss)`` with params/opt replicated and the batch
    sharded. The gradient all-reduce is implicit in the shardings."""
    repl = replicated_sharding(mesh)
    dsh = batch_sharding(mesh)

    def step(params, opt_state, lr, bx, by):
        def batch_loss(p):
            return jnp.mean(loss_fn(p, bx, by))

        loss_val, grads = jax.value_and_grad(batch_loss)(params)
        params, opt_state = adam_update(
            grads,
            params,
            opt_state,
            lr,
            beta_1=cfg.beta_1,
            beta_2=cfg.beta_2,
            epsilon=cfg.epsilon,
        )
        return params, opt_state, loss_val

    return jax.jit(
        step,
        in_shardings=(repl, repl, None, dsh, dsh),
        out_shardings=(repl, repl, None),
    )


def dp_fit(
    params,
    loss_fn,
    x_train,
    y_train,
    x_val,
    y_val,
    cfg: TrainConfig,
    mesh: Mesh,
    *,
    opt_state=None,
    stochastic: bool = False,
    pass_epoch: bool = False,
    verbose: bool = False,
    **fit_kwargs,
):
    """Data-parallel :func:`~tpu21cmvae.train.loop.fit`: places the data
    batch-sharded and params/opt-state replicated before entering the
    same jitted epoch loop; XLA propagates the shardings through the
    scan and inserts collectives."""
    params = replicate(params, mesh)
    if opt_state is None:
        opt_state = replicate(adam_init(params), mesh)
    x_train = shard_batch(jnp.asarray(x_train, jnp.float32), mesh)
    y_train = shard_batch(jnp.asarray(y_train, jnp.float32), mesh)
    x_val = shard_batch(jnp.asarray(x_val, jnp.float32), mesh)
    y_val = shard_batch(jnp.asarray(y_val, jnp.float32), mesh)
    return fit(
        params,
        loss_fn,
        x_train,
        y_train,
        x_val,
        y_val,
        cfg,
        opt_state=opt_state,
        stochastic=stochastic,
        pass_epoch=pass_epoch,
        verbose=verbose,
        **fit_kwargs,
    )


def dp_fit_scan(
    params,
    loss_fn,
    x_train,
    y_train,
    x_val,
    y_val,
    cfg: TrainConfig,
    mesh: Mesh,
    *,
    opt_state=None,
    stochastic: bool = False,
    pass_epoch: bool = False,
):
    """Data-parallel, device-resident training: the whole run is ONE XLA
    program over the mesh (:func:`tpu21cmvae.train.scan.fit_scan` with
    the dataset batch-sharded and params/optimizer replicated).

    The per-epoch permutation is global, so batch re-sharding rides XLA
    collectives over ICI; gradients all-reduce via the shardings as in
    :func:`make_dp_train_step`. Semantics (shuffles, callbacks,
    histories) are identical to the single-device path.
    """
    from tpu21cmvae.train.scan import fit_scan

    params = replicate(params, mesh)
    if opt_state is None:
        opt_state = replicate(adam_init(params), mesh)
    x_train = shard_batch(jnp.asarray(x_train, jnp.float32), mesh)
    y_train = shard_batch(jnp.asarray(y_train, jnp.float32), mesh)
    x_val = shard_batch(jnp.asarray(x_val, jnp.float32), mesh)
    y_val = shard_batch(jnp.asarray(y_val, jnp.float32), mesh)
    return fit_scan(
        params,
        loss_fn,
        x_train,
        y_train,
        x_val,
        y_val,
        cfg,
        opt_state=opt_state,
        stochastic=stochastic,
        pass_epoch=pass_epoch,
    )
