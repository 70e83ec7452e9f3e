"""Fused emulate→log-likelihood: the MCMC inner loop as ONE Pallas kernel.

An MCMC sampler using the emulator as its forward model evaluates, per
proposal batch, ``-0.5·Σ_bins (predict(θ) − obs)²/σ²`` (the reference's
users compose this from ``DirectEmulator.predict``, reference
``emulator.py:383-407``, at ~40 ms per signal). Composed in XLA the
predicted (B, 451) signal block is materialized to HBM between the last
matmul and the reduction — ~1.8 GB written + read back per 1M-row call.

Here the whole chain runs in one kernel whose output is (B,) — the
signal never leaves VMEM. The trick is that the observation and noise
fold into the LAST layer's constants, so the kernel is just the fused
MLP with a per-row sum-of-squares tail:

* ``unpreproc`` is affine (``y·std + mean``) after a *linear* output
  layer → fold into (W, b) (as :func:`fold_emulator_constants` does);
* subtracting ``obs`` is a bias shift: ``b ← b − obs``;
* per-bin noise weighting ``(·)/σ_i²`` is a column scale by
  ``1/σ_i``: ``W ← W·s``, ``b ← b·s`` with ``s = 1/σ``.

After folding, ``pred − obs`` scaled by ``1/σ`` *is* the network output
``r = h@W″ + b″`` and the log-likelihood is ``-0.5·‖r‖²`` — computed
in-register and reduced to one lane per row before touching HBM.

The same folding also serves the XLA comparison path
(:func:`tpu21cmvae.ops.loglik.make_loglik`), which this kernel is
benchmarked against (bench_mcmc.py; measured numbers in docs/PERF.md).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu21cmvae.ops.mlp import MLPParams
from tpu21cmvae.ops.pallas.fused_mlp import (
    fold_emulator_constants,
    make_fused_mlp,
)
from tpu21cmvae.ops.transforms import Normalizer
from tpu21cmvae.utils.config import DirectEmulatorConfig

# The (B,) output removes the double-buffered (rows, 451) output block
# from the VMEM budget, so the row tile can be larger than the plain
# fused kernel's — fewer grid steps, better MXU occupancy per step.
# 2048 rows at exact-f32 needs ~18 MB scoped VMEM (activations + matmul
# stack), above the compiler's 16 MB default — raised via
# ``vmem_limit_bytes`` below (v5e has far more physical VMEM).
DEFAULT_LOGLIK_BLOCK_ROWS = 2048
DEFAULT_LOGLIK_VMEM_LIMIT = 100 * 1024 * 1024


def noise_scale(noise_var, n_bins: int) -> jax.Array:
    """Per-bin 1/σ column scale from a scalar variance or a (n_bins,)
    per-bin variance vector."""
    nv = jnp.asarray(noise_var, jnp.float32)
    return jnp.broadcast_to(jax.lax.rsqrt(nv), (n_bins,))


def fold_loglik_constants(
    params: MLPParams, norm: Normalizer, obs: jax.Array, scale: jax.Array
) -> MLPParams:
    """Fold normalization + observation + noise into the weight pytree.

    On top of :func:`fold_emulator_constants` (par-affine into the first
    layer, unpreproc into the last), shift the last bias by ``-obs`` and
    scale the last layer's columns by ``scale = 1/σ`` — exact, since the
    output layer is linear. The folded network's output is the
    noise-whitened residual ``(pred − obs)/σ``.
    """
    folded = fold_emulator_constants(params, norm)
    *rest, last = folded
    return (
        *rest,
        {"w": last["w"] * scale, "b": (last["b"] - obs) * scale},
    )


def make_fused_loglik(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    obs,
    noise_var=1.0,
    *,
    block_rows: int = DEFAULT_LOGLIK_BLOCK_ROWS,
    interpret: Optional[bool] = None,
    precision="high",
    vmem_limit_bytes: Optional[int] = DEFAULT_LOGLIK_VMEM_LIMIT,
):
    """Fused Gaussian log-likelihood: ``(params, raw_params) → (B,)``.

    ``obs``: the observed signal in mK, shape (n_bins,). ``noise_var``:
    scalar or per-bin noise variance σ² in mK². Returns
    ``-0.5·Σ_bins (emulate(raw) − obs)²/σ²`` per row — a drop-in for the
    composed XLA likelihood (``tpu21cmvae.ops.loglik.make_loglik``), jit
    the result for dispatch.

    ``precision`` defaults to ``"high"`` (in-kernel manual bf16x3): the
    accuracy-gated fast tier, ~1e-4 relative-to-amplitude on trained
    weights. ``"highest"`` gives the exact-f32 contract tier.
    """
    if config.activation != "relu":  # kernel hard-codes ReLU hidden layers
        raise NotImplementedError(
            "Fused kernel supports the reference's relu MLPs only; got "
            f"activation={config.activation!r}"
        )
    obs = jnp.asarray(obs, jnp.float32)
    scale = noise_scale(noise_var, config.n_bins)
    mlp = make_fused_mlp(
        config.mlp().sizes,
        block_rows=block_rows,
        log_clamp_input=True,
        interpret=interpret,
        precision=precision,
        reduce="sumsq",
        vmem_limit_bytes=vmem_limit_bytes,
    )

    def loglik(params: MLPParams, raw_params: jax.Array) -> jax.Array:
        folded = fold_loglik_constants(params, norm, obs, scale)
        return -0.5 * mlp(folded, raw_params.astype(jnp.float32))

    return loglik
