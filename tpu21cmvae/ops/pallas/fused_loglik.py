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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu21cmvae.ops.mlp import MLPParams
from tpu21cmvae.ops.pallas.fused_mlp import (
    _dot_refs,
    _layer_matmul,
    _log_clamp,
    _log_clamp_grad,
    _refs_per_layer,
    _should_interpret,
    _split_hi_lo,
    flatten_layer_weights,
    fold_emulator_constants,
    layer_mode_plan,
    make_fused_mlp,
    resolve_mode,
)
from tpu21cmvae.ops.transforms import Normalizer
from tpu21cmvae.utils.config import DirectEmulatorConfig

# The (B,) output removes the double-buffered (rows, 451) output block
# from the VMEM budget, so the row tile can be larger than the plain
# fused kernel's — fewer grid steps, better MXU occupancy per step.
# 2048 rows at exact-f32 needs ~18 MB scoped VMEM (activations + matmul
# stack), above the compiler's 16 MB default — raised via
# ``vmem_limit_bytes`` below (v5e has far more physical VMEM).
# Each block runs as 4 independent 512-row sub-chains so Mosaic can
# overlap one chain's VPU work with another's MXU passes (measured
# ~+5 %; sweep in docs/PERF.md).
DEFAULT_LOGLIK_BLOCK_ROWS = 2048
DEFAULT_LOGLIK_INTERLEAVE = 4
DEFAULT_LOGLIK_VMEM_LIMIT = 110 * 1024 * 1024


def noise_scale(noise_var, n_bins: int) -> jax.Array:
    """Residual-whitening operator from a noise spec: per-bin ``1/σ``
    column scale (1-D) from a scalar or ``(n_bins,)`` variance, or the
    precomputed ``(n_bins, n_bins)`` factor ``R`` with ``P = R·Rᵀ``
    from a foreground-marginalized noise model
    (:class:`tpu21cmvae.foregrounds.MarginalizedNoise`). Both fold into
    the emulator's linear output layer
    (:func:`fold_loglik_constants`), so every downstream path — gram,
    fused kernels, analytic gradient — is whitening-agnostic."""
    from tpu21cmvae.foregrounds import MarginalizedNoise

    if isinstance(noise_var, MarginalizedNoise):
        w = jnp.asarray(noise_var.whiten, jnp.float32)
        if w.shape != (n_bins, n_bins):
            raise ValueError(
                f"MarginalizedNoise built for {w.shape[0]} bins; the "
                f"model has {n_bins}"
            )
        return w
    nv = jnp.asarray(noise_var, jnp.float32)
    return jnp.broadcast_to(jax.lax.rsqrt(nv), (n_bins,))


def noise_log_norm(noise_var) -> float:
    """θ-independent additive log-likelihood constant of a noise spec
    (0 for plain diagonal noise; the marginal-density normalization for
    :class:`~tpu21cmvae.foregrounds.MarginalizedNoise`). Irrelevant to
    posterior sampling; required for comparable evidences."""
    from tpu21cmvae.foregrounds import MarginalizedNoise

    if isinstance(noise_var, MarginalizedNoise):
        return float(noise_var.log_norm)
    return 0.0


def fold_loglik_constants(
    params: MLPParams, norm: Normalizer, obs: jax.Array, scale: jax.Array
) -> MLPParams:
    """Fold normalization + observation + noise into the weight pytree.

    On top of :func:`fold_emulator_constants` (par-affine into the first
    layer, unpreproc into the last), shift the last bias by ``-obs`` and
    whiten the last layer — exact, since the output layer is linear.
    ``scale`` is :func:`noise_scale`'s operator: a per-bin ``1/σ``
    column scale (diagonal noise) or a full ``(n_bins, n_bins)`` factor
    ``R`` (foreground-marginalized noise, ``P = R·Rᵀ`` — the fold
    ``W @ R`` makes marginalization free per sample). Either way the
    folded network's output has ``‖out‖² = rᵀ·P·r``.
    """
    folded = fold_emulator_constants(params, norm)
    *rest, last = folded
    if scale.ndim == 2:
        hp = jax.lax.Precision.HIGHEST
        return (
            *rest,
            {"w": jnp.matmul(last["w"], scale, precision=hp),
             "b": jnp.matmul(last["b"] - obs, scale, precision=hp)},
        )
    return (
        *rest,
        {"w": last["w"] * scale, "b": (last["b"] - obs) * scale},
    )


def gram_fold(
    params: MLPParams, norm: Normalizer, obs: jax.Array, scale: jax.Array
):
    """Collapse the (linear) output layer into a Gram form.

    With the folded last layer ``r = h@W + b`` (see
    :func:`fold_loglik_constants`), the squared residual norm is

        ‖r‖² = h·(W Wᵀ)·hᵀ + 2·h·(W b) + b·b

    so the 451-wide output never needs to exist: the kernel's last
    matmul shrinks from (hidden, n_bins) to (hidden, hidden) — for the
    flagship, 224×451 → 224×224, i.e. half the padded MXU work of the
    widest layer. ``G = W Wᵀ`` etc. are computed once per call at
    HIGHEST precision on the tiny weight arrays.

    Numerical caveat: the Gram form evaluates ‖r‖² as a difference of
    large terms (each ~‖h@W‖², vs the result ~‖r‖²), so it loses
    ~log₁₀(‖pred − mean‖/‖r‖) digits to cancellation near the posterior
    mode. Measured error tables in docs/PERF.md; the bench gate decides
    admissibility on a trained model.

    Returns ``(trunk_layers, G, u, c)``.
    """
    folded = fold_loglik_constants(params, norm, obs, scale)
    *trunk, last = folded
    w, b = last["w"], last["b"]
    hp = jax.lax.Precision.HIGHEST
    G = jnp.matmul(w, w.T, precision=hp)
    u = jnp.matmul(w, b, precision=hp)
    c = jnp.dot(b, b, precision=hp)
    return tuple(trunk), G, u, c


def _loglik_gram_kernel(trunk_modes, mode, precision, interleave, *refs):
    """[log-clamp] → (matmul+bias, ReLU)ⁿ → per-row quadratic form.

    ``refs`` = (x, <trunk layer refs>, <G refs>, u, out); G refs are
    (G,) or (G_hi, G_lo) in bf16x3 mode; ``u`` is (1, hidden). Every
    trunk layer is a hidden layer (ReLU after each); ``trunk_modes``
    gives each layer's kernel mode (the first is ``"skinny"`` for the
    7-wide input — see :func:`fused_mlp.layer_mode_plan`). The tail
    computes ``Σ_j (h@G + 2u)_j · h_j`` per row; the caller adds the
    constant ``c = b·b`` and the −0.5 scale.
    """
    n_g = 2 if mode == "bf16x3" else 1
    n_wb = sum(_refs_per_layer(m) for m in trunk_modes)
    x_ref, *rest, out_ref = refs
    wb, g_refs, u_ref = rest[:n_wb], rest[n_wb: n_wb + n_g], rest[-1]

    def chain(h):
        h = _log_clamp(h)
        lo = 0
        for lmode in trunk_modes:
            hi = lo + _refs_per_layer(lmode)
            h = jnp.maximum(
                _layer_matmul(h, wb[lo:hi], lmode, precision), 0.0
            )
            lo = hi
        g = _dot_refs(h, g_refs, mode, precision)
        return jnp.sum((g + 2.0 * u_ref[:]) * h, axis=1, keepdims=True)

    rows = x_ref.shape[0] // interleave
    for s in range(interleave):
        sl = slice(s * rows, (s + 1) * rows)
        out_ref[sl, :] = chain(x_ref[sl, :])


def make_fused_loglik_gram(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    obs,
    noise_var=1.0,
    *,
    block_rows: int = DEFAULT_LOGLIK_BLOCK_ROWS,
    interpret: Optional[bool] = None,
    precision="high",
    vmem_limit_bytes: Optional[int] = DEFAULT_LOGLIK_VMEM_LIMIT,
    interleave: int = DEFAULT_LOGLIK_INTERLEAVE,
):
    """Gram-form fused likelihood: ``(params, raw_params) → (B,)``.

    Same contract as :func:`make_fused_loglik`, but the output layer is
    collapsed via :func:`gram_fold` — fewer MXU FLOPs per row at the
    price of quadratic-form cancellation (docs/PERF.md)."""
    if config.activation != "relu":
        raise NotImplementedError(
            "Fused kernel supports the reference's relu MLPs only; got "
            f"activation={config.activation!r}"
        )
    obs = jnp.asarray(obs, jnp.float32)
    scale = noise_scale(noise_var, config.n_bins)
    log_norm = noise_log_norm(noise_var)
    sizes = config.mlp().sizes
    hidden = sizes[-2]
    in_dim = sizes[0]
    if interpret is None:
        interpret = _should_interpret()
    if block_rows % interleave:
        raise ValueError(
            f"interleave ({interleave}) must divide block_rows "
            f"({block_rows}) evenly"
        )
    # trunk = sizes[:-1]; the skinny first layer runs as VPU FMA
    trunk_modes, prec = layer_mode_plan(sizes[:-1], precision)
    mode, _ = resolve_mode(precision)
    kernel = functools.partial(
        _loglik_gram_kernel, trunk_modes, mode, prec, interleave
    )

    n_weight_refs = (
        sum(_refs_per_layer(m) for m in trunk_modes)
        + (2 if mode == "bf16x3" else 1)  # G (or its hi/lo halves)
        + 1  # u
    )
    wb_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weight_refs)
    ]
    flops_per_row = 2 * (
        sum(a * b for a, b in zip(sizes[:-2], sizes[1:-1])) + hidden * hidden
    )

    def loglik(params: MLPParams, raw_params: jax.Array) -> jax.Array:
        trunk, G, u, c = gram_fold(params, norm, obs, scale)
        x = raw_params.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        n = x.shape[0]
        nb = pl.cdiv(n, block_rows)
        padded = nb * block_rows
        if padded != n:
            x = jnp.pad(x, ((0, padded - n), (0, 0)), constant_values=1.0)
        flat = flatten_layer_weights(trunk, trunk_modes)
        if mode == "bf16x3":
            flat.extend(_split_hi_lo(G))
        elif mode == "bf16x3s":
            g_hi, g_lo = _split_hi_lo(G)
            flat.append(jnp.concatenate([g_hi, g_lo, g_hi], axis=0))
        else:
            flat.append(G)
        flat.append(u.reshape(1, -1))
        quad = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (block_rows, in_dim),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                *wb_specs,
            ],
            out_specs=pl.BlockSpec(
                (block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=padded * flops_per_row,
                bytes_accessed=4 * padded * (in_dim + 1),
                transcendentals=padded * 3,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    ("arbitrary",) if interpret else ("parallel",)
                ),
                vmem_limit_bytes=vmem_limit_bytes,
            ),
            interpret=interpret,
        )(x, *flat)
        quad = quad[:n, 0] if padded != n else quad[:, 0]
        return -0.5 * (quad + c) + log_norm

    return loglik


# Value+grad kernel: the live set per sub-chain additionally holds every
# trunk activation (for the in-kernel backward) and the transposed
# weights, so the default row block is half the forward-only kernel's.
# Config from the v5e in-process A/B sweep (block 512-2048 x interleave
# 1-4, docs/PERF.md): 4-way interleave buys ~+3% (VPU/MXU overlap as in
# the forward kernels); block 1024 ties 2048 within tunnel noise and
# keeps the smaller VMEM footprint across tiers.
DEFAULT_GRAD_BLOCK_ROWS = 1024
DEFAULT_GRAD_INTERLEAVE = 4


def _wt_refs_per_layer(lmode: str, grad_mode: str) -> int:
    if lmode == "skinny":  # backward reuses the forward weight ref (VPU)
        return 0
    return 2 if grad_mode == "bf16x3" else 1


def _loglik_grad_gram_kernel(
    trunk_modes, mode, grad_mode, fwd_prec, bwd_prec, interleave, *refs
):
    """Forward gram chain AND its input-gradient in one kernel.

    ``refs`` = (x, <trunk wb refs>, <G refs>, u, <WTᵀ refs>, out_quad,
    out_grad). The forward is :func:`_loglik_gram_kernel`'s chain with
    every activation kept in VMEM; the backward then runs in-kernel —
    ReLU masks from the live activations, transposed-weight matmuls at
    the (independently tiered) ``grad_mode``, the skinny first layer as
    exact VPU lane reductions on the forward weight ref, and the gram
    head's gradient REUSING the forward's ``h@G`` product (G = WWᵀ is
    exactly symmetric, so ``d(h·G·hᵀ)/dh = 2(h@G)`` — no extra matmul).
    Composed in XLA the backward re-reads every stored (B, width)
    activation block from HBM; here nothing row-shaped ever leaves VMEM
    except the (rows, 1) value and (rows, n_in) gradient.

    Outputs: ``out_quad = ‖r‖² − b·b`` per row and ``out_grad = 0.5 ·
    d‖r‖²/dx`` — the caller applies the −0.5 likelihood scale to both.
    """
    n_g = 2 if mode == "bf16x3" else 1
    n_wb = sum(_refs_per_layer(m) for m in trunk_modes)
    n_wt_each = [_wt_refs_per_layer(m, grad_mode) for m in trunk_modes]
    x_ref, *rest, quad_ref, grad_ref = refs
    wb = rest[:n_wb]
    g_refs = rest[n_wb: n_wb + n_g]
    u_ref = rest[n_wb + n_g]
    wt = rest[n_wb + n_g + 1:]

    def chain(xs):
        h = _log_clamp(xs)
        acts = []
        lo = 0
        for lmode in trunk_modes:
            hi = lo + _refs_per_layer(lmode)
            h = jnp.maximum(
                _layer_matmul(h, wb[lo:hi], lmode, fwd_prec), 0.0
            )
            acts.append(h)
            lo = hi
        g1 = _dot_refs(h, g_refs, mode, fwd_prec)
        quad = jnp.sum((g1 + 2.0 * u_ref[:]) * h, axis=1, keepdims=True)
        # dquad/dh = 2·(g1 + u); carry the half, caller scales by −1
        e = g1 + u_ref[:]
        wb_pos, wt_pos = n_wb, len(wt)
        for i in range(len(trunk_modes) - 1, -1, -1):
            lmode = trunk_modes[i]
            wb_pos -= _refs_per_layer(lmode)
            wt_pos -= n_wt_each[i]
            e = jnp.where(acts[i] > 0.0, e, 0.0)  # ReLU mask, in VMEM
            if lmode == "skinny":
                w = wb[wb_pos][:]  # forward (n_in, out) weight, exact f32
                e = jnp.concatenate(
                    [
                        jnp.sum(e * w[j: j + 1, :], axis=1, keepdims=True)
                        for j in range(w.shape[0])
                    ],
                    axis=1,
                )
            else:
                e = _dot_refs(
                    e, wt[wt_pos: wt_pos + n_wt_each[i]], grad_mode, bwd_prec
                )
        return quad, _log_clamp_grad(xs) * e

    rows = x_ref.shape[0] // interleave
    for s in range(interleave):
        sl = slice(s * rows, (s + 1) * rows)
        q, dx = chain(x_ref[sl, :])
        quad_ref[sl, :] = q
        grad_ref[sl, :] = dx


def make_fused_loglik_grad_gram(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    obs,
    noise_var=1.0,
    *,
    block_rows: int = DEFAULT_GRAD_BLOCK_ROWS,
    interpret: Optional[bool] = None,
    precision="high",
    grad_precision=None,
    vmem_limit_bytes: Optional[int] = DEFAULT_LOGLIK_VMEM_LIMIT,
    interleave: int = DEFAULT_GRAD_INTERLEAVE,
):
    """Fused gram value-and-gradient: ``(params, raw) → (logL, dlogL/draw)``
    with shapes ``(B,), (B, n_params)`` — the HMC/NUTS inner loop as ONE
    kernel (see :func:`tpu21cmvae.ops.loglik.make_loglik_and_grad` for
    the XLA twins and the selection benchmark).

    ``precision`` tiers the forward (value) matmuls; ``grad_precision``
    (default: same tier) independently tiers the backward — gradient
    error only perturbs HMC's acceptance rate, never the posterior
    (leapfrog with any deterministic force field stays reversible and
    volume-preserving while the accept step uses the gated value), so a
    cheaper backward tier is admissible where the value tier is not.
    """
    if config.activation != "relu":
        raise NotImplementedError(
            "Fused kernel supports the reference's relu MLPs only; got "
            f"activation={config.activation!r}"
        )
    obs = jnp.asarray(obs, jnp.float32)
    scale = noise_scale(noise_var, config.n_bins)
    log_norm = noise_log_norm(noise_var)
    sizes = config.mlp().sizes
    hidden = sizes[-2]
    in_dim = sizes[0]
    if interpret is None:
        interpret = _should_interpret()
    if block_rows % interleave:
        raise ValueError(
            f"interleave ({interleave}) must divide block_rows "
            f"({block_rows}) evenly"
        )
    trunk_modes, fwd_prec = layer_mode_plan(sizes[:-1], precision)
    grad_mode, bwd_prec = resolve_mode(
        precision if grad_precision is None else grad_precision
    )
    mode, _ = resolve_mode(precision)
    kernel = functools.partial(
        _loglik_grad_gram_kernel,
        trunk_modes, mode, grad_mode, fwd_prec, bwd_prec, interleave,
    )

    n_weight_refs = (
        sum(_refs_per_layer(m) for m in trunk_modes)
        + (2 if mode == "bf16x3" else 1)  # G (or its hi/lo halves)
        + 1  # u
        + sum(_wt_refs_per_layer(m, grad_mode) for m in trunk_modes)
    )
    wb_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weight_refs)
    ]
    trunk_pairs = sum(a * b for a, b in zip(sizes[:-2], sizes[1:-1]))
    # fwd trunk + gram head + bwd trunk (≈ fwd trunk again)
    flops_per_row = 2 * (2 * trunk_pairs + hidden * hidden)

    def _flat_wt(w):
        wt = w.T
        if grad_mode == "bf16x3":
            return list(_split_hi_lo(wt))
        if grad_mode == "bf16x3s":
            hi, lo = _split_hi_lo(wt)
            return [jnp.concatenate([hi, lo, hi], axis=0)]
        if grad_mode == "bf16":
            return [wt.astype(jnp.bfloat16)]
        return [wt.astype(jnp.float32)]

    def loglik_grad(params: MLPParams, raw_params: jax.Array):
        trunk, G, u, c = gram_fold(params, norm, obs, scale)
        x = raw_params.astype(jnp.float32)
        if x.ndim == 1:
            x = x[None, :]
        n = x.shape[0]
        nb = pl.cdiv(n, block_rows)
        padded = nb * block_rows
        if padded != n:
            x = jnp.pad(x, ((0, padded - n), (0, 0)), constant_values=1.0)
        flat = flatten_layer_weights(trunk, trunk_modes)
        if mode == "bf16x3":
            flat.extend(_split_hi_lo(G))
        elif mode == "bf16x3s":
            g_hi, g_lo = _split_hi_lo(G)
            flat.append(jnp.concatenate([g_hi, g_lo, g_hi], axis=0))
        else:
            flat.append(G)
        flat.append(u.reshape(1, -1))
        for layer, lmode in zip(trunk, trunk_modes):
            if lmode != "skinny":
                flat.extend(_flat_wt(layer["w"]))
        quad, dx = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (block_rows, in_dim),
                    lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                *wb_specs,
            ],
            out_specs=[
                pl.BlockSpec(
                    (block_rows, 1), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (block_rows, in_dim), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((padded, 1), jnp.float32),
                jax.ShapeDtypeStruct((padded, in_dim), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=padded * flops_per_row,
                bytes_accessed=4 * padded * (2 * in_dim + 1),
                transcendentals=padded * 3,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    ("arbitrary",) if interpret else ("parallel",)
                ),
                vmem_limit_bytes=vmem_limit_bytes,
            ),
            interpret=interpret,
        )(x, *flat)
        return -0.5 * (quad[:n, 0] + c) + log_norm, -dx[:n]

    return loglik_grad


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
    interleave: int = DEFAULT_LOGLIK_INTERLEAVE,
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
        interleave=interleave,
    )

    log_norm = noise_log_norm(noise_var)

    def loglik(params: MLPParams, raw_params: jax.Array) -> jax.Array:
        folded = fold_loglik_constants(params, norm, obs, scale)
        return -0.5 * mlp(folded, raw_params.astype(jnp.float32)) + log_norm

    return loglik
