"""Fused whole-network emulator forward pass as one Pallas TPU kernel.

The flagship inference chain is ``par_transform → 5-layer MLP → unpreproc``
(reference call stack: ``emulator.py:383-407``; SURVEY.md §3.3). All three
stages collapse into a single kernel here:

* the affine part of ``par_transform`` (map the log-space training range
  onto [-1, 1]) is **folded into the first layer's weights** — an affine
  map feeding a linear layer is just a different linear layer;
* ``unpreproc`` (× global std, + per-bin mean) is **folded into the last
  (linear) layer's weights** the same way;
* only the non-linear log10/clamp on the first three parameter columns
  (reference ``preprocess.py:74-76``) remains as elementwise work.

So the kernel body is: log-clamp → matmul/bias/ReLU ×4 → matmul/bias.
All weights (~1.8 MB padded f32 for the 372k-param flagship) live in VMEM
for the whole grid; the batch streams through in row tiles, double-
buffered by the Pallas pipeline. The MXU sees five back-to-back matmuls
per tile with zero HBM traffic for intermediates.

On non-TPU backends the kernel runs in interpreter mode (slow, exact) so
parity tests run everywhere; production dispatch goes through
:func:`make_fused_emulate`, which the benchmark compares against the XLA
path and uses only if faster.

Measured verdict (v5e, 1M-row batches, amortized pipelined timing —
full tables in docs/PERF.md): the workload is **MXU-pass-bound, not
HBM-bound** (forcing bf16 inter-layer storage on the XLA path made it
*slower*), so fusion's usual win — keeping activations out of HBM —
buys little. Three in-kernel optimizations (skinny first layer on the
VPU, the bf16x3 products stacked into one matmul, interleaved
independent sub-chains) bring the kernel within a few percent of XLA at
the accuracy-gated bf16x3 tier, but XLA's matmul codegen stays narrowly
ahead on these shapes. The kernel ships as the native-layer capability
(benchmarked and parity-gated, auto-selected only when fastest); the
production fast path remains the XLA bf16x3 tier, chosen by
measurement in bench.py / bench_mcmc.py on every run.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu21cmvae.ops.mlp import MLPParams
from tpu21cmvae.ops.transforms import _FX_CLAMP, _N_LOG_COLS, Normalizer
from tpu21cmvae.utils.config import DirectEmulatorConfig

DEFAULT_BLOCK_ROWS = 1024

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
    # the exact-f32 accuracy-contract tier under its contract name —
    # the documented escape hatch wherever a fast tier's measured error
    # bound is not acceptable (e.g. near-mode |ΔlogL| — see
    # DirectEmulator.loglik_fn)
    "contract": jax.lax.Precision.HIGHEST,
}


def resolve_precision(precision) -> jax.lax.Precision:
    """Matmul precision tier. On TPU f32 matmuls decompose into bf16 MXU
    passes: DEFAULT=1, HIGH=3 (bf16x3), HIGHEST=6 (exact f32; the
    contract tier used by the XLA reference path).

    Accuracy caution (measured on v5e): on *trained* weights — which have
    far more cancellation than random init — single-pass bf16 is ~1.4e-2
    relative-to-amplitude, outside the 0.34 % contract; bf16x3 is ~1e-4
    (safe). Mosaic's dot lowering supports only DEFAULT and HIGHEST;
    kernels here implement the HIGH tier via a *manual* hi/lo bf16x3
    decomposition (see :func:`_mlp_kernel`), so all three tiers are
    available fused.
    """
    if isinstance(precision, str):
        return _PRECISIONS[precision.lower()]
    return precision


def fold_emulator_constants(params: MLPParams, norm: Normalizer) -> MLPParams:
    """Fold the normalization constants into the first/last layer weights.

    ``par_transform``'s affine stage is ``x ↦ a·x_log + c`` with per-column
    ``a = 2/(max−min)``, ``c = −(max+min)/(max−min)`` (reference
    ``preprocess.py:100-108``); feeding a linear layer ``x@W + b`` this is
    ``x_log @ (a[:,None]·W) + (c@W + b)``. ``unpreproc`` is
    ``y ↦ y·std + mean`` (reference ``preprocess.py:27-46``) after a
    *linear* output layer, so ``W' = W·std``, ``b' = b·std + mean``.

    Cheap (runs on the small weight arrays under jit, re-folded per call),
    and exact: the folded network computes bit-identically structured
    matmuls, just with different constants.
    """
    a = 2.0 / (norm.par_max - norm.par_min)
    c = -(norm.par_max + norm.par_min) / (norm.par_max - norm.par_min)
    if len(params) == 1:  # no hidden layers: both folds land on one layer
        (only,) = params
        w = a[:, None] * only["w"]
        b = c @ only["w"] + only["b"]
        return (
            {"w": w * norm.signal_std, "b": b * norm.signal_std + norm.signal_mean},
        )
    first, *mid, last = params
    first = {
        "w": a[:, None] * first["w"],
        "b": c @ first["w"] + first["b"],
    }
    last = {
        "w": last["w"] * norm.signal_std,
        "b": last["b"] * norm.signal_std + norm.signal_mean,
    }
    return (first, *mid, last)


def _log_clamp(x: jax.Array) -> jax.Array:
    """log10 on columns 0..2 with the ``fx == 0 → 1e-6`` clamp
    (reference ``preprocess.py:74-76``); other columns pass through."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    is_log = col < _N_LOG_COLS
    is_fx = col == _N_LOG_COLS - 1
    clamped = jnp.where(is_fx & (x == 0.0), _FX_CLAMP, x)
    return jnp.where(is_log, jnp.log10(jnp.where(is_log, clamped, 1.0)), x)


_LN10 = 2.302585092994046


def _log_clamp_grad(x: jax.Array) -> jax.Array:
    """Elementwise derivative of :func:`_log_clamp` — ``1/(x·ln10)`` on
    the log columns (0 where the ``fx == 0`` clamp fired, matching
    autodiff through the ``where``), 1 elsewhere. Shared by the analytic
    and fused likelihood backward passes (:mod:`tpu21cmvae.ops.loglik`,
    :mod:`tpu21cmvae.ops.pallas.fused_loglik`)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    is_log = col < _N_LOG_COLS
    clamp_fired = (col == _N_LOG_COLS - 1) & (x == 0.0)
    safe = jnp.where(is_log & ~clamp_fired, x, 1.0)
    d = jnp.where(is_log, 1.0 / (safe * _LN10), 1.0)
    return jnp.where(clamp_fired, 0.0, d)


def _split_hi_lo(x: jax.Array):
    """Decompose f32 into (hi, lo) bf16 halves with x ≈ hi + lo.

    ``hi`` is x with the low 16 mantissa bits masked off — exactly
    representable in bf16 — and ``lo`` is the masked-off remainder,
    exact in f32 and rounded once by the bf16 cast. The bf16x3 product
    then computes ``hi·hi + hi·lo + lo·hi`` (dropping the O(2⁻³²) lo·lo
    term) — the decomposition XLA uses for ``Precision.HIGH``, which
    Mosaic's dot lowering lacks.

    The split is done by integer masking rather than a
    ``f32→bf16→f32`` cast round-trip: measured on v5e, the cast form
    left the whole tier at single-pass accuracy (1.4e-2
    relative-to-amplitude on trained weights — the compiler folds the
    widening cast back into the source value, so ``lo`` collapses to
    zero), while the masked split restores genuine bf16x3 accuracy.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


def _refs_per_layer(mode: str) -> int:
    return 3 if mode == "bf16x3" else 2  # bf16x3s pre-stacks into one w


def _mlp_kernel(
    layer_modes, log_clamp_input: bool, precision, reduce, interleave, *refs
):
    """Kernel body: [log-clamp] → (matmul+bias, ReLU)ⁿ⁻¹ → matmul+bias
    [→ per-row Σy²].

    ``refs`` = (x_ref, <layer refs>…, out_ref); per-layer refs are
    (w, b) — or (w_hi, w_lo, b) in bf16x3 mode. Biases are (1, out) so
    every operand is ≥2-D (TPU tiling). Accumulation is always f32
    (``preferred_element_type``).

    ``layer_modes`` (one per layer):
      * ``"f32"`` — f32 operands; ``precision`` picks the number of bf16
        MXU passes per matmul (DEFAULT=1, HIGHEST=6).
      * ``"bf16"`` — activations cast to bf16 before each matmul (weights
        already bf16 in VMEM): native single-pass MXU feed.
      * ``"bf16x3"`` — manual hi/lo decomposition of activations against
        pre-split hi/lo weights: 3 single-pass bf16 matmuls per layer,
        f32 accumulation. Same accuracy class as XLA ``Precision.HIGH``
        (~1e-4 relative-to-amplitude on trained weights — inside the
        accuracy contract), at half the MXU passes of HIGHEST.
      * ``"skinny"`` — VPU broadcast-FMA over a small static fan-in
        (exact f32, no MXU pass at all; the 7-wide input layer wastes
        ~18× its logical FLOPs on a padded MXU tile).

    ``reduce="sumsq"`` ends the network with ``Σ_bins y²`` per row into a
    (rows, 1) output instead of writing the (rows, n_bins) signal — the
    log-likelihood tail (obs/noise pre-folded into the last layer by
    :func:`tpu21cmvae.ops.pallas.fused_loglik.fold_loglik_constants`).
    This shrinks the kernel's HBM output traffic by n_bins× — the whole
    point of fusing the MCMC likelihood.

    ``interleave`` splits the row block into that many independent
    sub-chains emitted back to back: the chains share no values, so the
    Mosaic scheduler overlaps one chain's VPU work (log-clamp, skinny
    layer, hi/lo splits, ReLU) with another's MXU passes — measured
    +5 % at interleave=4 (docs/PERF.md).
    """
    x_ref, *wb, out_ref = refs
    n_layers = len(layer_modes)

    def chain(h):
        if log_clamp_input:
            h = _log_clamp(h)
        lo = 0
        for i, lmode in enumerate(layer_modes):
            hi = lo + _refs_per_layer(lmode)
            h = _layer_matmul(h, wb[lo:hi], lmode, precision)
            lo = hi
            if i < n_layers - 1:
                h = jnp.maximum(h, 0.0)
        if reduce == "sumsq":
            return jnp.sum(h * h, axis=1, keepdims=True)
        return h

    rows = x_ref.shape[0] // interleave
    for s in range(interleave):
        sl = slice(s * rows, (s + 1) * rows)
        out_ref[sl, :] = chain(x_ref[sl, :])


def _dot_refs(h, wrefs, mode, precision):
    """``h @ W`` (no bias) on a layer's weight refs, f32 accumulation.

    ``wrefs`` is (w,) — or (w_hi, w_lo) in bf16x3 mode, where the
    product is ``hi·hi + hi·lo + lo·hi`` with in-kernel activation
    splitting (see :func:`_split_hi_lo`). ``"skinny"`` unrolls the
    (static, small) fan-in as broadcast multiply-adds on the VPU.
    Shared by the forward layers, the gram head, and the fused backward
    pass (which runs the same modes on pre-transposed weights).
    """
    if mode == "bf16x3":
        w_hi, w_lo = (r[:] for r in wrefs)
        h_hi, h_lo = _split_hi_lo(h)
        return (
            jnp.dot(h_hi, w_hi, preferred_element_type=jnp.float32)
            + jnp.dot(h_hi, w_lo, preferred_element_type=jnp.float32)
            + jnp.dot(h_lo, w_hi, preferred_element_type=jnp.float32)
        )
    if mode == "bf16x3s":
        # same three products as bf16x3 but STACKED along the
        # contraction dim into one MXU matmul: [hi, hi, lo] @ [Whi; Wlo;
        # Whi]. One large dot schedules better than three skinny ones
        # and wastes less tile padding (e.g. K=288: 3×384-padded passes
        # → one 896-padded pass).
        w3 = wrefs[0][:]
        h_hi, h_lo = _split_hi_lo(h)
        h3 = jnp.concatenate([h_hi, h_hi, h_lo], axis=1)
        return jnp.dot(h3, w3, preferred_element_type=jnp.float32)
    if mode == "skinny":
        (w,) = wrefs
        acc = h[:, 0:1] * w[0:1, :]
        for k in range(1, w.shape[0]):
            acc = acc + h[:, k: k + 1] * w[k: k + 1, :]
        return acc
    w = wrefs[0][:]
    if mode == "bf16":
        h = h.astype(jnp.bfloat16)
    return jnp.dot(
        h, w, preferred_element_type=jnp.float32, precision=precision
    )


def _layer_matmul(h, refs, mode, precision):
    """One dense layer ``h @ W + b``: :func:`_dot_refs` plus the bias
    (always the layer's last ref, shape (1, out))."""
    return _dot_refs(h, refs[:-1], mode, precision) + refs[-1][:]


def resolve_mode(precision, weight_dtype=jnp.float32):
    """Map a precision tier + weight dtype to (kernel mode, dot
    precision) — shared by every fused-kernel builder.

    The HIGH tier lowers to the STACKED bf16x3 form by default: the
    three products run as one MXU matmul over the 3K contraction
    (``[hi, hi, lo] @ [Whi; Wlo; Whi]``) — measured ~7 % faster than
    three separate dots at identical accuracy (docs/PERF.md). The
    three-dot form stays reachable as ``"high-split"`` for A/B."""
    if isinstance(precision, str):
        p = precision.lower().replace("_", "-")
        if p == "high-split":
            return "bf16x3", jax.lax.Precision.DEFAULT
        if p == "high-stacked":
            return "bf16x3s", jax.lax.Precision.DEFAULT
    prec = resolve_precision(precision)
    if prec == jax.lax.Precision.HIGH:
        return "bf16x3s", jax.lax.Precision.DEFAULT
    return ("bf16" if weight_dtype == jnp.bfloat16 else "f32"), prec


def layer_mode_plan(sizes, precision, weight_dtype=jnp.float32):
    """Per-layer kernel modes + dot precision for an MLP of ``sizes``:
    the tier's mode everywhere, except a skinny-fan-in first layer which
    always runs as exact VPU broadcast-FMA (measured +8 % and an
    accuracy improvement at every tier — docs/PERF.md)."""
    from tpu21cmvae.ops.mlp import SKINNY_DENSE_MAX_IN

    mode, prec = resolve_mode(precision, weight_dtype)
    modes = tuple(
        "skinny" if i == 0 and sizes[0] <= SKINNY_DENSE_MAX_IN else mode
        for i in range(len(sizes) - 1)
    )
    return modes, prec


# MXU passes per f32-equivalent matmul, for cost estimates
_PASSES = {"f32": {jax.lax.Precision.DEFAULT: 1,
                   jax.lax.Precision.HIGHEST: 6},
           "bf16": 1, "bf16x3": 3, "bf16x3s": 3, "skinny": 1}


def _layer_passes(mode, prec) -> int:
    p = _PASSES[mode]
    return p.get(prec, 1) if isinstance(p, dict) else p


def flatten_layer_weights(
    params: MLPParams, layer_modes, weight_dtype=jnp.float32
):
    """Flatten a weights pytree into the kernel's per-layer ref list
    ((w, b) or (w_hi, w_lo, b)), with the dtype casts applied."""
    flat = []
    for layer, lmode in zip(params, layer_modes):
        if lmode == "bf16x3":
            w_hi, w_lo = _split_hi_lo(layer["w"].astype(jnp.float32))
            flat.extend((w_hi, w_lo))
        elif lmode == "bf16x3s":
            w_hi, w_lo = _split_hi_lo(layer["w"].astype(jnp.float32))
            flat.append(jnp.concatenate([w_hi, w_lo, w_hi], axis=0))
        elif lmode == "skinny":  # exact f32 broadcast-FMA operand
            flat.append(layer["w"].astype(jnp.float32))
        else:
            flat.append(layer["w"].astype(weight_dtype))
        flat.append(layer["b"].reshape(1, -1).astype(jnp.float32))
    return flat


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def make_fused_mlp(
    sizes: Sequence[int],
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    log_clamp_input: bool = False,
    interpret: Optional[bool] = None,
    precision="highest",
    weight_dtype=jnp.float32,
    reduce: str = "none",
    vmem_limit_bytes: Optional[int] = None,
    interleave: int = 1,
):
    """Build ``fn(params, x) → y``: the whole MLP as one Pallas kernel.

    ``sizes = (in, *hidden, out)``; ReLU hidden activations, linear output
    (the only architecture the emulator families use — reference
    ``emulator.py:12-48``). The batch is tiled in ``block_rows`` chunks;
    weights and biases are unblocked VMEM residents. Arbitrary batch
    sizes are padded up to a tile boundary with ones (safe under the log
    transform) and sliced back.

    Precision tiers (see :func:`resolve_precision`):

    * ``"highest"`` — exact f32 (6 bf16 MXU passes): the contract tier.
    * ``"high"`` — manual in-kernel bf16x3 (3 passes): weights are
      pre-split into hi/lo bf16 halves per call, activations split
      in-kernel. Accuracy class of XLA ``Precision.HIGH`` (~1e-4
      relative-to-amplitude on trained weights — inside the contract).
    * ``"default"`` with ``weight_dtype=jnp.bfloat16`` — native
      single-pass bf16 operands with f32 accumulation: fastest, but
      ~1.4e-2 relative-to-amplitude on trained weights — outside the
      0.34 % contract.

    ``reduce="sumsq"`` replaces the (n, out) signal output with the
    per-row sum of squares, shape (n,) — the fused log-likelihood tail.
    """
    sizes = tuple(int(s) for s in sizes)
    in_dim, out_dim = sizes[0], sizes[-1]
    if reduce not in ("none", "sumsq"):
        raise ValueError(f"reduce must be 'none' or 'sumsq'; got {reduce!r}")
    if block_rows % interleave:
        raise ValueError(
            f"interleave ({interleave}) must divide block_rows "
            f"({block_rows}) evenly"
        )
    if interpret is None:
        interpret = _should_interpret()
    layer_modes, prec = layer_mode_plan(sizes, precision, weight_dtype)

    kernel = functools.partial(
        _mlp_kernel, layer_modes, log_clamp_input, prec, reduce, interleave
    )
    flops_per_row = 2 * sum(
        _layer_passes(m, prec) * a * b
        for m, a, b in zip(layer_modes, sizes[:-1], sizes[1:])
    )
    _WBYTES = {"f32": 4, "skinny": 4, "bf16": 2, "bf16x3": 4, "bf16x3s": 6}
    weight_bytes = sum(
        _WBYTES[m] * (a + 1) * b
        for m, a, b in zip(layer_modes, sizes[:-1], sizes[1:])
    )
    out_cols = 1 if reduce == "sumsq" else out_dim

    wb_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM)
        for _ in range(sum(_refs_per_layer(m) for m in layer_modes))
    ]

    def call(params: MLPParams, x: jax.Array) -> jax.Array:
        if x.ndim == 1:  # single draw → one row (same as the XLA path)
            x = x[None, :]
        n = x.shape[0]
        nb = pl.cdiv(n, block_rows)
        padded = nb * block_rows
        if padded != n:
            x = jnp.pad(x, ((0, padded - n), (0, 0)), constant_values=1.0)
        flat = flatten_layer_weights(params, layer_modes, weight_dtype)
        out = pl.pallas_call(
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
                (block_rows, out_cols),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((padded, out_cols), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=padded * flops_per_row,
                bytes_accessed=4 * padded * (in_dim + out_cols) + weight_bytes,
                transcendentals=(
                    padded * _N_LOG_COLS if log_clamp_input else 0
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) if interpret else ("parallel",),
                # large row tiles with exact-f32 matmuls exceed the
                # compiler's default 16 MB scoped-VMEM budget; callers
                # opting into big blocks raise the cap explicitly
                vmem_limit_bytes=vmem_limit_bytes,
            ),
            interpret=interpret,
        )(x, *flat)
        out = out[:n] if padded != n else out
        return out[:, 0] if reduce == "sumsq" else out

    return call


def make_fused_emulate(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
    precision="highest",
    weight_dtype=jnp.float32,
    interleave: int = 1,
    vmem_limit_bytes: Optional[int] = None,
):
    """Fused flagship inference: ``(params, raw_params) → signals`` in mK.

    Drop-in for the XLA path built by ``DirectEmulator.predict_fn()``
    (same signature, same unfolded ``params`` pytree): the normalization
    constants are folded into the weights under jit, then the single
    fused kernel runs the whole chain. Jit the result for dispatch.
    """
    if config.activation != "relu":  # kernel hard-codes ReLU hidden layers
        raise NotImplementedError(
            "Fused kernel supports the reference's relu MLPs only; got "
            f"activation={config.activation!r}"
        )
    mlp = make_fused_mlp(
        config.mlp().sizes,
        block_rows=block_rows,
        log_clamp_input=True,
        interpret=interpret,
        precision=precision,
        weight_dtype=weight_dtype,
        interleave=interleave,
        vmem_limit_bytes=vmem_limit_bytes,
    )

    def emulate(params: MLPParams, raw_params: jax.Array) -> jax.Array:
        folded = fold_emulator_constants(params, norm)
        return mlp(folded, raw_params.astype(jnp.float32))

    return emulate
