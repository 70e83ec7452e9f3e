"""Evaluation metrics for emulated global signals.

Host-side (NumPy) utilities — evaluation happens on prediction results
after the device call, so there is no need for these to be traceable.

Capability parity with the reference's ``error`` (Eq. 1 of Bye et al. 2022,
reference ``emulator.py:129-192``), with two deliberate fixes:

* band bounds are tested with ``is not None`` rather than truthiness, so
  ``flow=0`` is a valid lower bound (the reference's ``if flow or fhigh``
  at ``emulator.py:168,177`` silently ignores a zero bound);
* band selection uses a boolean mask instead of a column of ``argwhere``
  indices, so single-bound selections do not warp the array shape
  (reference ``emulator.py:180-182`` indexes with a (k, 1) array).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def error(
    true_signal,
    pred_signal,
    relative: bool = True,
    nu_arr: Optional[np.ndarray] = None,
    flow: Optional[float] = None,
    fhigh: Optional[float] = None,
) -> np.ndarray:
    """Per-signal RMSE between true and predicted signals.

    Parameters
    ----------
    true_signal, pred_signal : array_like, shape (n, bins) or (bins,)
        True and predicted signals (rows are signals).
    relative : bool
        If True, divide each RMSE by the max |amplitude| of the true
        signal in the selected band and express as a percent
        (reference ``emulator.py:189-191``); else return mK.
    nu_arr : array or None
        Frequency axis for band selection.
    flow, fhigh : float or None
        Inclusive band bounds in the units of ``nu_arr``.

    Returns
    -------
    err : np.ndarray, shape (n,)
        One error per signal (scalar array for a single 1-D signal pair).

    Raises
    ------
    ValueError
        If a band bound is given without ``nu_arr``
        (reference ``emulator.py:168-171``).
    """
    true_signal = np.asarray(true_signal)
    pred_signal = np.asarray(pred_signal)
    band = flow is not None or fhigh is not None
    if band and nu_arr is None:
        raise ValueError(
            "No frequency array is given, cannot compute error in the "
            "specified frequency band."
        )
    # promote each side independently: a squeezed single-row prediction
    # against a (1, bins) truth must still reduce over the bin axis
    squeeze = pred_signal.ndim == 1 and true_signal.ndim == 1
    pred_signal = np.atleast_2d(pred_signal)
    true_signal = np.atleast_2d(true_signal)

    if band:
        mask = band_mask(nu_arr, flow, fhigh)
        pred_signal = pred_signal[:, mask]
        true_signal = true_signal[:, mask]

    err = np.sqrt(np.mean((pred_signal - true_signal) ** 2, axis=1))
    if relative:
        err = err / np.max(np.abs(true_signal), axis=1) * 100.0
    return err[0] if squeeze else err


def band_mask(nu_arr, flow=None, fhigh=None) -> np.ndarray:
    """Boolean frequency-band mask (inclusive bounds; ``flow=0`` valid)."""
    nu_arr = np.asarray(nu_arr)
    mask = np.ones(nu_arr.shape, dtype=bool)
    if flow is not None:
        mask &= nu_arr >= flow
    if fhigh is not None:
        mask &= nu_arr <= fhigh
    return mask


def error_jnp(true_signal, pred_signal, relative: bool = True, mask=None):
    """Traceable (jit/vmap/grad-safe) version of :func:`error` for
    on-device evaluation inside jitted pipelines (sharded eval, tuner
    loops, differentiable metrics).

    ``mask``: optional (bins,) boolean/0-1 band mask from
    :func:`band_mask` (static under jit). Returns per-signal errors with
    the same semantics as :func:`error`.
    """
    import jax.numpy as jnp

    true_signal = jnp.atleast_2d(true_signal)
    pred_signal = jnp.atleast_2d(pred_signal)
    if mask is not None:
        w = jnp.asarray(mask, true_signal.dtype)
        n = jnp.sum(w)
        sq = (pred_signal - true_signal) ** 2 * w
        err = jnp.sqrt(jnp.sum(sq, axis=1) / n)
        amp = jnp.max(jnp.abs(true_signal) * w, axis=1)
    else:
        err = jnp.sqrt(jnp.mean((pred_signal - true_signal) ** 2, axis=1))
        amp = jnp.max(jnp.abs(true_signal), axis=1)
    if relative:
        err = err / amp * 100.0
    return err
