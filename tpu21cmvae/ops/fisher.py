"""Fisher-information forecasting for the emulated 21-cm signal.

The standard companion to MCMC for global-signal experiments: for a
Gaussian likelihood with per-bin noise variance σ², the Fisher matrix at
parameters θ is

    F_ij = Σ_bins  (∂T/∂θ_i)(∂T/∂θ_j) / σ²_bin,

whose inverse lower-bounds the parameter covariance (Cramér–Rao). The
reference has no gradients at all, so its users finite-difference the
~40 ms-per-call predict; here the Jacobian ∂T/∂θ is seven forward-mode
JVPs through the jitted predict chain — exact, fast, and vmappable over
batches of fiducials.

Numerical note: the first three parameters enter through log10 and the
Jacobian is taken with respect to the RAW parameters (the physical
ones), so F can be badly scaled; :func:`forecast_errors` solves with a
symmetric pseudo-inverse to stay robust near degeneracies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu21cmvae.ops.mlp import mlp_apply
from tpu21cmvae.ops.transforms import Normalizer, par_transform, unpreproc
from tpu21cmvae.utils.config import DirectEmulatorConfig


def make_signal_jacobian(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    precision=jax.lax.Precision.HIGHEST,
):
    """Build ``fn(params, theta) → (n_bins, n_params)``: ∂T/∂θ at one
    raw parameter vector (vmap it for batches). Forward-mode over the
    7 input parameters — 7 JVPs regardless of the 451 output bins."""
    activation = config.activation

    def predict_one(params, theta):
        x = par_transform(theta[None, :], norm)
        return unpreproc(
            mlp_apply(params, x, activation, precision=precision), norm
        )[0]

    def jacobian(params, theta):
        return jax.jacfwd(lambda t: predict_one(params, t))(
            theta.astype(jnp.float32)
        )

    return jacobian


def make_fisher(
    config: DirectEmulatorConfig,
    norm: Normalizer,
    noise_var=1.0,
    precision=jax.lax.Precision.HIGHEST,
):
    """Build ``fn(params, theta) → (n_params, n_params)`` Fisher matrix
    at a raw parameter vector; accepts scalar or per-bin σ² in mK²."""
    jac = make_signal_jacobian(config, norm, precision=precision)
    invvar = 1.0 / jnp.broadcast_to(
        jnp.asarray(noise_var, jnp.float32), (config.n_bins,)
    )

    def fisher(params, theta):
        J = jac(params, theta)  # (n_bins, n_params)
        return (J * invvar[:, None]).T @ J

    return fisher


def forecast_errors(F, rcond: float = 1e-12):
    """1-σ marginalized parameter uncertainties from a Fisher matrix:
    ``sqrt(diag(F⁻¹))`` via a symmetric eigendecomposition pseudo-
    inverse (robust to the near-degenerate directions this parameter
    space has). Works on a single (p, p) matrix or a batch (..., p, p).
    """
    F = jnp.asarray(F)
    w, v = jnp.linalg.eigh(F)
    wmax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    inv_w = jnp.where(w > rcond * wmax, 1.0 / w, 0.0)
    cov_diag = jnp.einsum("...ij,...j,...ij->...i", v, inv_w, v)
    return jnp.sqrt(cov_diag)
