"""Loss functions, traceable and constant-folded.

The reference's ``relative_mse_loss`` closure re-wraps the NumPy training
mean/std into a TF tensor on every training step
(reference ``emulator.py:51-83``, tensor conversion at ``:70-72``). Here
the constant ``scaled_mean = mean/std`` comes from the
:class:`~tpu21cmvae.ops.transforms.Normalizer` once, and the loss is a pure
function of (y_true, y_pred, scaled_mean) that XLA folds into the training
step.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(y_true, y_pred):
    """Per-sample mean squared error over the last axis (the Keras
    ``mean_squared_error`` used for the params→latent stage,
    reference ``emulator.py:756-764``)."""
    return jnp.mean((y_true - y_pred) ** 2, axis=-1)


def relative_mse(y_true, y_pred, scaled_mean):
    """Per-sample relative MSE — the square of the paper's figure of merit.

    ``mse(y_true, y_pred) / amplitude²`` where the amplitude is the max
    |value| of the *true* signal recovered into std units by adding back
    ``scaled_mean = mean(signal_train)/std(signal_train)``
    (reference ``emulator.py:68-81``).

    Inputs are standardized signals; returns one loss per sample.
    """
    amp = jnp.max(jnp.abs(y_true + scaled_mean), axis=-1)
    return mse(y_true, y_pred) / (amp * amp)


def kl_divergence(mu, logvar):
    """Per-sample KL(q(z|x) ‖ N(0, I)) for a diagonal Gaussian posterior:
    −½ Σ_j (1 + logvar − mu² − exp(logvar)).

    Used by the VAE family (the variational capability named by the
    reference repo, ``README.rst:11``, absent from its v3.1.0 code —
    see SURVEY.md §0).
    """
    return -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar), axis=-1)
