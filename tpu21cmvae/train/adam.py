"""In-repo Adam optimizer as a pure pytree update.

Matches the semantics of the Keras Adam used by the reference recipes
(``notebooks/Training.ipynb`` cells 4, 10), which differ from optax's
defaults in two ways that matter for replicating training dynamics:

* epsilon = 1e-7 (Keras default), applied *outside* the bias-corrected
  second moment: ``p -= lr_t * m / (sqrt(v) + eps)`` with
  ``lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)``;
* the learning rate is a runtime scalar, so ReduceLROnPlateau changes it
  without retracing the jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array  # int32 scalar
    mu: Any  # first-moment pytree (same structure as params)
    nu: Any  # second-moment pytree


def adam_init(params) -> AdamState:
    zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros(params), nu=zeros(params))


def adam_update(
    grads,
    params,
    state: AdamState,
    lr,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    epsilon: float = 1e-7,
):
    """One Adam step. Returns (new_params, new_state).

    ``lr`` may be a traced scalar; betas/epsilon are static.
    """
    t = state.step + 1
    tf_ = t.astype(jnp.float32)
    mu = jax.tree_util.tree_map(
        lambda m, g: beta_1 * m + (1.0 - beta_1) * g, state.mu, grads
    )
    nu = jax.tree_util.tree_map(
        lambda v, g: beta_2 * v + (1.0 - beta_2) * (g * g), state.nu, grads
    )
    lr_t = lr * jnp.sqrt(1.0 - beta_2**tf_) / (1.0 - beta_1**tf_)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + epsilon), params, mu, nu
    )
    return new_params, AdamState(step=t, mu=mu, nu=nu)
