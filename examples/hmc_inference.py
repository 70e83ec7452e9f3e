"""Hamiltonian Monte Carlo with the emulator as forward model — gradients
through the likelihood, entirely on device.

The reference supports ~25 likelihood evaluations/s with no gradients at
all (reference ``README.rst:11``); composing ∇logL by hand would mean
differentiating through Keras predict. Here the Gaussian log-likelihood
(:mod:`tpu21cmvae.ops.loglik`) is a pure JAX function — folded, gram-
collapsed, precision-tiered — so ``jax.grad`` gives the score for free
and a whole HMC ensemble (leapfrog + Metropolis correction) runs as ONE
``lax.scan`` program per chain segment.

Usage:
    python examples/hmc_inference.py --walkers 4096 --steps 100 \
        --leapfrog 8
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae import DirectEmulator, make_loglik
from tpu21cmvae.data import synthetic_dataset
from tpu21cmvae.data.synthetic import PAR_RANGES, synthetic_params
from tpu21cmvae.utils.config import TrainConfig


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--walkers", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--leapfrog", type=int, default=8)
    ap.add_argument("--train-epochs", type=int, default=40)
    args = ap.parse_args()

    data = synthetic_dataset(n_train=4096, n_val=512, n_test=512, seed=0)
    model = DirectEmulator(data)
    print("training the forward model...")
    model.train(
        train_config=TrainConfig(epochs=args.train_epochs), device_loop=True
    )

    truth = data.par_test[0]
    obs = model.predict(truth) + np.random.default_rng(1).normal(0, 5.0, 451)
    obs = jnp.asarray(obs, jnp.float32)
    noise_var = 25.0

    lo = jnp.asarray(PAR_RANGES[:, 0], jnp.float32)
    hi = jnp.asarray(PAR_RANGES[:, 1], jnp.float32)
    span = hi - lo

    # HMC needs a smooth unbounded target: sample in a whitened
    # y-space with a sigmoid map into the prior box (the Jacobian term
    # keeps the flat box prior exact).
    def to_params(y):
        return lo + span * jax.nn.sigmoid(y)

    def log_jac(y):  # log |d params / d y| for the sigmoid map
        return jnp.sum(jax.nn.log_sigmoid(y) + jax.nn.log_sigmoid(-y), -1)

    loglik = make_loglik(
        model.config, model.normalizer, obs, noise_var, method="gram"
    )
    weights = model.params

    def logp(y):
        return loglik(weights, to_params(y)) + log_jac(y)

    grad_logp = jax.grad(lambda y: jnp.sum(logp(y)))
    eps = 0.01

    def hmc_step(state, key):
        y, lp = state
        kp, ku = jax.random.split(key)
        p0 = jax.random.normal(kp, y.shape, y.dtype)
        # leapfrog
        p = p0 + 0.5 * eps * grad_logp(y)
        q = y
        for _ in range(args.leapfrog - 1):
            q = q + eps * p
            p = p + eps * grad_logp(q)
        q = q + eps * p
        p = p + 0.5 * eps * grad_logp(q)
        lp_new = logp(q)
        dh = (lp_new - lp) - 0.5 * (
            jnp.sum(p**2, -1) - jnp.sum(p0**2, -1)
        )
        accept = jnp.log(jax.random.uniform(ku, (y.shape[0],))) < dh
        y = jnp.where(accept[:, None], q, y)
        lp = jnp.where(accept, lp_new, lp)
        return (y, lp), jnp.mean(accept)

    @jax.jit
    def run_chain(state, keys):
        return jax.lax.scan(hmc_step, state, keys)

    rng = np.random.default_rng(0)
    draws = synthetic_params(args.walkers, rng).astype(np.float32)
    # invert the sigmoid map to get starting y's inside the box
    frac = np.clip((draws - np.asarray(lo)) / np.asarray(span), 1e-4, 1 - 1e-4)
    y0 = jnp.asarray(np.log(frac / (1 - frac)), jnp.float32)
    state = (y0, logp(y0))

    keys = jax.random.split(jax.random.key(0), args.steps)
    print(f"running {args.steps} HMC steps × {args.walkers} walkers "
          f"({args.leapfrog} leapfrog each)...")
    state, rates = run_chain(state, keys)  # compile + run
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    state, rates = run_chain(state, keys)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    # each leapfrog step needs one gradient (≈ fwd+bwd) evaluation
    gevals = args.steps * args.walkers * (args.leapfrog + 1)
    print(f"accept rate {np.asarray(rates).mean():.2f}; "
          f"{gevals:.2e} gradient evaluations in {dt:.2f}s "
          f"→ {gevals / dt:.3e} grad-evals/s")

    post = np.asarray(jax.device_get(to_params(state[0])))
    for label, t, m in zip(model.par_labels, truth, post.mean(axis=0)):
        print(f"  {label:>7}: truth {t:10.4g}  posterior mean {m:10.4g}")


if __name__ == "__main__":
    main()
