"""Variational autoencoder emulator family.

The reference repo is *named* 21cmVAE and advertises an interpretable
latent space (``README.rst:11``), but the v3.1.0 snapshot ships only a
deterministic autoencoder — no sampling layer, no KL term
(reference ``emulator.py:445-518``; loss at ``:739-747``). This module
restores the variational capability as a first-class model family:

* encoder trunk → (z_mean, z_logvar) heads;
* reparameterized sampling ``z = mu + exp(logvar/2)·ε`` with explicit
  PRNG keys (pure, reproducible — no hidden RNG state);
* loss = relative-MSE reconstruction + β·KL(q(z|x) ‖ N(0,I));
* latent-traversal utilities for the parameter-importance analysis the
  paper performs with the latent space.

Deterministic prediction uses z_mean (no sampling), so the VAE emulator
has the same single-device-call inference path as the other families.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.data.dataset import DataSplits
from tpu21cmvae.models.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    unflatten_like,
)
from tpu21cmvae.models.autoencoder import _make_stage_runner
from tpu21cmvae.models.direct import PAR_LABELS, _resolve_axes
from tpu21cmvae.ops.losses import kl_divergence, mse, relative_mse
from tpu21cmvae.ops.mlp import init_mlp, mlp_apply, resolve_activation
from tpu21cmvae.ops.transforms import (
    Normalizer,
    par_transform,
    preproc,
    resolve_normalizer,
    unpreproc,
)
from tpu21cmvae.utils.config import (
    AE_EMULATOR_TRAIN_DEFAULT,
    AE_TRAIN_DEFAULT,
    TrainConfig,
    VAEConfig,
)
from tpu21cmvae.utils.metrics import error


def _init_head(key, in_dim, out_dim):
    from tpu21cmvae.ops.mlp import glorot_uniform_init

    return {
        "w": glorot_uniform_init(key, in_dim, out_dim),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


class VAE:
    """Signal VAE over standardized signals.

    Parameter pytree: ``{"trunk": mlp, "mu": head, "logvar": head,
    "dec": mlp}``. The trunk applies the activation after every layer
    (heads are linear), the decoder matches the reference decoder shape.
    """

    def __init__(self, config: VAEConfig = VAEConfig(), *, params=None, seed: int = 0):
        self.config = config
        if params is None:
            k_trunk, k_mu, k_lv, k_dec = jax.random.split(jax.random.key(seed), 4)
            trunk_sizes = (config.n_bins, *config.enc_hidden_dims)
            trunk_width = trunk_sizes[-1]
            params = {
                # init_mlp builds (in, *hidden, out); trunk output is the
                # last hidden width, all layers activated in apply.
                "trunk": init_mlp(k_trunk, trunk_sizes)
                if len(trunk_sizes) > 1
                else (),
                "mu": _init_head(k_mu, trunk_width, config.latent_dim),
                "logvar": _init_head(k_lv, trunk_width, config.latent_dim),
                "dec": init_mlp(k_dec, config.decoder().sizes),
            }
        self.params = params

    # pure functions -------------------------------------------------------

    def encode(self, params, x) -> Tuple[jax.Array, jax.Array]:
        act = resolve_activation(self.config.activation)
        hi = jax.lax.Precision.HIGHEST  # see ops.mlp.mlp_apply on precision
        h = x
        for layer in params["trunk"]:
            h = act(jnp.matmul(h, layer["w"], precision=hi) + layer["b"])
        mu = jnp.matmul(h, params["mu"]["w"], precision=hi) + params["mu"]["b"]
        logvar = (
            jnp.matmul(h, params["logvar"]["w"], precision=hi)
            + params["logvar"]["b"]
        )
        return mu, logvar

    def reparameterize(self, key, mu, logvar) -> jax.Array:
        eps = jax.random.normal(key, mu.shape, mu.dtype)
        return mu + jnp.exp(0.5 * logvar) * eps

    def decode(self, params, z) -> jax.Array:
        return mlp_apply(params["dec"], z, self.config.activation)

    def apply(self, params, x, key=None):
        """Reconstruction. With a key: sample the posterior; without:
        decode the posterior mean (deterministic)."""
        mu, logvar = self.encode(params, x)
        z = mu if key is None else self.reparameterize(key, mu, logvar)
        return self.decode(params, z), mu, logvar

    def loss_fn(self, scaled_mean):
        """Per-sample β-ELBO on standardized signals (constant β, no
        warm-up). The returned ``loss(params, x, y, key)`` matches the
        training loops' ``stochastic=True`` signature exactly;
        ``scaled_mean`` comes from the Normalizer
        (:attr:`~tpu21cmvae.ops.transforms.Normalizer.scaled_mean`).
        ``VAEEmulator.train`` builds its own annealed variant."""
        beta = self.config.beta

        def loss(params, x, y, key):
            recon, mu, logvar = self.apply(params, x, key)
            return relative_mse(y, recon, scaled_mean) + beta * kl_divergence(
                mu, logvar
            )

        return loss


class VAEEmulator:
    """Two-stage VAE-based emulator: VAE on signals, then a params→z_mean
    MLP; prediction = decoder(emulator(params)). The variational analogue
    of :class:`~tpu21cmvae.models.autoencoder.AutoEncoderEmulator`."""

    par_labels = PAR_LABELS

    def __init__(
        self,
        data: Optional[DataSplits] = None,
        *,
        config: VAEConfig = VAEConfig(),
        normalizer: Optional[Normalizer] = None,
        vae_params=None,
        em_params=None,
        redshifts=None,
        frequencies=None,
        seed: int = 0,
    ):
        normalizer = resolve_normalizer(data, normalizer)
        self.data = data
        self.config = config
        self.normalizer = normalizer
        self.redshifts, self.frequencies = _resolve_axes(redshifts, frequencies)
        self.vae = VAE(config, params=vae_params, seed=seed)
        self.em_params = em_params if em_params is not None else init_mlp(
            jax.random.key(seed + 1), config.emulator().sizes
        )
        self.history = None
        self._build_jits()

    def _build_jits(self):
        norm = self.normalizer
        act = self.config.activation
        vae = self.vae

        @jax.jit
        def predict(em_params, vae_params, raw_params):
            x = par_transform(raw_params, norm)
            z = mlp_apply(em_params, x, act)
            y = vae.decode(vae_params, z)
            return unpreproc(y, norm)

        @jax.jit
        def reconstruct(vae_params, signals):
            y = preproc(signals, norm)
            rec, _, _ = vae.apply(vae_params, y, key=None)
            return unpreproc(rec, norm)

        self._predict_jit = predict
        self._reconstruct_jit = reconstruct

    def predict_fn(self):
        """Pure jitted ``(weights, raw_params) → signals`` with weights
        packed as ``{"em": ..., "vae": ...}`` — the ShardedEmulator
        contract (see :class:`tpu21cmvae.parallel.inference.ShardedEmulator`)."""
        inner = self._predict_jit

        @jax.jit
        def predict(weights, raw_params):
            return inner(weights["em"], weights["vae"], raw_params)

        return predict

    def loglik_fn(self, obs, noise_var=1.0, *, memo: bool = True):
        """Jitted Gaussian log-likelihood ``(weights, raw_params) → (B,)``
        over the em→decoder pipeline (posterior-mean latents, no
        sampling) — the MCMC inner loop for this family (see
        :func:`tpu21cmvae.ops.loglik.make_loglik_from_predict`).
        Value-identical calls return the same cached program object
        (:mod:`tpu21cmvae.models._memo`)."""
        from tpu21cmvae.models._memo import memo_program, noise_key
        from tpu21cmvae.ops.loglik import make_loglik_from_predict

        return memo_program(
            self,
            ("loglik", np.asarray(obs, np.float32),
             noise_key(noise_var)),
            lambda: jax.jit(make_loglik_from_predict(
                self.predict_fn(), obs, noise_var
            )),
            memo=memo,
        )

    def loglik_and_grad_fn(self, obs, noise_var=1.0, *, memo: bool = True):
        """Jitted ``(weights, raw) → (logL, dlogL/draw)`` over the
        em→decoder pipeline with posterior-mean latents (autodiff —
        the HMC inner loop for this family)."""
        from tpu21cmvae.models._memo import memo_program, noise_key
        from tpu21cmvae.ops.loglik import make_loglik_and_grad_from_predict

        return memo_program(
            self,
            ("valgrad", np.asarray(obs, np.float32),
             noise_key(noise_var)),
            lambda: jax.jit(make_loglik_and_grad_from_predict(
                self.predict_fn(), obs, noise_var
            )),
            memo=memo,
        )

    def loglik_multi_fn(self, obs_batch, noise_var=1.0, *,
                        memo: bool = True):
        """Jitted stacked-observation likelihood over the em→decoder
        pipeline (posterior-mean latents) — same contract as
        :meth:`DirectEmulator.loglik_multi_fn`."""
        from tpu21cmvae.models._memo import memo_program, noise_key
        from tpu21cmvae.ops.loglik import make_loglik_multi_from_predict

        return memo_program(
            self,
            ("multi", np.asarray(obs_batch, np.float32),
             noise_key(noise_var)),
            lambda: jax.jit(make_loglik_multi_from_predict(
                self.predict_fn(), obs_batch, noise_var
            )),
            memo=memo,
        )

    def marginalize_foreground(self, noise_var=1.0, *, n_terms: int = 5,
                               basis="linlog", prior_var=None,
                               nu_ref=None):
        """Foreground-marginalized noise model on this emulator's
        frequency axis — same contract as
        :meth:`DirectEmulator.marginalize_foreground`
        (:mod:`tpu21cmvae.foregrounds`)."""
        from tpu21cmvae.foregrounds import (
            foreground_basis,
            marginalize_foreground,
        )

        f = (foreground_basis(self.frequencies, n_terms, basis,
                              nu_ref=nu_ref)
             if isinstance(basis, str) else basis)
        return marginalize_foreground(
            f, noise_var, n_bins=int(self.frequencies.shape[0]),
            prior_var=prior_var,
        )

    def log_evidence_batch(self, obs_batch, noise_var=1.0, *,
                           bounds=None, method="auto",
                           khat_threshold=0.7, flow_kwargs=None,
                           final=None, final_kwargs=None, **kwargs):
        """Batched Laplace+IS evidence with automatic khat-triggered
        flow escalation — same contract as
        :meth:`DirectEmulator.log_evidence_batch`."""
        from tpu21cmvae.sampling import (
            laplace_evidence_multi_auto,
            valgrad_from_loglik,
        )

        obs_batch = np.atleast_2d(np.asarray(obs_batch, np.float32))
        return laplace_evidence_multi_auto(
            self.loglik_multi_fn(obs_batch, noise_var), self.params,
            obs_batch.shape[0], bounds=bounds,
            method=method, khat_threshold=khat_threshold,
            flow_kwargs=flow_kwargs, final=final,
            final_kwargs=final_kwargs,
            row_loglik=lambda i: self.loglik_fn(obs_batch[i], noise_var),
            row_valgrad=lambda i: self.loglik_and_grad_fn(
                obs_batch[i], noise_var
            ),
            rows_loglik=lambda idx: self.loglik_multi_fn(
                obs_batch[np.asarray(idx)], noise_var
            ),
            rows_valgrad=lambda idx: valgrad_from_loglik(
                self.loglik_multi_fn(obs_batch[np.asarray(idx)],
                                     noise_var)
            ),
            **kwargs,
        )

    def sample_posterior(
        self, obs, noise_var=1.0, *, sampler: str = "hmc", bounds=None,
        **kwargs,
    ):
        """On-device posterior sampling over this family's likelihood —
        same contract as :meth:`DirectEmulator.sample_posterior`
        (see :mod:`tpu21cmvae.sampling`)."""
        from tpu21cmvae.sampling import (
            sample_ensemble,
            sample_hmc,
            sample_mh,
            sample_to_ess,
        )

        if sampler == "mh":
            if "target_ess" in kwargs:
                return sample_to_ess(
                    self.loglik_fn(obs, noise_var), self.params,
                    bounds=bounds, **kwargs,
                )
            return sample_mh(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if sampler == "ensemble":
            return sample_ensemble(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if sampler == "pt":
            from tpu21cmvae.sampling import sample_pt

            return sample_pt(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if sampler == "smc":
            from tpu21cmvae.sampling import sample_smc

            return sample_smc(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if sampler not in ("hmc", "chees", "nuts"):
            raise ValueError(
                f"sampler must be 'mh', 'ensemble', 'hmc', 'chees', "
                f"'nuts', 'pt' or 'smc'; got {sampler!r}"
            )
        if sampler in ("chees", "nuts"):
            from tpu21cmvae.sampling import sample_chees, sample_nuts

            fn = sample_chees if sampler == "chees" else sample_nuts
            return fn(
                self.loglik_and_grad_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        return sample_hmc(
            self.loglik_and_grad_fn(obs, noise_var), self.params,
            bounds=bounds, **kwargs,
        )

    def log_evidence(
        self, obs, noise_var=1.0, *, bounds=None, method="nested",
        warm_start=True, **kwargs
    ):
        """Bayesian evidence for this family — same contract as
        :meth:`DirectEmulator.log_evidence` (``method="nested"``
        default via :func:`tpu21cmvae.nested.nested_sampling`;
        ``"laplace"`` quick look via
        :func:`tpu21cmvae.sampling.laplace_evidence`; ``"smc"``
        adaptive tempered SMC via
        :func:`tpu21cmvae.sampling.sample_smc`; ``"ladder"`` with
        the fit-seeded warm start via
        :func:`tpu21cmvae.sampling.log_evidence`)."""
        if method == "nested":
            from tpu21cmvae.nested import nested_sampling

            return nested_sampling(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if method == "smc":
            from tpu21cmvae.sampling import sample_smc

            return sample_smc(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if method == "laplace":
            from tpu21cmvae.sampling import laplace_evidence

            return laplace_evidence(
                self.loglik_fn(obs, noise_var), self.params,
                bounds=bounds, **kwargs,
            )
        if method == "flow":
            from tpu21cmvae.flows import evidence_with_flow

            return evidence_with_flow(
                self.loglik_fn(obs, noise_var),
                self.loglik_and_grad_fn(obs, noise_var),
                self.params, bounds=bounds, **kwargs,
            )
        if method != "ladder":
            raise ValueError(
                f"method must be 'nested', 'smc', 'laplace', 'flow' "
                f"or 'ladder'; got {method!r}"
            )
        from tpu21cmvae.sampling import log_evidence

        if warm_start and "x0" not in kwargs:
            # 500 polish steps from >=1024 starts is the measured
            # reliability floor for finding the dominant mode (200-step
            # fits miss it seed-to-seed by >100 nats; see the sampling package)
            fit = self.fit_params(
                obs, noise_var, bounds=bounds,
                n_starts=max(1024, kwargs.get("n_walkers", 256)),
                n_steps=500, seed=kwargs.get("seed", 0) + 101,
                log_prior=kwargs.get("log_prior"),
            )
            kwargs.setdefault("n_walkers", 256)
            kwargs["x0"] = fit.top(kwargs["n_walkers"])[0]
        return log_evidence(
            self.loglik_fn(obs, noise_var), self.params,
            bounds=bounds, **kwargs,
        )


    def goodness_of_fit(self, obs, noise_var=25.0, draws=None,
                        **kwargs):
        """Posterior predictive model check: did the assumed
        signal+noise family actually generate ``obs``? ``draws``:
        posterior draws or a :class:`~tpu21cmvae.sampling.SampleResult`
        (e.g. from :meth:`sample_posterior`). See
        :func:`tpu21cmvae.calibration.goodness_of_fit`."""
        from tpu21cmvae.calibration import goodness_of_fit

        return goodness_of_fit(self, obs, noise_var, draws, **kwargs)


    def goodness_of_fit_batch(self, obs_batch, noise_var=25.0,
                              draws=None, **kwargs):
        """Survey-scale posterior predictive checks — one batched
        predict for ALL observations. ``draws``: a
        :class:`~tpu21cmvae.sampling.BatchSampleResult` from
        :meth:`sample_posterior_batch` or a ``(O, B, n_params)``
        array. See :func:`tpu21cmvae.calibration.goodness_of_fit_batch`."""
        from tpu21cmvae.calibration import goodness_of_fit_batch

        return goodness_of_fit_batch(
            self, obs_batch, noise_var, draws, **kwargs
        )

    def sample_posterior_batch(
        self, obs_batch, noise_var=1.0, *, sampler: str = "mh",
        n_walkers: int = 256, bounds=None, **kwargs,
    ):
        """Posteriors for ``O`` observed spectra as ONE device program
        over this family's em→decoder likelihood — same contract as
        :meth:`DirectEmulator.sample_posterior_batch` (``n_walkers`` is
        per observation; MH/HMC only). Built on the generic
        stacked-observation likelihood
        (:func:`tpu21cmvae.ops.loglik.make_loglik_multi_from_predict`).
        """
        import numpy as np

        from tpu21cmvae.ops.loglik import (
            make_loglik_multi_from_predict,
            per_row_grad,
        )
        from tpu21cmvae.sampling import run_batched_chain

        obs_batch = np.atleast_2d(np.asarray(obs_batch, np.float32))
        base = make_loglik_multi_from_predict(
            self.predict_fn(), obs_batch, noise_var
        )
        return run_batched_chain(
            sampler, self.params, obs_batch.shape[0], n_walkers,
            loglik_builder=lambda: jax.jit(base),
            valgrad_builder=lambda: jax.jit(per_row_grad(base)),
            bounds=bounds, **kwargs,
        )

    def posterior_predictive(self, samples, **kwargs):
        """Signal-space credible bands from posterior samples — same
        contract as :meth:`DirectEmulator.posterior_predictive`
        (:func:`tpu21cmvae.sampling.posterior_predictive`)."""
        from tpu21cmvae.sampling import posterior_predictive

        return posterior_predictive(self.predict, samples, **kwargs)

    def fit_params(self, obs, noise_var=1.0, *, bounds=None, **kwargs):
        """Maximum-likelihood parameter fit against this family's
        likelihood — same contract as :meth:`DirectEmulator.fit_params`
        (:func:`tpu21cmvae.sampling.fit_map`)."""
        from tpu21cmvae.sampling import fit_map

        return fit_map(
            self.loglik_and_grad_fn(obs, noise_var), self.params,
            bounds=bounds, **kwargs,
        )

    def fit_advi(self, obs, noise_var=1.0, *, bounds=None, **kwargs):
        """Fast approximate posterior by full-rank Gaussian ADVI —
        same contract as :meth:`DirectEmulator.fit_advi`
        (:func:`tpu21cmvae.vi.fit_advi`)."""
        from tpu21cmvae.vi import fit_advi

        return fit_advi(
            self.loglik_and_grad_fn(obs, noise_var), self.params,
            bounds=bounds, **kwargs,
        )

    def fit_flow(self, obs, noise_var=1.0, *, bounds=None, **kwargs):
        """Normalizing-flow posterior fit — same contract as
        :meth:`DirectEmulator.fit_flow`
        (:func:`tpu21cmvae.flows.fit_flow`)."""
        from tpu21cmvae.flows import fit_flow

        return fit_flow(
            self.loglik_and_grad_fn(obs, noise_var), self.params,
            bounds=bounds, **kwargs,
        )

    def profile_likelihood(
        self, obs, noise_var, index, grid, *, bounds=None, **kwargs
    ):
        """Profile likelihood of parameter ``index`` — same contract
        as :meth:`DirectEmulator.profile_likelihood`
        (:func:`tpu21cmvae.sampling.profile_likelihood`)."""
        from tpu21cmvae.sampling import profile_likelihood

        return profile_likelihood(
            self.loglik_and_grad_fn(obs, noise_var), self.params, index, grid,
            bounds=bounds, **kwargs,
        )

    @property
    def params(self):
        """Weights pytree for :meth:`predict_fn` (emulator + VAE)."""
        return {"em": self.em_params, "vae": self.vae.params}

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> str:
        meta = {
            "kind": "VAEEmulator",
            "n_params": self.config.n_params,
            "n_bins": self.config.n_bins,
            "latent_dim": self.config.latent_dim,
            "enc_hidden_dims": list(self.config.enc_hidden_dims),
            "dec_hidden_dims": list(self.config.dec_hidden_dims),
            "em_hidden_dims": list(self.config.em_hidden_dims),
            "activation": self.config.activation,
            "beta": self.config.beta,
            "kl_anneal_epochs": self.config.kl_anneal_epochs,
            "redshifts": [float(z) for z in self.redshifts],
        }
        tree = {
            "vae": self.vae.params,
            "em": self.em_params,
            "normalizer": self.normalizer,
        }
        return save_checkpoint(path, tree, meta)

    @classmethod
    def from_checkpoint(cls, path: str, data: Optional[DataSplits] = None):
        leaves, meta = load_checkpoint(path)
        cfg = VAEConfig(
            n_params=meta["n_params"],
            n_bins=meta["n_bins"],
            latent_dim=meta["latent_dim"],
            enc_hidden_dims=tuple(meta["enc_hidden_dims"]),
            dec_hidden_dims=tuple(meta["dec_hidden_dims"]),
            em_hidden_dims=tuple(meta["em_hidden_dims"]),
            activation=meta.get("activation", "relu"),
            beta=meta.get("beta", 1.0),
            kl_anneal_epochs=meta.get("kl_anneal_epochs", 0),
        )
        template = {
            "vae": VAE(cfg, seed=0).params,
            "em": init_mlp(jax.random.key(0), cfg.emulator().sizes),
            "normalizer": Normalizer.template(cfg.n_bins, cfg.n_params),
        }
        tree = unflatten_like(template, leaves, source=path)
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
        return cls(
            data,
            config=cfg,
            normalizer=tree["normalizer"],
            vae_params=tree["vae"],
            em_params=tree["em"],
            redshifts=np.asarray(meta["redshifts"]) if "redshifts" in meta else None,
        )

    # -- inference ----------------------------------------------------------

    def predict(self, params) -> np.ndarray:
        raw = jnp.atleast_2d(jnp.asarray(params, jnp.float32))
        pred = np.asarray(self._predict_jit(self.em_params, self.vae.params, raw))
        return pred[0] if pred.shape[0] == 1 else pred

    def reconstruct(self, signals) -> np.ndarray:
        sig = jnp.atleast_2d(jnp.asarray(signals, jnp.float32))
        rec = np.asarray(self._reconstruct_jit(self.vae.params, sig))
        return rec[0] if rec.shape[0] == 1 else rec

    def sample_signals(self, key, n: int) -> np.ndarray:
        """Draw n signals from the prior: z ~ N(0, I) → decoder → mK."""
        z = jax.random.normal(key, (n, self.config.latent_dim))
        y = self.vae.decode(self.vae.params, z)
        return np.asarray(unpreproc(y, self.normalizer))

    def latent_traversal(
        self, dim: int, values, base_params=None
    ) -> np.ndarray:
        """Decode signals along one latent dimension — the latent-space
        interpretability analysis the reference paper performs.

        ``base_params``: raw astrophysical parameters whose posterior mean
        anchors the other latent dims (defaults to the origin).
        """
        values = jnp.asarray(values, jnp.float32)
        if base_params is not None:
            x = par_transform(
                jnp.atleast_2d(jnp.asarray(base_params, jnp.float32)),
                self.normalizer,
            )
            sig = mlp_apply(self.em_params, x, self.config.activation)
            base = sig[0]
        else:
            base = jnp.zeros((self.config.latent_dim,), jnp.float32)
        z = jnp.tile(base, (len(values), 1)).at[:, dim].set(values)
        y = self.vae.decode(self.vae.params, z)
        return np.asarray(unpreproc(y, self.normalizer))

    # -- training -----------------------------------------------------------

    def train(
        self,
        epochs: Optional[int] = None,
        vae_train_config: Optional[TrainConfig] = None,
        em_train_config: Optional[TrainConfig] = None,
        verbose: bool = False,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 10,
        resume: bool = False,
        device_loop: bool = False,
    ) -> Tuple[list, list, list, list]:
        """Stage A: VAE with reconstruction + β·KL (stochastic loss, fresh
        key per batch); Stage B: params→z_mean MLP with MSE. Returns
        ``(vae_loss, vae_val_loss, loss, val_loss)``.

        ``checkpoint_dir``/``resume``: per-stage preemption-safe
        checkpoints (``stage_vae`` / ``stage_em`` subdirectories)."""
        if self.data is None:
            raise ValueError("No dataset attached; construct with `data=`.")
        vae_cfg = vae_train_config or AE_TRAIN_DEFAULT
        em_cfg = em_train_config or AE_EMULATOR_TRAIN_DEFAULT
        if epochs is not None:
            vae_cfg = dataclasses.replace(vae_cfg, epochs=epochs)
            em_cfg = dataclasses.replace(em_cfg, epochs=epochs)

        norm = self.normalizer
        act = self.config.activation
        scaled_mean = norm.scaled_mean
        y_train = preproc(jnp.asarray(self.data.signal_train, jnp.float32), norm)
        y_val = preproc(jnp.asarray(self.data.signal_val, jnp.float32), norm)

        vae = self.vae
        beta = self.config.beta
        anneal = max(0, int(self.config.kl_anneal_epochs))

        def vae_loss_fn(params, x, y, key, epoch):
            """β-ELBO with linear KL warm-up: β_t = β·min(1, (t+1)/T)
            (posterior-collapse mitigation; see VAEConfig)."""
            recon, mu, logvar = vae.apply(params, x, key)
            scale = (
                jnp.minimum(1.0, (epoch + 1.0) / anneal) if anneal > 0 else 1.0
            )
            return relative_mse(y, recon, scaled_mean) + (
                beta * scale
            ) * kl_divergence(mu, logvar)

        run_stage = _make_stage_runner(
            device_loop, verbose, checkpoint_dir, checkpoint_every, resume
        )
        vae_params, _, vae_hist = run_stage(
            "stage_vae", self.vae.params, vae_loss_fn, y_train, y_train,
            y_val, y_val, vae_cfg, stochastic=True, pass_epoch=True,
        )
        self.vae.params = vae_params

        encode = jax.jit(lambda s: self.vae.encode(vae_params, s)[0])
        z_train = encode(y_train)
        z_val = encode(y_val)
        x_train = par_transform(jnp.asarray(self.data.par_train, jnp.float32), norm)
        x_val = par_transform(jnp.asarray(self.data.par_val, jnp.float32), norm)

        def em_loss_fn(params, x, y):
            return mse(y, mlp_apply(params, x, act))

        self.em_params, _, em_hist = run_stage(
            "stage_em", self.em_params, em_loss_fn, x_train, z_train, x_val,
            z_val, em_cfg,
        )
        self.history = {"vae": vae_hist, "emulator": em_hist}
        return vae_hist.loss, vae_hist.val_loss, em_hist.loss, em_hist.val_loss

    # -- evaluation ----------------------------------------------------------

    def test_error(
        self,
        use_vae: bool = False,
        relative: bool = True,
        flow=None,
        fhigh=None,
    ) -> np.ndarray:
        if self.data is None:
            raise ValueError("No dataset attached; construct with `data=`.")
        if use_vae:
            pred = self.reconstruct(self.data.signal_test)
        else:
            pred = self.predict(self.data.par_test)
        return error(
            self.data.signal_test,
            pred,
            relative=relative,
            nu_arr=self.frequencies,
            flow=flow,
            fhigh=fhigh,
        )
