"""jit-compiled training loop: one device call per epoch.

Replaces the reference's Keras ``Model.fit`` path
(reference ``emulator.py:369-378``) with a TPU-first design:

* the whole dataset lives on device; each epoch is ONE jitted call that
  shuffles (``jax.random.permutation``), then ``lax.scan``s over batches
  of 256 (reference batch size, ``emulator.py:372``) running
  value_and_grad + Adam per step;
* the ragged last batch is handled with a static pad + per-sample weight
  mask, so shapes stay static and the epoch loss is the exact
  sample-weighted mean Keras reports;
* the learning rate is a traced scalar argument — ReduceLROnPlateau
  adjusts it between epochs without recompilation;
* validation loss is a second jitted call on the full split;
* EarlyStopping / ReduceLROnPlateau run host-side between epochs with
  Keras-exact semantics (:mod:`tpu21cmvae.train.callbacks`);
* optional checkpoint/resume: with ``checkpoint_dir`` the loop
  atomically saves params + optimizer state + best-so-far weights +
  epoch/lr/callback/history state every N epochs, and
  ``resume=True`` continues a preempted run from the latest checkpoint
  with identical dynamics (the per-epoch shuffle keys are re-derived
  from the seed, so a resumed run shuffles exactly as the original
  would have). The reference has nothing comparable — its ``save`` is
  ``NotImplementedError`` (reference ``emulator.py:441-442``) and
  training state lives only in the Keras process (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from tpu21cmvae.train.adam import adam_init, adam_update
from tpu21cmvae.train.callbacks import EarlyStopping, ReduceLROnPlateau
from tpu21cmvae.utils.config import TrainConfig

LossFn = Callable[..., jax.Array]  # (params, x, y) -> per-sample losses


@dataclasses.dataclass
class History:
    """Per-epoch training record (superset of the Keras ``History`` dict
    the reference returns, ``emulator.py:379-381``)."""

    loss: List[float] = dataclasses.field(default_factory=list)
    val_loss: List[float] = dataclasses.field(default_factory=list)
    lr: List[float] = dataclasses.field(default_factory=list)
    epoch_time_s: List[float] = dataclasses.field(default_factory=list)
    stopped_epoch: Optional[int] = None
    best_epoch: Optional[int] = None

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class _WeakFnCache:
    """Program-factory cache whose entries live ON the loss closure.

    ``functools.lru_cache`` here pinned up to 128 loss closures — their
    captured device constants AND the jitted programs built over them —
    alive forever, so the tuner's own loss-cache eviction freed nothing
    (round-2 VERDICT weak #6). A ``WeakKeyDictionary`` cannot fix it
    either: the built program closes over the loss closure, so the
    value would keep its own key alive. Instead the per-function cache
    dict is stored as an attribute of the function object — its
    lifetime is EXACTLY the closure's: drop the closure and the
    programs, executables, and captured buffers are garbage, with no
    global registry to leak. Hit behavior is unchanged (the lru key
    already started with the closure's identity, so a dead closure's
    entries could never hit again anyway).

    ``max_per_fn`` bounds program shapes per closure (far above real
    usage; overflow clears — blunt but bounded, re-paying one compile).
    Objects without a writable ``__dict__`` (e.g. ``functools.partial``)
    build uncached.
    """

    _ATTR = "_t21_program_cache"

    def __init__(self, build, max_per_fn: int = 32):
        self._build = build
        self._max_per_fn = max_per_fn
        functools.update_wrapper(self, build)

    def __call__(self, fn, *args, **kwargs):
        try:
            per = getattr(fn, self._ATTR)
        except AttributeError:
            per = {}
            try:
                setattr(fn, self._ATTR, per)
            except (AttributeError, TypeError):  # no writable __dict__
                return self._build(fn, *args, **kwargs)
        key = (self.__name__,) + args + tuple(sorted(kwargs.items()))
        out = per.get(key)
        if out is None:
            if len(per) >= self._max_per_fn:
                per.clear()
            out = per[key] = self._build(fn, *args, **kwargs)
        return out


def _weak_fn_cache(build):
    return _WeakFnCache(build)


@_weak_fn_cache
def _make_epoch_fn(
    loss_fn: LossFn, cfg: TrainConfig, n: int, stochastic: bool,
    pass_epoch: bool = False, n_real: Optional[int] = None,
):
    """Build the jitted one-epoch function for a dataset of n samples.

    Cached on all arguments (``cfg.seed`` is normalized to 0 by the
    caller — the epoch function takes its key as an argument), so
    repeated ``fit`` calls with the same loss closure reuse one jitted
    callable and hit jax's jit cache with zero retraces (the tuner's
    dominant overhead otherwise).

    ``n_real < n`` means rows ``n_real:`` are padding (data-parallel
    callers pad the batch axis to a mesh multiple — ``parallel/``):
    only the first ``n_real`` rows are shuffled, pad rows sort to the
    epoch tail where the positional weight mask zeroes them, the loss
    divides by the true sample count, and a batch made entirely of
    padding is an exact no-op (params/optimizer pass through unchanged).
    With ``n_real == n`` the computation is identical to the unpadded
    path.

    Not donated: EarlyStopping keeps a reference to the best epoch's
    params pytree, and donating would invalidate those buffers.
    """
    n_real = n if n_real is None else n_real
    if not 0 < n_real <= n:
        raise ValueError(f"n_real={n_real} must be in (0, {n}]")
    bs = cfg.batch_size
    nb = -(-n // bs)  # ceil
    padded = nb * bs

    def epoch(params, opt_state, lr, key, x, y, epoch_idx):
        shuffle_key, loss_key = jax.random.split(key)
        perm = jax.random.permutation(shuffle_key, n_real)
        # dataset pad rows (identity-masked) then batch pad (positional):
        # both land at the tail, so one positional mask covers them
        perm = jnp.concatenate([
            perm,
            jnp.arange(n_real, n, dtype=perm.dtype),
            jnp.zeros((padded - n,), perm.dtype),
        ])
        weights = (jnp.arange(padded) < n_real).astype(x.dtype)
        xb = x[perm].reshape(nb, bs, *x.shape[1:])
        yb = y[perm].reshape(nb, bs, *y.shape[1:])
        wb = weights.reshape(nb, bs)

        def step(carry, batch):
            params, opt_state, total = carry
            bx, by, bw, i = batch
            count = jnp.sum(bw)

            def batch_loss(p):
                extra = (epoch_idx,) if pass_epoch else ()
                if stochastic:
                    per_sample = loss_fn(
                        p, bx, by, jax.random.fold_in(loss_key, i), *extra
                    )
                else:
                    per_sample = loss_fn(p, bx, by, *extra)
                return jnp.sum(per_sample * bw) / jnp.maximum(count, 1)

            loss_val, grads = jax.value_and_grad(batch_loss)(params)
            new_params, new_opt = adam_update(
                grads,
                params,
                opt_state,
                lr,
                beta_1=cfg.beta_1,
                beta_2=cfg.beta_2,
                epsilon=cfg.epsilon,
            )
            # all-padding batch (possible only when n_real < n) is a
            # no-op; `where` on a True scalar returns `new` bit-exactly
            has_samples = count > 0
            params, opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(has_samples, new, old),
                (new_params, new_opt),
                (params, opt_state),
            )
            return (params, opt_state, total + loss_val * count), None

        (params, opt_state, total), _ = jax.lax.scan(
            step,
            (params, opt_state, jnp.zeros((), x.dtype)),
            (xb, yb, wb, jnp.arange(nb)),
        )
        return params, opt_state, total / n_real

    return jax.jit(epoch)


@_weak_fn_cache
def _make_eval_fn(
    loss_fn: LossFn, stochastic: bool, pass_epoch: bool = False,
    n_real: Optional[int] = None,
):
    """Validation loss; stochastic losses use a fixed per-run key (passed
    as an argument so the cache is seed-independent) — the monitor the
    callbacks watch stays deterministic across epochs. ``n_real`` masks
    trailing pad rows (see :func:`_make_epoch_fn`)."""

    @jax.jit
    def evaluate(params, x, y, epoch_idx, eval_key):
        extra = (epoch_idx,) if pass_epoch else ()
        if stochastic:
            per_sample = loss_fn(params, x, y, eval_key, *extra)
        else:
            per_sample = loss_fn(params, x, y, *extra)
        if n_real is None or n_real == x.shape[0]:
            return jnp.mean(per_sample)
        w = (jnp.arange(x.shape[0]) < n_real).astype(per_sample.dtype)
        return jnp.sum(per_sample * w) / n_real

    return evaluate


def fit(
    params,
    loss_fn: LossFn,
    x_train,
    y_train,
    x_val,
    y_val,
    cfg: TrainConfig,
    *,
    opt_state=None,
    stochastic: bool = False,
    pass_epoch: bool = False,
    verbose: bool = False,
    epoch_callback: Optional[Callable] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 10,
    checkpoint_keep: Optional[int] = 3,
    resume: bool = False,
    n_train_real: Optional[int] = None,
    n_val_real: Optional[int] = None,
):
    """Train ``params`` to minimize the mean of ``loss_fn`` per-sample
    losses. Returns ``(params, opt_state, History)``.

    ``loss_fn(params, x, y) -> (batch,)`` per-sample losses — the direct
    emulator passes relative-MSE over the MLP, the AE stages pass their
    own (SURVEY.md §3.2/§3.4). With ``stochastic=True`` the signature is
    ``loss_fn(params, x, y, key)`` and each batch gets a fresh PRNG key
    (used by the VAE's reparameterization sampling). With
    ``pass_epoch=True`` the (traced) epoch index is appended as a final
    argument — the hook schedule-dependent losses (KL warm-up) use.

    With ``checkpoint_dir`` the full training state is saved atomically
    every ``checkpoint_every`` epochs (and at the end); ``resume=True``
    restores the latest checkpoint from that directory (if any) and
    continues — params, optimizer moments, LR schedule position, early-
    stopping monitor, best-so-far weights, and history all carry over.
    Only the newest ``checkpoint_keep`` files are retained (None keeps
    all) — each holds params + optimizer + best weights, so rotation
    bounds disk use on long runs.

    ``n_train_real``/``n_val_real``: true sample counts when the arrays
    carry trailing pad rows (data-parallel callers pad the batch axis to
    a mesh multiple — :mod:`tpu21cmvae.parallel.train_dp`). Pad rows are
    weight-masked out of every loss and gradient; results match the
    unpadded single-device run.
    """
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    x_val = jnp.asarray(x_val, jnp.float32)
    y_val = jnp.asarray(y_val, jnp.float32)
    n = x_train.shape[0]

    # seed enters through the traced keys below, NOT the factory cache
    # keys — per-trial seeds must not defeat the jit cache
    epoch_fn = _make_epoch_fn(
        loss_fn, dataclasses.replace(cfg, seed=0), n, stochastic,
        pass_epoch, n_real=n_train_real,
    )
    eval_fn = _make_eval_fn(loss_fn, stochastic, pass_epoch, n_real=n_val_real)
    eval_key = jax.random.key(cfg.seed ^ 0x5EED)

    if opt_state is None:
        opt_state = adam_init(params)
    early: Optional[EarlyStopping] = None
    if cfg.early_stop_patience is not None:
        early = EarlyStopping(
            patience=cfg.early_stop_patience,
            min_delta=cfg.early_stop_min_delta,
            restore_best_weights=cfg.restore_best_weights,
        )
    plateau: Optional[ReduceLROnPlateau] = None
    if cfg.plateau_patience is not None:
        plateau = ReduceLROnPlateau(
            patience=cfg.plateau_patience,
            factor=cfg.plateau_factor,
            min_delta=cfg.plateau_min_delta,
            min_lr=cfg.plateau_min_lr,
        )

    history = History()
    lr = float(cfg.learning_rate)
    key = jax.random.key(cfg.seed)
    start_epoch = 0

    if resume and checkpoint_dir is not None:
        restored = _load_latest_train_checkpoint(
            checkpoint_dir, params, opt_state
        )
        if restored is not None:
            tree, meta = restored
            params, opt_state = tree["params"], tree["opt_state"]
            start_epoch = meta["epoch"] + 1
            lr = meta["lr"]
            h = meta["history"]
            for k in ("loss", "val_loss", "lr", "epoch_time_s"):
                setattr(history, k, list(h[k]))
            history.stopped_epoch = h.get("stopped_epoch")
            history.best_epoch = h.get("best_epoch")
            if early is not None and meta.get("early") is not None:
                early.restore(
                    meta["early"],
                    tree["best_weights"] if meta.get("has_best") else None,
                )
            if plateau is not None and meta.get("plateau") is not None:
                plateau.restore(meta["plateau"])
            # Re-derive the per-epoch shuffle keys the original run would
            # have used for the completed epochs.
            for _ in range(start_epoch):
                key, _ = jax.random.split(key)
            if history.stopped_epoch is not None:
                # run already early-stopped; nothing left to train. The
                # checkpoint was written before best_epoch was assigned
                # (it is set only after the loop), so take it from the
                # restored EarlyStopping monitor instead of the stale
                # checkpointed None — matching an uninterrupted run.
                if early is not None:
                    params = early.final_weights(params)
                    history.best_epoch = (
                        early.best_epoch if early.best_epoch >= 0 else None
                    )
                return params, opt_state, history

    def _save_ckpt(epoch):
        best = early.best_weights if early is not None else None
        _save_train_checkpoint(
            checkpoint_dir,
            epoch,
            params,
            opt_state,
            best,
            lr,
            history,
            early,
            plateau,
            keep=checkpoint_keep,
        )

    progress = _progress_bar(cfg.epochs) if verbose else None

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        params, opt_state, train_loss = epoch_fn(
            params, opt_state, jnp.float32(lr), sub, x_train, y_train,
            jnp.int32(epoch),
        )
        # schedule-dependent losses (pass_epoch) are monitored at their
        # FINAL-epoch objective so the callback monitor stays stationary
        # during warm-ups (a KL-annealed val loss would otherwise grow by
        # schedule alone and defeat EarlyStopping/ReduceLROnPlateau)
        val_loss = float(
            eval_fn(params, x_val, y_val, jnp.int32(cfg.epochs - 1), eval_key)
        )
        train_loss = float(train_loss)
        history.loss.append(train_loss)
        history.val_loss.append(val_loss)
        history.lr.append(lr)
        history.epoch_time_s.append(time.perf_counter() - t0)

        if progress is not None:
            progress.set_postfix(loss=train_loss, val_loss=val_loss, lr=lr)
            progress.update(1)
        if epoch_callback is not None:
            epoch_callback(epoch, params, opt_state, history)

        stop = False
        if early is not None:
            stop = early.update(epoch, val_loss, params)
        if plateau is not None:
            lr = plateau.update(val_loss, lr)
        if stop:
            history.stopped_epoch = epoch
        if checkpoint_dir is not None and (
            stop or epoch == cfg.epochs - 1 or (epoch + 1) % checkpoint_every == 0
        ):
            _save_ckpt(epoch)
        if stop:
            break

    if early is not None:
        params = early.final_weights(params)
        # None (not -1) when no epoch ever improved, matching fit_scan
        history.best_epoch = (
            early.best_epoch if early.best_epoch >= 0 else None
        )
    if progress is not None:
        progress.close()
    return params, opt_state, history


# -- checkpoint/resume helpers --------------------------------------------


def _save_train_checkpoint(
    ckpt_dir, epoch, params, opt_state, best_weights, lr, history, early,
    plateau, keep=None,
):
    """Atomic full-training-state checkpoint: ``ckpt_dir/ckpt_NNNNNN.npz``;
    prunes all but the newest ``keep`` files afterwards."""
    import os

    from tpu21cmvae.models.checkpoint import save_checkpoint

    tree = {
        "params": params,
        "opt_state": opt_state,
        # placeholder keeps the tree structure static for reloading
        "best_weights": best_weights if best_weights is not None else params,
    }
    meta = {
        "epoch": epoch,
        "lr": lr,
        "history": {
            "loss": history.loss,
            "val_loss": history.val_loss,
            "lr": history.lr,
            "epoch_time_s": history.epoch_time_s,
            "stopped_epoch": history.stopped_epoch,
            "best_epoch": history.best_epoch,
        },
        "early": early.state() if early is not None else None,
        "has_best": best_weights is not None,
        "plateau": plateau.state() if plateau is not None else None,
    }
    save_checkpoint(os.path.join(ckpt_dir, f"ckpt_{epoch:06d}.npz"), tree, meta)
    if keep is not None:
        names = sorted(
            n
            for n in os.listdir(ckpt_dir)
            if n.startswith("ckpt_") and n.endswith(".npz")
        )
        for stale in names[:-keep]:
            os.unlink(os.path.join(ckpt_dir, stale))


def latest_checkpoint(ckpt_dir) -> Optional[str]:
    """Path of the newest ``ckpt_NNNNNN.npz`` in a directory, or None."""
    import os

    if not os.path.isdir(ckpt_dir):
        return None
    names = sorted(
        n
        for n in os.listdir(ckpt_dir)
        if n.startswith("ckpt_") and n.endswith(".npz")
    )
    return os.path.join(ckpt_dir, names[-1]) if names else None


def _load_latest_train_checkpoint(ckpt_dir, params, opt_state):
    import jax.numpy as jnp

    from tpu21cmvae.models.checkpoint import load_checkpoint

    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    template = {"params": params, "opt_state": opt_state, "best_weights": params}
    tree, meta = load_checkpoint(path, like=template)
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    # the int32 step counter must stay integral after the numpy round trip
    tree["opt_state"] = tree["opt_state"]._replace(
        step=jnp.asarray(tree["opt_state"].step, jnp.int32)
    )
    return tree, meta


def _progress_bar(total):
    try:
        from tqdm import tqdm

        return tqdm(total=total, desc="train", leave=False)
    except ImportError:  # pragma: no cover
        return None


def make_mlp_loss(apply_fn: Callable, per_sample_loss: Callable) -> LossFn:
    """Compose a forward function and a per-sample loss into the
    ``loss_fn`` signature :func:`fit` expects."""

    def loss_fn(params, x, y):
        return per_sample_loss(y, apply_fn(params, x))

    return loss_fn
