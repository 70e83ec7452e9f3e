"""On-device nested sampling — robust Bayesian evidence for sharp,
rugged, multimodal emulator posteriors.

Nested sampling (Skilling 2006) is THE evidence workflow of 21-cm
analyses — the reference's users run MultiNest/PolyChord around ~40 ms
``predict`` calls (reference ``README.rst:9-11``; Bye et al. 2022 §4).
Here the whole sampler is a TPU program over the bench-selected fused
likelihood (:func:`tpu21cmvae.ops.loglik.make_loglik`).

Why this exists next to :func:`tpu21cmvae.sampling.log_evidence` (the
parallel-tempering stepping-stone path): measured on real trained-
emulator posteriors, the PT ladder is NOT reliable — its estimate
drifts by hundreds of nats as the ladder densifies (−380 → −704 → −953
at K = 32 → 128 → 256 on the same problem) and keeps ~75–115-nat
seed-to-seed scatter even when warm-started from a converged multi-
start fit, while its within-run split-half error reads ~0.2 (each run
is stuck in its own quasi-stationary state; the landscape is rugged
and effectively multimodal). Nested sampling sidesteps equilibration
entirely: it only ever needs samples UNIFORM in the prior above a
rising likelihood threshold, compresses geometrically by construction,
and handles multimodality by carrying ``n_live`` points that populate
every mode in proportion to volume. Measured on the same problem, its
seed-to-seed spread is ~1 nat (docs/PERF.md).

TPU mapping: the classic algorithm kills ONE point per iteration —
serial and tiny. Here each iteration kills the ``n_batch`` worst live
points at once and regrows them with ``n_mh`` Metropolis steps
constrained to ``logL > L*``, all chains advancing in one batched
likelihood call per step; iterations run inside ``lax.scan`` chunks
with only the stop test on the host. Volume bookkeeping stays exact
for batched deaths: death ``m`` of a batch shrinks ``log X`` by
``1/(n_live − m)`` (the standard result with deaths ordered within the
batch), and all weight arithmetic is done in log space so posteriors
compressed by thousands of nats don't underflow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.sampling import _init_walkers, _resolve_bounds

__all__ = ["NestedResult", "nested_sampling"]


def _log1mexp(neg_delta: np.ndarray) -> np.ndarray:
    """log(1 - exp(neg_delta)) for neg_delta < 0, stable near 0."""
    neg_delta = np.minimum(neg_delta, -1e-300)
    out = np.empty_like(neg_delta)
    small = neg_delta > -0.6931471805599453  # log 2
    out[small] = np.log(-np.expm1(neg_delta[small]))
    out[~small] = np.log1p(-np.exp(neg_delta[~small]))
    return out


@dataclasses.dataclass
class NestedResult:
    """Result of :func:`nested_sampling`.

    ``logz`` / ``logz_err``: the evidence ``log Z = log ∫ L π dθ``
    under the flat box prior and its statistical error
    ``sqrt(H / n_live)`` (Skilling 2006 §6; H is the information —
    prior-to-posterior compression in nats). Unlike the PT ladder's
    split-half error this bound is structural: volume shrinkage is
    geometric by construction, so there is no unequilibrated-chain
    failure mode for it to miss. ``samples`` / ``logl`` / ``log_w``:
    all dead + final live points, their log-likelihoods, and NORMALIZED
    posterior log-weights (``logsumexp(log_w) = 0``) — use
    :meth:`posterior` for equal-weight resampling. ``logx``: each
    sample's log prior-volume coordinate. ``ess``: Kish effective
    sample size of the weighted posterior. ``n_like``: total
    likelihood rows evaluated. ``truncated``: True if ``max_iters``
    hit before the live-set remainder fell below ``stop_frac`` of the
    accumulated evidence — the estimate is then a lower bound;
    raise ``max_iters``/``n_live``.
    """

    logz: float
    logz_err: float
    h: float
    samples: np.ndarray
    logl: np.ndarray
    log_w: np.ndarray
    logx: np.ndarray
    ess: float
    n_iters: int
    n_like: int
    accept_rate: float
    truncated: bool

    def posterior(self, n: int, seed: int = 0) -> np.ndarray:
        """Equal-weight posterior draws by multinomial resampling."""
        rng = np.random.default_rng(seed)
        p = np.exp(self.log_w - self.log_w.max())
        p /= p.sum()
        idx = rng.choice(len(p), size=n, p=p)
        return self.samples[idx]

    def summary(self) -> str:
        note = (
            "  ** truncated at max_iters: logz is a LOWER bound — "
            "raise max_iters or n_live **"
            if self.truncated
            else ""
        )
        return (
            f"log Z = {self.logz:.4f} ± {self.logz_err:.3f}  "
            f"(H = {self.h:.1f} nats, {self.n_iters} dead points, "
            f"ESS {self.ess:.0f}, MH accept {self.accept_rate:.2f})"
            f"{note}"
        )


def nested_sampling(
    loglik,
    params,
    *,
    n_live: int = 1024,
    n_batch: int | None = None,
    n_mh: int = 24,
    bounds=None,
    target_accept: float = 0.3,
    stop_frac: float = 1e-3,
    max_iters: int = 4096,
    iters_per_chunk: int = 32,
    seed: int = 0,
    prior_transform=None,
    mesh=None,
) -> NestedResult:
    """Evidence by batched nested sampling over the flat box prior.

    ``loglik(params, x)`` maps ``(B, n_params)`` rows to ``(B,)`` log-
    likelihoods (e.g. :meth:`DirectEmulator.loglik_fn`'s output).
    Each iteration replaces the ``n_batch`` (default ``n_live // 8``)
    worst live points: survivor-seeded Metropolis chains take ``n_mh``
    steps with proposals scaled by the survivors' per-dimension spread
    times a globally adapted factor (driven toward ``target_accept``
    inside the scan), accepting only in-box moves with
    ``logL > L*``. Runs ``iters_per_chunk`` iterations per device
    program and stops once the live-set remainder
    ``max(logL_live) + log X`` can contribute less than ``stop_frac``
    of the evidence accumulated so far.

    Cost: ``n_iters × n_mh`` batched likelihood calls of ``n_batch``
    rows, where ``n_iters ≈ n_live · H / n_batch`` — about 10⁶ rows
    for the defaults on a 50-nat-compression posterior, i.e. well
    under a minute through the tunnel-attached chip and seconds once
    resident (docs/PERF.md measures the real-posterior case).

    ``prior_transform``: optional unit-cube map (the MultiNest/dynesty
    convention — e.g.
    :meth:`tpu21cmvae.priors.GaussianBoxPrior.prior_transform`): a
    traceable ``(B, P) u ∈ [0,1]^P → θ`` such that uniform ``u`` is
    prior-distributed ``θ``. The sampler then explores in ``u``-space
    where ANY prior is uniform — the plain ``logL > L*`` rule and the
    exact volume bookkeeping carry over unchanged, which is why nested
    sampling wants the transform view rather than a density. ``bounds``
    then only fixes the dimensionality (the transform encodes the
    geometry); returned ``samples`` are in RAW θ units either way, and
    ``logz`` is the evidence under the transform's (normalized) prior.

    ``mesh``: optional :class:`jax.sharding.Mesh` — the live set and
    the per-iteration MH chains shard over its devices (``n_live`` and
    ``n_batch`` must divide evenly), so every constrained-likelihood
    batch runs on local rows. The survivor argsort/gather touches only
    the tiny ``(n_live, n_params)`` coordinate array; the replacement
    chains are re-pinned to the mesh each iteration so the ``n_mh``
    likelihood scan — where all the FLOPs are — stays partitioned.
    """
    lo_raw, hi_raw = _resolve_bounds(bounds)
    n_params = int(lo_raw.shape[0])
    if prior_transform is None:
        lo, hi = lo_raw, hi_raw

        def to_theta(u):
            return u

    else:
        lo = jnp.zeros((n_params,), jnp.float32)
        hi = jnp.ones((n_params,), jnp.float32)
        to_theta = prior_transform
    if n_batch is None:
        n_batch = max(1, n_live // 8)
    if not 1 <= n_batch < n_live:
        raise ValueError(
            f"n_batch must be in [1, n_live); got {n_batch} vs {n_live}"
        )
    mid = (lo + hi) / 2.0
    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(mesh.devices.size)
        if n_live % n_dev or n_batch % n_dev:
            raise ValueError(
                f"n_live ({n_live}) and n_batch ({n_batch}) must divide "
                f"evenly across the {n_dev}-device mesh"
            )
        _rows = NamedSharding(mesh, PartitionSpec(mesh.axis_names, None))

        def pin_rows(a):
            return jax.lax.with_sharding_constraint(a, _rows)

    else:

        def pin_rows(a):
            return a

    def safe_ll(flat):
        inside = ((flat >= lo) & (flat <= hi)).all(axis=1)
        ll = loglik(params, to_theta(jnp.where(inside[:, None], flat, mid)))
        return jnp.where(inside, ll, -jnp.inf)

    def one_iter(state, k):
        x, ll, log_scale = state
        k_start, k_mh = jax.random.split(k)
        order = jnp.argsort(ll)
        dead_idx = order[:n_batch]
        lstar = ll[order[n_batch - 1]]
        surv_idx = order[n_batch:]
        xs = x[surv_idx]
        # per-dim survivor spread sets the proposal shape; the adapted
        # global factor sets its size (degenerate dims get a floor so
        # chains can still move off a collapsed face)
        std = jnp.std(xs, axis=0) + 1e-7 * (hi - lo)
        starts = surv_idx[
            jax.random.randint(k_start, (n_batch,), 0, n_live - n_batch)
        ]
        # re-pin the replacement chains: the survivor gather above would
        # otherwise leave them replicated, serializing the MH likelihood
        # scan below (the FLOP-dominant part) on every device
        xc, llc = pin_rows(x[starts]), ll[starts]
        scale = jnp.exp(log_scale)

        def mh(carry, kk):
            xc, llc, nacc = carry
            kk1, kk2 = jax.random.split(kk)
            prop = xc + scale * std * jax.random.normal(
                kk1, xc.shape, xc.dtype
            )
            llp = safe_ll(prop)
            ok = llp > lstar
            xc = jnp.where(ok[:, None], prop, xc)
            llc = jnp.where(ok, llp, llc)
            return (xc, llc, nacc + jnp.mean(ok)), None

        (xc, llc, nacc), _ = jax.lax.scan(
            mh, (xc, llc, 0.0), jax.random.split(k_mh, n_mh)
        )
        acc = nacc / n_mh
        dead_ll = ll[dead_idx]  # ascending
        dead_x = x[dead_idx]
        x = x.at[dead_idx].set(xc)
        ll = ll.at[dead_idx].set(llc)
        log_scale = jnp.clip(
            log_scale + 0.5 * (acc - target_accept), -8.0, 2.0
        )
        return (x, ll, log_scale), (dead_ll, dead_x, acc)

    @jax.jit
    def run_chunk(x, ll, log_scale, keys):
        (x, ll, log_scale), (dll, dx, accs) = jax.lax.scan(
            one_iter, (x, ll, log_scale), keys
        )
        return x, ll, log_scale, dll, dx, accs

    @jax.jit
    def init(k):
        x = pin_rows(_init_walkers(k, n_live, lo, hi))
        return x, safe_ll(x)

    x, ll = init(k_init)
    log_scale = jnp.float32(0.0)
    # exact batched shrinkage: death m of a batch shrinks log X by
    # 1/(n_live - m); deaths within a batch are ordered ascending in L
    per_death = 1.0 / (n_live - np.arange(n_batch, dtype=np.float64))
    batch_shrink = per_death.sum()
    cum_in_batch = np.cumsum(per_death)

    dead_ll_chunks: list[np.ndarray] = []
    dead_x_chunks: list[np.ndarray] = []
    acc_chunks: list[np.ndarray] = []
    n_done = 0
    truncated = True
    chunk_keys = jax.random.split(k_run, -(-max_iters // iters_per_chunk))
    for ck in chunk_keys:
        keys = jax.random.split(ck, iters_per_chunk)
        x, ll, log_scale, dll, dx, accs = run_chunk(x, ll, log_scale, keys)
        dead_ll_chunks.append(np.asarray(dll, np.float64))
        dead_x_chunks.append(np.asarray(dx))
        acc_chunks.append(np.asarray(accs))
        n_done += iters_per_chunk
        # stop test: can the live set still move the total?
        dead_flat = np.concatenate(dead_ll_chunks).reshape(-1)
        logx_now = -n_done * batch_shrink
        logz_dead = _logz_dead(dead_flat, batch_shrink, cum_in_batch)
        ll_host = np.asarray(ll, np.float64)
        remainder = (
            logx_now
            + np.logaddexp.reduce(ll_host)
            - np.log(n_live)
        )
        if remainder < logz_dead + np.log(stop_frac):
            truncated = False
            break

    dead_ll = np.concatenate(dead_ll_chunks).reshape(-1)
    dead_x = np.concatenate(dead_x_chunks).reshape(-1, n_params)
    n_iters = len(dead_ll)
    n_chunks_done = n_done // iters_per_chunk

    # exact log-volume ladder for every death, then the live remainder
    j = np.arange(n_iters) // n_batch
    i = np.arange(n_iters) % n_batch
    logx = -(j * batch_shrink + cum_in_batch[i])
    logx_prev = np.concatenate([[0.0], logx[:-1]])
    log_dx = logx_prev + _log1mexp(logx - logx_prev)
    ll_live = np.asarray(ll, np.float64)
    x_live = np.asarray(x)
    logx_final = logx[-1] if n_iters else 0.0
    log_dx_live = np.full(n_live, logx_final - np.log(n_live))

    all_ll = np.concatenate([dead_ll, ll_live])
    all_x = np.concatenate([dead_x, x_live])
    if prior_transform is not None:
        # internal coordinates were unit-cube u; report RAW θ
        all_x = np.asarray(jax.jit(to_theta)(jnp.asarray(all_x, jnp.float32)))
    all_logx = np.concatenate([logx, np.full(n_live, logx_final)])
    log_w = np.concatenate([dead_ll + log_dx, ll_live + log_dx_live])
    logz = np.logaddexp.reduce(log_w)
    log_p = log_w - logz
    p = np.exp(log_p)
    finite = np.isfinite(all_ll)
    h = float((p[finite] * (all_ll[finite] - logz)).sum())
    ess = float(1.0 / (p**2).sum())
    return NestedResult(
        logz=float(logz),
        logz_err=float(np.sqrt(max(h, 0.0) / n_live)),
        h=h,
        samples=all_x,
        logl=all_ll,
        log_w=log_p,
        logx=all_logx,
        ess=ess,
        n_iters=n_iters,
        n_like=n_live + n_chunks_done * iters_per_chunk * n_batch * n_mh,
        accept_rate=float(np.concatenate(acc_chunks).mean()),
        truncated=truncated,
    )


def _logz_dead(
    dead_ll: np.ndarray, batch_shrink: float, cum_in_batch: np.ndarray
) -> float:
    n_batch = len(cum_in_batch)
    n = len(dead_ll)
    j = np.arange(n) // n_batch
    i = np.arange(n) % n_batch
    logx = -(j * batch_shrink + cum_in_batch[i])
    logx_prev = np.concatenate([[0.0], logx[:-1]])
    log_dx = logx_prev + _log1mexp(logx - logx_prev)
    return float(np.logaddexp.reduce(dead_ll + log_dx))
