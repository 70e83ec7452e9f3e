"""Instance-level memo for jitted likelihood programs.

The model-level likelihood factories (``loglik_fn``,
``loglik_and_grad_fn``, ``loglik_multi_fn``) build a fresh closure and
``jax.jit`` wrapper per call. Without memoization every
``model.sample_posterior(obs, …)`` call therefore starts from a cold
program — the sampler-side chain-program cache
(:func:`tpu21cmvae.sampling._chain_program`) lives ON the likelihood
object, so a fresh likelihood means a fresh 20–60 s trace+compile even
for byte-identical arguments. Memoizing the factory on the model
instance makes the likelihood object identity follow the VALUE of
``(obs, noise_var, flags)``: repeated sampling / evidence / profile
calls on the same observation reuse one program stack end to end.

Bounded at ``_CAP`` entries per model with LRU eviction (the
``fisher_forecast`` cache precedent, ``models/direct.py``); an evicted
likelihood — and the chain programs cached on it — become garbage as
soon as the caller drops its own reference. Callers that manage
likelihood lifetimes themselves (the HTTP serving layer's
per-observation LRU, ``serve.py``) pass ``memo=False`` to keep sole
ownership.
"""

from __future__ import annotations

import collections

import numpy as np

_CAP = 8


def _key_part(p):
    if isinstance(p, np.ndarray):
        return p.tobytes()
    return p


def noise_key(noise_var):
    """Value-identity key part for a noise spec: arrays/scalars key by
    float64 bytes; objects exposing ``memo_key()`` (e.g.
    :class:`tpu21cmvae.foregrounds.MarginalizedNoise`) key by it."""
    mk = getattr(noise_var, "memo_key", None)
    if callable(mk):
        return mk()
    return np.asarray(noise_var, np.float64)


def memo_program(model, key_parts, build, *, memo: bool = True):
    """Return ``build()`` memoized on ``model`` under ``key_parts``.

    ``key_parts``: tuple of hashables; ``np.ndarray`` entries are keyed
    by their bytes (callers normalize dtype first so byte-equality
    means value-equality). ``memo=False`` bypasses the cache entirely.
    """
    if not memo:
        return build()
    key = tuple(_key_part(p) for p in key_parts)
    cache = model.__dict__.setdefault(
        "_t21_loglik_memo", collections.OrderedDict()
    )
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = build()
        if len(cache) > _CAP:
            cache.popitem(last=False)
    else:
        cache.move_to_end(key)
    return fn
