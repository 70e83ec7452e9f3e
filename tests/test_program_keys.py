"""Structural completeness of the chain-program cache keys.

Round-4's measured bug class: a hand-assembled key tuple dropped one
baked boolean (`n_warm3 > 0`) and a cache hit replayed the wrong
compiled warmup program at 99 % NUTS divergences. Round 5 closes the
CLASS, not the instance (round-4 VERDICT "next round" item 4):

* every sampler's statics live in ONE frozen program-config dataclass
  and the cache key is derived from ALL of its fields automatically
  (``_auto_key``) — no builder assembles its key by hand;
* every program builder is a module-level function of exactly
  ``(fns..., bounds..., cfg)`` with NO free variables, so a baked
  static that is not in the key cannot exist;
* ``_key_atom`` refuses values it cannot faithfully hash.

These tests pin all three properties, plus the end-to-end one: configs
differing in each field produce DISTINCT compiled programs.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpu21cmvae.flows import _FlowFitProgram, _FlowISProgram
from tpu21cmvae.flows import _build_flow_fit_program, _build_flow_is_program
from tpu21cmvae.sampling._common import _auto_key, _key_atom
from tpu21cmvae.sampling.evidence import (
    _build_ladder_program,
    _build_laplace_hess,
    _build_laplace_hess_multi,
    _build_laplace_is,
    _build_laplace_is_multi,
    _LadderProgram,
    _LaplaceHessMultiProgram,
    _LaplaceHessProgram,
    _LaplaceISMultiProgram,
    _LaplaceISProgram,
)
from tpu21cmvae.sampling.fit import _AscentProgram, _build_ascent_program
from tpu21cmvae.sampling.gradient import (
    _build_chees_program,
    _build_hmc_program,
    _build_nuts_program,
    _CheesProgram,
    _HmcProgram,
    _NutsProgram,
)
from tpu21cmvae.sampling.mh import (
    _build_mh_program,
    _build_stretch_program,
    _MHProgram,
    _StretchProgram,
)
from tpu21cmvae.sampling.pt import _build_pt_program, _PTProgram
from tpu21cmvae.sampling.smc import _build_smc_program, _SMCProgram

CFG_CLASSES = [
    _MHProgram, _StretchProgram, _PTProgram, _SMCProgram,
    _AscentProgram, _HmcProgram, _CheesProgram, _NutsProgram,
    _LadderProgram, _LaplaceHessProgram, _LaplaceISProgram,
    _LaplaceHessMultiProgram, _LaplaceISMultiProgram,
    _FlowFitProgram, _FlowISProgram,
]

BUILDERS = [
    _build_mh_program, _build_stretch_program, _build_pt_program,
    _build_smc_program, _build_ascent_program, _build_hmc_program,
    _build_chees_program, _build_nuts_program, _build_ladder_program,
    _build_laplace_hess, _build_laplace_is, _build_laplace_hess_multi,
    _build_laplace_is_multi, _build_flow_fit_program,
    _build_flow_is_program,
]


def _example(cls):
    """A valid-typed instance with distinctive per-field values."""
    vals = {}
    for i, f in enumerate(dataclasses.fields(cls)):
        t = str(f.type)
        if t == "bool":
            vals[f.name] = True
        elif t == "int":
            vals[f.name] = 10 + i
        elif t == "float":
            vals[f.name] = 0.5 + 0.125 * i
        elif t == "str":
            vals[f.name] = f"s{i}"
        else:  # a new field type must be taught to this test
            raise AssertionError(
                f"{cls.__name__}.{f.name}: unhandled type {t!r}"
            )
    return cls(**vals)


def _perturb(cfg, field):
    v = getattr(cfg, field.name)
    if isinstance(v, bool):
        nv = not v
    elif isinstance(v, int):
        nv = v + 1
    elif isinstance(v, float):
        nv = v * 2.0 + 0.25
    else:
        nv = v + "_x"
    return dataclasses.replace(cfg, **{field.name: nv})


@pytest.mark.parametrize("cls", CFG_CLASSES, ids=lambda c: c.__name__)
def test_every_field_changes_the_key(cls):
    base = _example(cls)
    k0 = _auto_key(base)
    keys = {k0}
    for f in dataclasses.fields(cls):
        k = _auto_key(_perturb(base, f))
        assert k != k0, f"{cls.__name__}.{f.name} does not reach the key"
        keys.add(k)
    assert len(keys) == 1 + len(dataclasses.fields(cls))


def test_class_name_is_the_tag():
    # same field values, different config class → different key
    a = _auto_key(_example(_LaplaceHessProgram))
    b = _auto_key(_example(_LaplaceHessMultiProgram))
    assert a != b


def test_extras_reach_the_key():
    cfg = _example(_MHProgram)
    lo = np.zeros(3, np.float32)
    hi = np.ones(3, np.float32)
    k0 = _auto_key(cfg, lo, hi, None)
    assert _auto_key(cfg, lo, hi + 1.0, None) != k0
    assert _auto_key(cfg, lo, hi, lambda x: x) != k0
    # tuples recurse; shape/dtype are part of an array atom
    assert _auto_key(cfg, lo.astype(np.float64), hi, None) != k0


def test_key_atom_refuses_unrepresentable_values():
    with pytest.raises(TypeError):
        _key_atom([1, 2, 3])
    with pytest.raises(TypeError):
        _key_atom({"a": 1})


@pytest.mark.parametrize("builder", BUILDERS, ids=lambda b: b.__name__)
def test_builders_have_no_free_variables(builder):
    """A module-level builder cannot close over sampler-local statics —
    everything it bakes must arrive via its (keyed) arguments."""
    assert builder.__code__.co_freevars == ()


def test_distinct_programs_per_field_end_to_end():
    """Configs differing in each user-facing static compile DISTINCT
    programs (the cache grows by one per varied field)."""
    from tpu21cmvae.sampling import sample_mh

    def loglik(params, x):
        return -jnp.sum(x * x, axis=-1)

    bounds = np.array([[-1.0, 1.0]] * 3, np.float32)
    base = dict(n_walkers=16, n_steps=4, n_warmup=2, thin=2, seed=0)
    sample_mh(loglik, None, bounds=bounds, **base)
    n0 = len(loglik._t21_chain_cache)
    assert n0 == 1
    variants = [
        dict(step_frac=0.02),
        dict(target_accept=0.4),
        dict(adapt=False),
        dict(adapt_blocks=2),
        dict(thin=1),
        dict(n_warmup=0),
    ]
    for kw in variants:
        sample_mh(loglik, None, bounds=bounds, **{**base, **kw})
    assert len(loglik._t21_chain_cache) == n0 + len(variants)
    # and an identical repeat call hits the cache (no new entry)
    sample_mh(loglik, None, bounds=bounds, **base)
    assert len(loglik._t21_chain_cache) == n0 + len(variants)


def test_nuts_phase_structure_cannot_escape_the_key():
    """The round-4 bug shape: two NUTS configs identical except the
    derived third-warmup-phase structure must key differently — here
    the structure derives from keyed fields, so this holds by
    construction."""
    common = dict(
        n_walkers=32, n_warmup=40, max_depth=3, target_accept=0.8,
        init_step=0.01, thin=1, precondition=True, metric="dense",
        adapt_blocks=1,
    )
    a = _NutsProgram(dense_readapt=False, **common)
    b = _NutsProgram(dense_readapt=True, **common)
    assert a.phases() != b.phases()  # the structures genuinely differ
    assert _auto_key(a) != _auto_key(b)
