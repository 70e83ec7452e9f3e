"""Deep-ensemble emulation: predictive uncertainty from seed replicas.

The reference emulator is a point estimator — it reports test-set error
statistics (reference ``emulator.py:409-439``) but gives a user no
per-prediction uncertainty. The standard fix for deterministic nets is
a deep ensemble: train N replicas from different seeds and read the
spread. TPU-native design: the members' weight pytrees are STACKED along
a leading axis and the pure predict function is ``vmap``-ed over it, so
an N-member ensemble prediction is one device call of N-fold batched
matmuls (MXU-friendly; N=5 of the flagship is still <2 M params) — not
N sequential model calls.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu21cmvae.data.dataset import DataSplits
from tpu21cmvae.models.direct import DirectEmulator
from tpu21cmvae.utils.config import DirectEmulatorConfig, TrainConfig
from tpu21cmvae.utils.metrics import error


class DeepEnsemble:
    """N independently trained :class:`DirectEmulator` replicas behind
    one vmapped prediction function."""

    def __init__(self, members: Sequence[DirectEmulator]):
        if not members:
            raise ValueError("ensemble needs at least one member")
        cfg = members[0].config
        for m in members[1:]:
            if m.config != cfg:
                raise ValueError(
                    "ensemble members must share one architecture; got "
                    f"{m.config} vs {cfg}"
                )
        # the vmapped predict closes over member 0's Normalizer, so every
        # member MUST share the same normalization constants — silently
        # mixing weights trained against different statistics would make
        # predictions and the advertised uncertainty wrong
        n0 = members[0].normalizer
        for i, m in enumerate(members[1:], start=1):
            same = jax.tree_util.tree_all(
                jax.tree_util.tree_map(
                    lambda a, b: jnp.allclose(a, b), n0, m.normalizer
                )
            )
            if not same:
                raise ValueError(
                    f"member {i}'s normalization constants differ from "
                    "member 0's — ensemble members must be trained "
                    "against the same training-set statistics"
                )
        self.members: List[DirectEmulator] = list(members)
        self.config = cfg
        self.normalizer = n0
        self.frequencies = members[0].frequencies
        self.redshifts = members[0].redshifts
        self.par_labels = members[0].par_labels
        # stack the weight pytrees: each leaf gains a leading member axis
        self.stacked_params = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *(m.params for m in members)
        )
        base = members[0].predict_fn()
        self._vpredict = jax.jit(jax.vmap(base, in_axes=(0, None)))

    # -- construction ------------------------------------------------------

    @classmethod
    def train(
        cls,
        data: DataSplits,
        n_members: int = 5,
        config: DirectEmulatorConfig = DirectEmulatorConfig(),
        train_config: Optional[TrainConfig] = None,
        seeds: Optional[Sequence[int]] = None,
        device_loop: bool = True,
        verbose: bool = False,
    ) -> "DeepEnsemble":
        """Train ``n_members`` replicas from different init/shuffle seeds
        (same data, same recipe — the deep-ensembles construction)."""
        seeds = list(seeds) if seeds is not None else list(range(n_members))
        members = []
        for s in seeds:
            m = DirectEmulator(data, config=config, seed=s)
            m.train(train_config=train_config, device_loop=device_loop,
                    verbose=verbose)
            members.append(m)
        return cls(members)

    @classmethod
    def from_checkpoints(
        cls, paths: Sequence[str], data: Optional[DataSplits] = None
    ) -> "DeepEnsemble":
        return cls([DirectEmulator.from_checkpoint(p, data) for p in paths])

    def save(self, directory: str) -> List[str]:
        """One checkpoint per member: ``member_00.npz`` … (atomic)."""
        import os

        os.makedirs(directory, exist_ok=True)
        return [
            m.save(os.path.join(directory, f"member_{i:02d}.npz"))
            for i, m in enumerate(self.members)
        ]

    @classmethod
    def load(cls, directory: str, data: Optional[DataSplits] = None):
        import glob
        import os

        paths = sorted(glob.glob(os.path.join(directory, "member_*.npz")))
        if not paths:
            raise FileNotFoundError(f"no member_*.npz under {directory}")
        return cls.from_checkpoints(paths, data)

    # -- inference ---------------------------------------------------------

    def member_predictions(self, params) -> np.ndarray:
        """(n_members, n, 451) raw member signals for a parameter batch."""
        raw = jnp.atleast_2d(jnp.asarray(params, jnp.float32))
        return np.asarray(self._vpredict(self.stacked_params, raw))

    def predict(self, params) -> np.ndarray:
        """Ensemble-mean signal(s); same squeeze convention as
        :meth:`DirectEmulator.predict`."""
        mean = self.member_predictions(params).mean(axis=0)
        return mean[0] if mean.shape[0] == 1 else mean

    def predict_with_uncertainty(
        self, params
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(mean, std) over members, per frequency bin — an emulation
        error bar the reference cannot provide."""
        preds = self.member_predictions(params)
        mean, std = preds.mean(axis=0), preds.std(axis=0)
        if mean.shape[0] == 1:
            return mean[0], std[0]
        return mean, std

    # -- evaluation --------------------------------------------------------

    def test_error(self, relative: bool = True, flow=None, fhigh=None):
        """Per-signal test error of the ensemble-mean prediction."""
        data = self.members[0].data
        if data is None:
            raise ValueError("No dataset attached; construct members with "
                             "`data=`.")
        return error(
            data.signal_test,
            self.predict(data.par_test),
            relative=relative,
            nu_arr=self.frequencies,
            flow=flow,
            fhigh=fhigh,
        )
