"""Explicit, lazy dataset handling for the 21cmGEM training set.

The reference downloads ~300 MB from Zenodo and loads six arrays into
module globals *at import time* (reference ``__init__.py:8-16``,
``emulator.py:198-204``). Here nothing happens at import: call
:func:`download_dataset` once (or point :func:`load_dataset` at an
existing file).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

DATASET_URL = (
    "https://zenodo.org/record/5084114/files/dataset_21cmVAE.h5?download=1"
)
"""Zenodo record for the 21cmGEM train/val/test splits
(reference ``__init__.py:12-14``)."""

_KEYS = (
    "par_train",
    "par_val",
    "par_test",
    "signal_train",
    "signal_val",
    "signal_test",
)


class DataSplits(NamedTuple):
    """The six arrays of the 21cmGEM dataset (h5 keys at reference
    ``emulator.py:199-204``). Signals are in mK over 451 bins, z=5-50."""

    par_train: np.ndarray
    par_val: np.ndarray
    par_test: np.ndarray
    signal_train: np.ndarray
    signal_val: np.ndarray
    signal_test: np.ndarray

    @property
    def n_params(self) -> int:
        return self.par_train.shape[-1]

    @property
    def n_bins(self) -> int:
        return self.signal_train.shape[-1]


def load_dataset(path: str) -> DataSplits:
    """Read the six splits from an HDF5 file into host memory."""
    import h5py

    with h5py.File(path, "r") as hf:
        return DataSplits(*(np.asarray(hf[k]) for k in _KEYS))


def download_dataset(
    dest: str, url: str = DATASET_URL, overwrite: bool = False
) -> str:
    """Fetch the dataset to ``dest`` (atomic write; skipped if present).

    Requires network access; import of ``requests`` is deferred so the
    package works fully offline with :mod:`tpu21cmvae.data.synthetic`.
    """
    if os.path.exists(dest) and not overwrite:
        return dest
    import requests

    from tpu21cmvae.utils.io import atomic_write

    # stream in 8 MB chunks — the file is ~300 MB; buffering it whole
    # in a requests Response wastes RAM and retries poorly
    with requests.get(url, timeout=600, stream=True) as r:
        r.raise_for_status()
        with atomic_write(dest) as f:
            for chunk in r.iter_content(chunk_size=8 << 20):
                f.write(chunk)
    return dest


def save_dataset(splits: DataSplits, path: str) -> str:
    """Write splits to HDF5 with the reference's key layout (readable by
    both :func:`load_dataset` and the reference's module-level loader at
    reference ``emulator.py:198-204``). Atomic like the downloader."""
    import h5py

    from tpu21cmvae.utils.io import atomic_write

    with atomic_write(path, suffix=".h5.part") as f:
        with h5py.File(f, "w") as hf:
            for key, arr in zip(_KEYS, splits):
                hf.create_dataset(key, data=np.asarray(arr))
    return path


def default_cache_path() -> str:
    """``$TPU21CMVAE_CACHE`` or ``~/.cache/tpu21cmvae/dataset_21cmVAE.h5``."""
    root = os.environ.get(
        "TPU21CMVAE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpu21cmvae"),
    )
    return os.path.join(root, "dataset_21cmVAE.h5")


def ensure_dataset(path: str = None) -> DataSplits:
    """Load the 21cmGEM dataset, downloading it to the cache first if
    needed — the explicit, lazy equivalent of the reference's import-time
    bootstrap (reference ``__init__.py:8-16``)."""
    path = path or default_cache_path()
    if not os.path.exists(path):
        download_dataset(path)
    return load_dataset(path)
