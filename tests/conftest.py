"""Test environment: force an 8-device virtual CPU platform.

Must run before anything imports jax — multi-chip sharding tests run on a
virtual CPU mesh (real multi-chip hardware is not available in CI), and
Pallas kernels run in interpreter mode on CPU.
"""

import os

# force-override: the ambient environment pins JAX_PLATFORMS to the real
# TPU tunnel and a sitecustomize hook re-registers it at interpreter
# startup; the test suite always runs on the virtual CPU mesh, so set the
# env AND the jax config (backends initialize lazily — updating the
# config before first device use wins).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# opt-in numerical tripwire for CI (SURVEY.md §5: the functional
# replacement for sanitizer tooling): TPU21CMVAE_DEBUG_NANS=1 makes any
# NaN produced under jit raise instead of propagating
if os.environ.get("TPU21CMVAE_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def splits():
    """Small synthetic dataset shared across the suite."""
    from tpu21cmvae.data import synthetic_dataset

    return synthetic_dataset(n_train=512, n_val=128, n_test=128, seed=7)


@pytest.fixture(scope="session")
def normalizer(splits):
    from tpu21cmvae.ops.transforms import Normalizer

    return Normalizer.from_data(splits.par_train, splits.signal_train)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
