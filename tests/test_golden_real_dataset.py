"""Golden accuracy tests against the REAL 21cmGEM dataset and pretrained
weights — the reference's headline numbers (Table 1 of Bye et al. 2022;
reference ``tests/test_emulator.py:55-113``; BASELINE.md).

These run only when the ~300 MB ``dataset_21cmVAE.h5`` is available
(``TPU21CMVAE_DATASET`` env var, the package cache, or the reference
mount) — it cannot be fetched in offline CI. They are the accuracy
contract for the rebuild; everything else in the suite runs on synthetic
data.

Note the reference's own suite contains two functions named
``test_test_error`` (``tests/test_emulator.py:72`` and ``:105``) — the
second shadows the first, so its direct-emulator accuracy assertions
never ran. Both families are asserted here, un-shadowed.
"""

import os

import numpy as np
import pytest

_CANDIDATES = [
    os.environ.get("TPU21CMVAE_DATASET", ""),
    os.path.join(
        os.path.expanduser("~"), ".cache", "tpu21cmvae", "dataset_21cmVAE.h5"
    ),
    "/root/reference/VeryAccurateEmulator/dataset_21cmVAE.h5",
]
DATASET = next((p for p in _CANDIDATES if p and os.path.exists(p)), None)
AE_DIR = "/root/reference/VeryAccurateEmulator/models/autoencoder_based_emulator"
DIRECT_H5 = "/root/reference/VeryAccurateEmulator/models/emulator.h5"

pytestmark = pytest.mark.skipif(
    DATASET is None, reason="real 21cmGEM dataset not available offline"
)


@pytest.fixture(scope="module")
def data():
    from tpu21cmvae.data import load_dataset

    return load_dataset(DATASET)


@pytest.mark.skipif(
    not os.path.exists(DIRECT_H5), reason="pretrained emulator.h5 not mounted"
)
def test_direct_emulator_golden(data):
    """Mean 0.34 % / median 0.29 % relative; 0.54 / 0.50 mK absolute
    (reference ``tests/test_emulator.py:72-80``, atol 1e-2)."""
    from tpu21cmvae.models.direct import DirectEmulator

    model = DirectEmulator.from_keras_h5(DIRECT_H5, data)
    rel = model.test_error(relative=True)
    ab = model.test_error(relative=False)
    assert np.isclose(rel.mean(), 0.34, atol=1e-2)
    assert np.isclose(np.median(rel), 0.29, atol=1e-2)
    assert np.isclose(ab.mean(), 0.54, atol=1e-2)
    assert np.isclose(np.median(ab), 0.50, atol=1e-2)
    assert rel.max() < 2.0  # reference tests/test_emulator.py:61-62


@pytest.mark.skipif(
    not os.path.isdir(AE_DIR), reason="pretrained AE models not mounted"
)
def test_ae_emulator_golden(data):
    """Mean 0.39 % / median 0.35 % (pipeline); 0.33 % / 0.29 %
    (pure reconstruction) — reference ``tests/test_emulator.py:88-113``."""
    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator

    model = AutoEncoderEmulator.from_keras_h5(
        os.path.join(AE_DIR, "ae_emulator.h5"),
        os.path.join(AE_DIR, "encoder.h5"),
        os.path.join(AE_DIR, "decoder.h5"),
        data=data,
    )
    rel = model.test_error(relative=True)
    assert rel.max() < 5.0
    assert np.isclose(rel.mean(), 0.39, atol=1e-2)
    assert np.isclose(np.median(rel), 0.35, atol=1e-2)
    rec = model.test_error(use_autoencoder=True, relative=True)
    assert np.isclose(rec.mean(), 0.33, atol=1e-2)
    assert np.isclose(np.median(rec), 0.29, atol=1e-2)


def test_batched_matches_single(data):
    """Batched predict equals row-by-row predict (reference
    ``tests/test_emulator.py:55-69``, atol 5e-5) — holds for any weights,
    so train a quick model if no pretrained file is mounted."""
    from tpu21cmvae.models.direct import DirectEmulator
    from tpu21cmvae.utils.config import TrainConfig

    if os.path.exists(DIRECT_H5):
        model = DirectEmulator.from_keras_h5(DIRECT_H5, data)
    else:
        model = DirectEmulator(data)
        model.train(train_config=TrainConfig(epochs=5), device_loop=True)
    batched = model.predict(data.par_test[:10])
    assert batched.shape == (10, data.n_bins)
    for i in range(10):
        np.testing.assert_allclose(
            batched[i], model.predict(data.par_test[i]), atol=5e-5
        )
