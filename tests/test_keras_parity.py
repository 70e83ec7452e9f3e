"""Golden-artifact parity: import the reference's shipped pretrained
Keras ``.h5`` weights and check our implementation reproduces their
structure and numerics.

These are the real artifacts the reference's own integration tests load
(reference ``tests/test_emulator.py:83-85``; files under
``VeryAccurateEmulator/models/autoencoder_based_emulator/``). The tests
skip cleanly when the reference mount is absent. The 21cmGEM dataset is
not in the mount (Zenodo download, reference ``__init__.py:8-16``), so
the published accuracy numbers cannot be checked here — what IS checked:

* the h5 reader recovers the exact published architectures
  (encoder 451→352→9, decoder 9→32→352→451, ae_emulator
  7→352→352→352→224→9 — reference ``emulator.py:521-525``);
* our pure-JAX forward pass on the imported weights matches an
  independent NumPy float64 reference computation of the same network
  (i.e. the Dense-stack semantics — kernel layout, bias add, ReLU
  placement, linear head — are exactly Keras');
* encoder→decoder composition through ``AutoEncoderEmulator`` wiring.
"""

import os

import numpy as np
import pytest

REF_DIR = "/root/reference/VeryAccurateEmulator/models/autoencoder_based_emulator"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference pretrained models not mounted"
)


def _h5(name):
    return os.path.join(REF_DIR, name)


@pytest.fixture(scope="module")
def imported():
    from tpu21cmvae.models.io_keras import load_keras_mlp

    return {
        "encoder": load_keras_mlp(_h5("encoder.h5")),
        "decoder": load_keras_mlp(_h5("decoder.h5")),
        "ae_emulator": load_keras_mlp(_h5("ae_emulator.h5")),
    }


def test_imported_architectures_match_published(imported):
    from tpu21cmvae.ops.mlp import mlp_sizes

    assert mlp_sizes(imported["encoder"]) == (451, 352, 9)
    assert mlp_sizes(imported["decoder"]) == (9, 32, 352, 451)
    assert mlp_sizes(imported["ae_emulator"]) == (7, 352, 352, 352, 224, 9)


def test_imported_weights_are_finite_f32(imported):
    import jax.numpy as jnp

    for params in imported.values():
        for layer in params:
            assert layer["w"].dtype == jnp.float32
            assert bool(np.isfinite(np.asarray(layer["w"])).all())
            assert bool(np.isfinite(np.asarray(layer["b"])).all())


def _numpy_mlp(params, x):
    """Independent float64 recomputation of the Keras Dense stack:
    y = relu(x@W + b) per hidden layer, linear final layer."""
    h = np.asarray(x, np.float64)
    n = len(params)
    for i, layer in enumerate(params):
        h = h @ np.asarray(layer["w"], np.float64) + np.asarray(
            layer["b"], np.float64
        )
        if i < n - 1:
            h = np.maximum(h, 0.0)
    return h


@pytest.mark.parametrize("name,in_dim", [("encoder", 451), ("decoder", 9), ("ae_emulator", 7)])
def test_forward_matches_numpy_reference(imported, name, in_dim):
    from tpu21cmvae.ops.mlp import mlp_apply

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, in_dim)).astype(np.float32)
    ours = np.asarray(mlp_apply(imported[name], x))
    ref = _numpy_mlp(imported[name], x)
    scale = np.abs(ref).max() + 1.0
    np.testing.assert_allclose(ours / scale, ref / scale, atol=2e-6)


def test_autoencoder_roundtrip_contracts(imported):
    """decoder(encoder(x)) through the imported weights: a standardized
    signal-shaped input maps 451→9→451 and the pipeline wiring in
    AutoEncoderEmulator produces the same numbers as manual composition."""
    import jax.numpy as jnp

    from tpu21cmvae.models.autoencoder import AutoEncoderEmulator
    from tpu21cmvae.data import synthetic_dataset
    from tpu21cmvae.ops.mlp import mlp_apply
    from tpu21cmvae.ops.transforms import preproc, unpreproc

    data = synthetic_dataset(n_train=256, n_val=32, n_test=32, seed=0)
    model = AutoEncoderEmulator.from_keras_h5(
        _h5("ae_emulator.h5"), _h5("encoder.h5"), _h5("decoder.h5"), data=data
    )
    assert model.config.latent_dim == 9

    sig = jnp.asarray(data.signal_test[:8], jnp.float32)
    got = model.reconstruct(np.asarray(sig))

    norm = model.normalizer
    y = preproc(sig, norm)
    z = mlp_apply(model.autoencoder.enc_params, y)
    rec = mlp_apply(model.autoencoder.dec_params, z)
    want = np.asarray(unpreproc(rec, norm))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # end-to-end predict wiring: params → emulator → decoder → mK
    pred = model.predict(data.par_test[:4])
    assert pred.shape == (4, 451)
    assert np.isfinite(pred).all()


def test_adam_state_not_misread_as_layers():
    """ae_emulator.h5 carries Adam optimizer state; the loader must read
    only the model weights (6 Dense layers → 5 weight-bearing? no:
    7→352→352→352→224→9 = 5 layers) and chain their shapes."""
    from tpu21cmvae.models.io_keras import load_keras_mlp

    params = load_keras_mlp(_h5("ae_emulator.h5"))
    assert len(params) == 5