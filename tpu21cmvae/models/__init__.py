from tpu21cmvae.models.direct import DirectEmulator  # noqa: F401
from tpu21cmvae.models.autoencoder import AutoEncoder, AutoEncoderEmulator  # noqa: F401
from tpu21cmvae.models.vae import VAE, VAEEmulator  # noqa: F401
from tpu21cmvae.models.io_keras import load_keras_mlp  # noqa: F401
from tpu21cmvae.models.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from tpu21cmvae.models.io_keras import save_keras_mlp  # noqa: F401
from tpu21cmvae.models.checkpoint import read_checkpoint_meta  # noqa: F401
from tpu21cmvae.models.ensemble import DeepEnsemble  # noqa: F401


def load_model(path: str, data=None):
    """Restore any saved emulator by dispatching on the checkpoint's
    ``kind`` metadata (DirectEmulator / AutoEncoderEmulator /
    VAEEmulator). A DIRECTORY of ``member_*.npz`` checkpoints (the
    layout :meth:`DeepEnsemble.save` writes) loads as a
    :class:`DeepEnsemble`. Only the metadata header is read for
    dispatch; the weights load once inside the family's
    ``from_checkpoint``."""
    import os

    if os.path.isdir(path):
        return DeepEnsemble.load(path, data)
    kind = read_checkpoint_meta(path).get("kind", "DirectEmulator")
    cls = {
        "DirectEmulator": DirectEmulator,
        "AutoEncoderEmulator": AutoEncoderEmulator,
        "VAEEmulator": VAEEmulator,
    }[kind]
    return cls.from_checkpoint(path, data)
