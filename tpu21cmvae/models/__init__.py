from tpu21cmvae.models.direct import DirectEmulator  # noqa: F401
from tpu21cmvae.models.autoencoder import AutoEncoder, AutoEncoderEmulator  # noqa: F401
from tpu21cmvae.models.vae import VAE, VAEEmulator  # noqa: F401
from tpu21cmvae.models.io_keras import load_keras_mlp  # noqa: F401
from tpu21cmvae.models.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
