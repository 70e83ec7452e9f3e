from tpu21cmvae.train.adam import AdamState, adam_init, adam_update  # noqa: F401
from tpu21cmvae.train.callbacks import EarlyStopping, ReduceLROnPlateau  # noqa: F401
from tpu21cmvae.train.loop import History, fit  # noqa: F401
