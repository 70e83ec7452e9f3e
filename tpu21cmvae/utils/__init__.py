from tpu21cmvae.utils.frequency import (  # noqa: F401
    NU_0,
    default_frequencies,
    default_redshifts,
    freq2redshift,
    redshift2freq,
)
from tpu21cmvae.utils.metrics import error  # noqa: F401
from tpu21cmvae.utils import config  # noqa: F401
