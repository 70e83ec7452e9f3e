from tpu21cmvae.ops.transforms import (  # noqa: F401
    Normalizer,
    par_transform,
    preproc,
    unpreproc,
)
from tpu21cmvae.ops.mlp import glorot_uniform_init, init_mlp, mlp_apply  # noqa: F401
from tpu21cmvae.ops.losses import (  # noqa: F401
    kl_divergence,
    mse,
    relative_mse,
)
from tpu21cmvae.ops.loglik import make_loglik  # noqa: F401
from tpu21cmvae.ops.fisher import (  # noqa: F401
    forecast_errors,
    make_fisher,
    make_signal_jacobian,
)
