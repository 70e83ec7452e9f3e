from tpu21cmvae.data.dataset import (  # noqa: F401
    DATASET_URL,
    DataSplits,
    download_dataset,
    load_dataset,
)
from tpu21cmvae.data.synthetic import synthetic_dataset, synthetic_signals  # noqa: F401
from tpu21cmvae.data.dataset import (  # noqa: F401
    default_cache_path,
    ensure_dataset,
    save_dataset,
)
