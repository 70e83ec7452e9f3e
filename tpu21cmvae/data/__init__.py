from tpu21cmvae.data.dataset import (  # noqa: F401
    DATASET_URL,
    DataSplits,
    default_cache_path,
    download_dataset,
    ensure_dataset,
    load_dataset,
    save_dataset,
)
from tpu21cmvae.data.synthetic import synthetic_dataset, synthetic_signals  # noqa: F401
