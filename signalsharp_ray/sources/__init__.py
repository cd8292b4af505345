from .synth import (
    WebPagesSpec,
    generate_webpages_dataset,
    generate_webpages_shard,
    write_webpages_parquet,
)

__all__ = [
    "WebPagesSpec",
    "generate_webpages_shard",
    "generate_webpages_dataset",
    "write_webpages_parquet",
]
