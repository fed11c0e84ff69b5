from minivectordb_spark.sources.migrate import (
    load_reference_pickle,
    load_reference_sharded_dir,
    migrate_parquet,
)

__all__ = [
    "load_reference_pickle",
    "load_reference_sharded_dir",
    "migrate_parquet",
]
