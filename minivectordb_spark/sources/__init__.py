from minivectordb_spark.sources.corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_corpus,
)
from minivectordb_spark.sources.migrate import (
    load_reference_pickle,
    load_reference_sharded_dir,
    migrate_parquet,
)

__all__ = [
    "load_reference_pickle",
    "load_reference_sharded_dir",
    "migrate_parquet",
    "read_csv_corpus",
    "read_jsonl_corpus",
    "read_text_corpus",
]
