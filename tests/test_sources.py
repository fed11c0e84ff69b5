"""Migration-source tests: synthetic pickles matching the reference's
on-disk layout (vector_database.py:538-548, sharded_vector_database.py:134-154)
load into a queryable VectorTable."""

import pickle

import numpy as np
import pytest

from minivectordb_spark.sources import (
    load_reference_pickle,
    load_reference_sharded_dir,
    migrate_parquet,
)
from minivectordb_spark.table import VectorTable


def test_load_single_pickle(spark, tmp_path):
    emb = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], dtype=np.float32)
    data = {
        "embeddings": emb,
        "metadata": [{"type": "a", "rank": 1}, {"type": "b"}, {"type": "a"}],
        "id_map": {0: "x", 1: 42, 2: "z"},
        "inverse_id_map": {"x": 0, 42: 1, "z": 2},
        "inverted_index": {"type": {"x", 42, "z"}, "rank": {"x"}},
    }
    path = tmp_path / "db.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    t = load_reference_pickle(spark, str(path))
    assert t.count() == 3
    ids, scores, metas = t.find_most_similar([1.0, 0.0], metadata_filter={"type": "a"}, k=5)
    assert ids == ["x", "z"]
    assert t.get_vector("42") == [0.0, 1.0]


def test_load_empty_pickle(spark, tmp_path):
    path = tmp_path / "empty.pkl"
    with open(path, "wb") as f:
        pickle.dump({"embeddings": None, "metadata": [], "id_map": {}, "inverse_id_map": {}}, f)
    assert load_reference_pickle(spark, str(path)).count() == 0


def test_corrupt_pickle_raises(spark, tmp_path):
    path = tmp_path / "bad.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            {
                "embeddings": np.ones((2, 2), dtype=np.float32),
                "metadata": [{}],
                "id_map": {0: "a", 1: "b"},
                "inverse_id_map": {"a": 0, "b": 1},
            },
            f,
        )
    with pytest.raises(ValueError, match="Corrupt"):
        load_reference_pickle(spark, str(path))


def test_load_sharded_dir_order_and_contents(spark, tmp_path):
    # shard_10 sorts numerically AFTER shard_2 (reference sorts by number,
    # not lexicographically)
    shards = {
        "shard_2.pkl": (["a", "b"], [[1.0, 0.0], [0.0, 1.0]], [{"s": "two"}, {"s": "two"}]),
        "shard_10.pkl": (["c"], [[1.0, 1.0]], [{"s": "ten"}]),
    }
    for name, (ids, vecs, mds) in shards.items():
        with open(tmp_path / name, "wb") as f:
            pickle.dump(
                {
                    "embeddings": np.array(vecs, dtype=np.float32),
                    "metadata": mds,
                    "unique_ids": ids,
                    "inverted_index": {},
                },
                f,
            )
    t = load_reference_sharded_dir(spark, str(tmp_path))
    assert t.count() == 3
    ids, _, _ = t.find_most_similar([1.0, 1.0], metadata_filter={"s": "ten"}, k=5)
    assert ids == ["c"]


def test_migrate_parquet(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    VectorTable.empty(spark).store_embeddings_batch(
        ["a", "b"], [[1.0, 2.0], [3.0, 4.0]], [{"k": "v"}, {}]
    ).save(src)
    migrate_parquet(spark, src, dst, max_records_per_file=1)
    assert VectorTable.load(spark, dst).count() == 2


def test_read_jsonl_corpus(spark, tmp_path):
    from minivectordb_spark.sources import read_jsonl_corpus

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 7, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 8, "text": "bonjour", "extra": 1}\n'
    )
    df = read_jsonl_corpus(spark, str(p), source="unit")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert rows[7]["lang"] == "en" and rows[7]["n_chars"] == 11
    assert rows[8]["lang"] is None and rows[8]["source"] == "unit"


def test_read_jsonl_corpus_assigns_ids(spark, tmp_path):
    from minivectordb_spark.sources import read_jsonl_corpus

    p = tmp_path / "noid.jsonl"
    p.write_text('{"text": "a"}\n{"text": "b"}\n{"text": "c"}\n')
    df = read_jsonl_corpus(spark, str(p), id_col=None)
    ids = [r["doc_id"] for r in df.collect()]
    assert len(set(ids)) == 3  # unique, not necessarily contiguous


def test_read_csv_and_text_corpus(spark, tmp_path):
    from minivectordb_spark.sources import read_csv_corpus, read_text_corpus

    c = tmp_path / "docs.csv"
    c.write_text("doc_id,text\n1,alpha beta\n2,gamma\n")
    got = {r["doc_id"]: r["text"] for r in read_csv_corpus(spark, str(c)).collect()}
    assert got == {1: "alpha beta", 2: "gamma"}

    t = tmp_path / "raw.txt"
    t.write_text("line one\nline two\n")
    texts = sorted(r["text"] for r in read_text_corpus(spark, str(t)).collect())
    assert texts == ["line one", "line two"]
    whole = read_text_corpus(spark, str(t), whole_file=True).collect()
    assert len(whole) == 1 and "line one" in whole[0]["text"]


def test_corpus_feeds_dedup_pipeline(spark, tmp_path):
    """Corpus reader output plugs straight into the dedup operators."""
    from minivectordb_spark.operators.dedup import exact_dedup
    from minivectordb_spark.sources import read_jsonl_corpus

    p = tmp_path / "dups.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "same thing"}\n'
        '{"doc_id": 2, "text": "same thing"}\n'
        '{"doc_id": 3, "text": "unique"}\n'
    )
    df = read_jsonl_corpus(spark, str(p))
    assert exact_dedup(df).count() == 2


def test_read_jsonl_corpus_string_ids_stable_not_null(spark, tmp_path):
    """String ids map to stable (non-NULL) longs instead of silently
    becoming NULL through the cast (review finding)."""
    from minivectordb_spark.sources import read_jsonl_corpus

    p = tmp_path / "strid.jsonl"
    p.write_text('{"doc_id": "doc-a", "text": "x"}\n{"doc_id": "doc-b", "text": "y"}\n')
    a = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(spark, str(p)).collect()}
    b = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(spark, str(p)).collect()}
    assert None not in a.values() and len(set(a.values())) == 2
    assert a == b  # deterministic across reads
