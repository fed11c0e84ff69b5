"""Independent-oracle tests: operators checked against pure
numpy/python reimplementations on real fixture data (FIXTURES.md F8's
"numpy brute-force oracle" idea, extended to hashing operators)."""

import hashlib
import random
import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from minivectordb_spark.autocut import autocut_df, autocut_scores
from minivectordb_spark.operators.dedup import (
    minhash_signatures,
    simhash_fingerprints,
)
from minivectordb_spark.operators.hashing import MERSENNE_P, minhash_coeffs
from minivectordb_spark.scoring import knn


def _py_md5i32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def test_knn_matches_numpy_bruteforce(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.array([np.sin((i + 1) * 0.37) for i in range(E.shape[1])])
    sims = (E @ q) / (np.linalg.norm(E, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -sims))[:15]
    expected = list(ids[order])
    got = [
        r["vec_id"]
        for r in knn(df, list(q), k=15, emb_col="embedding", id_col="vec_id").collect()
    ]
    assert got == expected


def test_minhash_matches_python_reference(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven eight",
        "x y",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: list(r["minhash"]) for r in minhash_signatures(df).collect()}
    coeffs = minhash_coeffs(16, seed=42)
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) >= 3:
            sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        hashes = {_py_md5i32(s) for s in sh}
        expected = [
            min((a * (h % MERSENNE_P) + b) % MERSENNE_P for h in hashes)
            for a, b in coeffs
        ]
        assert got[i] == expected, f"doc {i}"


def _py_simhash(toks: list[str], bits: int = 32) -> int:
    votes = [0] * bits
    for t in toks:
        h = _py_md5i32(t)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(bits):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def test_simhash_matches_python_reference_long_doc(spark):
    # > 255 tokens exercises the 16-bit SWAR lanes beyond byte range
    rng = random.Random(7)
    long_toks = [f"w{rng.randrange(50)}" for _ in range(700)]
    texts = ["the quick brown fox", " ".join(long_toks)]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash(t.split()), f"doc {i}"


score_lists = st.lists(
    st.floats(min_value=0.015625, max_value=1.0, allow_nan=False),
    min_size=1,
    max_size=8,
).map(lambda xs: sorted(xs, reverse=True))


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(scores=score_lists)
def test_autocut_window_matches_driver(spark, scores):
    df = spark.createDataFrame(
        [(str(i), float(s)) for i, s in enumerate(scores)], ["id", "score"]
    )
    kept = sorted(int(r["id"]) for r in autocut_df(df, "score", "id").collect())
    removed = set(autocut_scores([float(s) for s in scores]))
    expected = sorted(i for i in range(len(scores)) if i not in removed)
    assert kept == expected, f"scores={scores}"
