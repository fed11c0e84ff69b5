"""Reference README drop-in flow (reference README.md:69-76 usage shape):
a user of MiniVectorDB switching to this engine runs the same sequence —
embed, store, search with filters, rerank — through the same call names."""

import pytest

from minivectordb_spark.embedder import get_embedder
from minivectordb_spark.table import VectorTable


def test_readme_flow_drop_in(spark, tmp_path):
    model = get_embedder("hash64")  # ≙ EmbeddingModel() with the test double

    sentences = [
        "i like animals",
        "i like cars",
        "i like programming",
        "technology is the future",
    ]
    db = VectorTable.empty(spark)
    for i, s in enumerate(sentences, start=1):
        db = db.store_embedding(
            i, model.embed(s), {"text": s, "idx": i, "even": i % 2 == 0}
        )

    q = model.embed("i like animals")
    ids, scores, metas = db.find_most_similar(q, k=2)
    assert len(ids) == 2 and ids[0] == "1"

    # filtered search with an operator dict
    ids2, _, metas2 = db.find_most_similar(q, metadata_filter={"idx": {"$gte": 3}}, k=4)
    assert sorted(m["idx"] for m in metas2) == [3, 4]

    # rerank as a method, reference signature
    best, comb = db.hybrid_rerank_results(
        [m["text"] for m in metas], scores, "i like animals", k=1
    )
    assert best[0] == "i like animals"

    # autocut methods
    assert db.autocut_scores([1.0, 0.95, 0.4, 0.35]) == [2, 3]
    assert db.autocut_distances([0.1, 0.12, 0.5, 0.55]) == [2, 3]

    # persist_to_disk alias + reload
    path = str(tmp_path / "db")
    db.persist_to_disk(path)
    db2 = VectorTable.load(spark, path)
    assert db2.count() == 4
    assert db2.get_vector(2) == pytest.approx(list(model.embed("i like cars")), abs=1e-6)
    with pytest.raises(ValueError):
        db.persist_to_disk()
