"""Third-decade counter check for a PAIR-GENERATING family on
NON-replicated data (VERDICT r9 item 8).

`tools/decade3_bench.py` deliberately excludes the dedup/setsim/LSH
families: factor-replication turns every doc into a clique, so their
output grows quadratically BY CONSTRUCTION and a third-decade wall would
measure answer size, not plan quality.  The falsifiable question for
those plans is instead: on a corpus that grows the way real corpora grow
(new distinct documents, a fixed rate of true near-duplicates), does the
CANDIDATE counter keep tracking the answer — or does the prefix filter
saturate somewhere between decade two and three?

This harness synthesizes that corpus deterministically in Spark (no RNG
state): each doc is 20-40 hash-derived tokens from a fixed 30k vocab;
every 50th doc is a planted near-twin of its predecessor (last token
replaced — word-3-gram Jaccard ~= (L-5)/(L+1) >= 0.65, above the 0.5
threshold), so the TRUE answer is exactly linear in n.  It then runs
`setsim_diagnostics` (the graded setsim_against / setsim_jaccard_pairs
machinery: one global df order, prefix filter, hash equi-join) at n =
5,000 / 50,000 / 500,000 — the gate corpus size and two further decades
— and prints the counter law:

  - candidate_pairs must track output_pairs (the answer), never n^2/2
    (brute pairs at the top decade: 1.25e11);
  - max_posting_list must stay O(1) (rare-shingle postings);
  - prefix_postings must stay linear in n (sum of per-doc prefixes).

Results are recorded by hand into PLANS.md; this is a spot-check tool,
not a per-round bench stage.

r11 extension: the same harness runs the LSH banding family
(``lsh_diagnostics`` — the graded lsh_jaccard_pairs / minhash machinery:
MinHash signatures, 8x2 banding, bucket self-join, exact Jaccard
verify).  Its counter law: ``candidate_pairs`` must track
``output_pairs`` (planted twins have word-3-gram Jaccard >= 0.71, so
P(>=1 of 8 bands collides) >= 0.997 — the answer is ~linear by
construction), ``max_bucket`` must stay O(1) on a non-degenerate
corpus, and ``collision_pairs_bound`` (sum C(occ,2)) is the emission
bound the join can never exceed.

simhash mode: SimHash bands have a FIXED value space (65,536 per band
at 64/4 bits), so unlike LSH/setsim the bucket count cannot grow with
the corpus — past ~band_space docs pigeonhole forces occupancy up and
the candidate bound turns quadratic.  The harness measures that
saturation curve (occupancy counters at every n; the candidate join is
materialized only while the bound stays sane), making COVERAGE's
"collision-bounded at ~100x" claim falsifiable and documenting why the
LSH/setsim rows are the scale path.

neardup mode: the embedding-cosine family (graded neardup_lsh
machinery — adaptive random-projection planes, one-sided multiprobe,
exact cosine verify) over deterministic hash-derived dim-16 vectors;
every 50th is a twin nudged by 0.02 in one coordinate (cosine ~0.9999,
above the 0.995 verify threshold).  Its counter law differs from the
prefix/banding families BY DESIGN: the adaptive plane count targets a
fixed block size, so candidates are ~(block_size x (1+probes))/2 PER
ROW — candidates/n must stay FLAT across decades (bucket-bounded,
linear in n) while brute pairs grow 100x; recall = output/planted.

Usage: python tools/decade3_pairs.py [setsim|lsh|simhash|neardup] [n ...]
       (default: setsim 5000 50000 500000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

VOCAB = 30_000
TWIN_EVERY = 50


def synth_docs(spark, n: int):
    """n deterministic documents: doc_id, text.  Every TWIN_EVERY-th doc
    (id % TWIN_EVERY == 1) reuses its predecessor's token stream with
    the last token replaced — the planted near-duplicate."""
    base = F.when(
        F.col("id") % TWIN_EVERY == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    is_twin = (F.col("id") % TWIN_EVERY == 1).cast("int")
    # 20-40 tokens per doc, length derived from the BASE id so a twin
    # has its base's length
    length = (F.pmod(F.xxhash64(base, F.lit(7)), F.lit(21)) + F.lit(20)).cast(
        "int"
    )
    toks = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.concat(
            F.lit("t"),
            F.pmod(
                F.xxhash64(base * F.lit(1_048_576) + j.cast("long"), F.lit(13)),
                F.lit(VOCAB),
            ).cast("string"),
        ),
    )
    # twin: replace the LAST token with a doc-unique one
    toks = F.when(
        is_twin == 1,
        F.concat(
            F.slice(toks, 1, length - 1),
            F.array(F.concat(F.lit("x"), F.col("id").cast("string"))),
        ),
    ).otherwise(toks)
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )


ALPHA = "abcdefghijklmnopqrstuvwxyz"


def synth_names(spark, n: int):
    """n deterministic name-like strings (12-24 chars over a 26-char
    alphabet); every TWIN_EVERY-th row is its predecessor's string with
    the LAST character substituted by a guaranteed-different one — the
    planted edit-distance-1 twin.  Random 12+-char strings over 26
    characters collide at distance <= 1 essentially never, so the
    planted pairs ARE the answer."""
    from pyspark.sql import functions as F

    base = F.when(
        F.col("id") % TWIN_EVERY == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    is_twin = F.col("id") % TWIN_EVERY == 1
    length = (F.pmod(F.xxhash64(base, F.lit(11)), F.lit(13)) + F.lit(12)).cast(
        "int"
    )
    alpha = F.split(F.lit(",".join(ALPHA)), ",")

    def char_idx(j):
        return F.pmod(
            F.xxhash64(base * F.lit(1_048_576) + j.cast("long"), F.lit(19)),
            F.lit(26),
        ).cast("int")

    chars = F.transform(
        F.sequence(F.lit(1), length),
        lambda j: F.element_at(alpha, char_idx(j) + 1),
    )
    s_base = F.concat_ws("", chars)
    # twin: substitute the LAST char with an offset-shifted one (offset in
    # 1..25, so always different -> edit distance exactly 1)
    last_idx = char_idx(length)
    twin_idx = F.pmod(
        last_idx + F.pmod(F.xxhash64(F.col("id"), F.lit(23)), F.lit(25)) + 1,
        F.lit(26),
    ).cast("int")
    s = F.when(
        is_twin,
        F.concat(
            F.substring(s_base, F.lit(1), length - 1),
            F.element_at(alpha, twin_idx + 1),
        ),
    ).otherwise(s_base)
    return spark.range(n).select(F.col("id").alias("rec_id"), s.alias("name"))


def synth_vecs(spark, n: int, dim: int = 16):
    """n deterministic dim-16 embeddings (vec_id, embedding); every
    TWIN_EVERY-th row is its predecessor's vector with +0.02 on the
    first coordinate — the planted cosine near-duplicate."""
    base = F.when(
        F.col("id") % TWIN_EVERY == 1, F.col("id") - 1
    ).otherwise(F.col("id"))
    is_twin = F.col("id") % TWIN_EVERY == 1
    comps = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(
                F.xxhash64(base * F.lit(1_048_576) + j.cast("long"), F.lit(29)),
                F.lit(2001),
            )
            - F.lit(1000)
        ).cast("double")
        / F.lit(1000.0),
    )
    vec = F.when(
        is_twin,
        F.concat(
            F.array(F.element_at(comps, 1) + F.lit(0.02)),
            F.slice(comps, 2, dim - 1),
        ),
    ).otherwise(comps)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.cast("array<float>").alias("embedding"),
    )


def main() -> None:
    from minivectordb_spark.operators.dedup import lsh_diagnostics
    from minivectordb_spark.operators.setsim import setsim_diagnostics
    from minivectordb_spark.session import get_spark

    args = sys.argv[1:]
    family = "setsim"
    if args and args[0] in (
        "setsim", "lsh", "simhash", "simhash128", "neardup", "qgram"
    ):
        family = args[0]
        args = args[1:]
    sizes = [int(a) for a in args] or [5_000, 50_000, 500_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # the deepest decades need more shuffle partitions than cores: at 5M
    # docs the qgram doc-frequency aggregate over ~75M occurrence rows
    # exceeds per-partition aggregation memory at width 32
    # (AGGREGATE_OUT_OF_MEMORY) — the standard partitions-fit-memory
    # sizing, overridable per run
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    spark = get_spark(
        app_name="decade3_pairs", cores=cpus, shuffle_partitions=shuffle
    )
    out = {}
    for n in sizes:
        if family == "qgram":
            from minivectordb_spark.operators.linkage import (
                choose_qgram_q,
                qgram_join_diagnostics,
            )

            names = synth_names(spark, n).localCheckpoint()
            left = names.filter(
                (F.col("rec_id") % TWIN_EVERY == 1) & (F.col("rec_id") > 0)
            )
            right = names.filter(F.col("rec_id") % TWIN_EVERY != 1)
            q, pred, sat = choose_qgram_q(n, 12, max_dist=1, alphabet_size=26)
            t0 = time.time()
            d = qgram_join_diagnostics(
                left, right, "rec_id", "rec_id", "name", "name",
                max_dist=1, q=q,
            )
            wall = round(time.time() - t0, 1)
            d.update(
                n=n,
                q=q,
                predicted_candidates=int(pred),
                saturated=sat,
                wall_sec=wall,
                planted_pairs=len(range(1, n, TWIN_EVERY)),
                brute_pairs=(n // TWIN_EVERY) * (n - n // TWIN_EVERY),
            )
            out[n] = d
            print(json.dumps({str(n): d}, separators=(",", ":")), flush=True)
            continue
        if family == "neardup":
            from minivectordb_spark.operators.dedup import (
                embedding_neardup_diagnostics,
            )

            vecs = synth_vecs(spark, n).localCheckpoint()
            t0 = time.time()
            d = embedding_neardup_diagnostics(
                vecs,
                threshold=0.995,
                max_probes=4,
                target_block_size=32,
            )
            wall = round(time.time() - t0, 1)
            d.update(
                n=n,
                wall_sec=wall,
                planted_pairs=len(range(1, n, TWIN_EVERY)),
                brute_pairs=n * (n - 1) // 2,
                cand_per_row=round(d["candidate_pairs"] / n, 1),
            )
            out[n] = d
            print(json.dumps({str(n): d}, separators=(",", ":")), flush=True)
            continue
        docs = synth_docs(spark, n).localCheckpoint()
        t0 = time.time()
        if family == "lsh":
            d = lsh_diagnostics(docs, "text", "doc_id", k=3, threshold=0.5)
        elif family in ("simhash", "simhash128"):
            from minivectordb_spark.operators.dedup import (
                simhash_band_diagnostics,
            )

            bits = 128 if family == "simhash128" else 64
            # materialize the join only while the emission bound is sane
            # (past saturation the bound IS the finding)
            d = simhash_band_diagnostics(
                docs, "text", "doc_id", bits=bits, join=False
            )
            if d["collision_pairs_bound"] <= 2_000_000:
                d = simhash_band_diagnostics(
                    docs, "text", "doc_id", bits=bits, join=True
                )
        else:
            d = setsim_diagnostics(docs, "text", "doc_id", k=3, threshold=0.5)
        wall = round(time.time() - t0, 1)
        d.update(
            n=n,
            wall_sec=wall,
            planted_pairs=len(range(1, n, TWIN_EVERY)),
            brute_pairs=n * (n - 1) // 2,
        )
        out[n] = d
        print(json.dumps({str(n): d}, separators=(",", ":")), flush=True)
    print("decade3_pairs: " + json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
