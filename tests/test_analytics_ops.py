"""Semantic pins for the r7 analytics additions: TF-IDF keyword
extraction (operators/text.tfidf_keywords), exact-integer z-score
outliers (operators/anomaly.zscore_outliers), and the Markov transition
matrix (operators/funnel.transition_counts).  Each also has a DuckDB
oracle row (demoted registry) — these tests pin the hand-checkable
contracts the oracle compare can't localize."""

import math

import numpy as np
import pytest

from minivectordb_spark.operators.anomaly import zscore_outliers
from minivectordb_spark.operators.funnel import transition_counts
from minivectordb_spark.operators.text import tfidf_keywords


# ---------------------------------------------------------------- tfidf


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_tfidf_ubiquitous_token_scores_zero(spark):
    # "the" appears in every doc -> idf = round(ln(1), 6) = 0 -> tfidf 0,
    # so it can never outrank a token with any positive idf.
    docs = _docs(spark, [
        (1, "the cat", "a"),
        (2, "the dog", "a"),
        (3, "the the fish", "b"),
        (4, "the bird", "b"),
    ])
    out = tfidf_keywords(docs, top_n=10).collect()
    scores = {(r["source"], r["token"]): r["tfidf"] for r in out}
    assert scores[("a", "the")] == 0.0
    assert scores[("b", "the")] == 0.0
    # every source ranks some positive-idf token first
    top = {r["source"]: r["token"] for r in out if r["rank"] == 1}
    assert top["a"] != "the" and top["b"] != "the"


def test_tfidf_exact_score_and_rank(spark):
    # token "fish" occurs twice in one of 4 docs:
    # tf=2, idf=round(ln(4/1),6)=1.386294 -> tfidf exactly 2.772588
    docs = _docs(spark, [
        (1, "fish fish cat", "a"),
        (2, "cat dog", "a"),
        (3, "dog bird", "a"),
        (4, "bird cat", "a"),
    ])
    out = {r["token"]: r for r in tfidf_keywords(docs, top_n=10).collect()}
    assert out["fish"]["tf"] == 2
    assert out["fish"]["tfidf"] == 2 * round(math.log(4.0), 6)
    assert out["fish"]["rank"] == 1  # highest tf x idf in the corpus


def test_tfidf_top_n_and_rank_contract(spark):
    docs = _docs(spark, [
        (i, " ".join(f"t{j}" for j in range(i % 7 + 1)), f"s{i % 3}")
        for i in range(30)
    ])
    out = tfidf_keywords(docs, top_n=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


# -------------------------------------------------------------- anomaly


def _vals(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_zscore_flags_match_numpy_population_test(spark):
    rng = np.random.default_rng(7)
    vals = [float(v) for v in rng.normal(50, 10, size=200)] + [500.0, -400.0]
    rows = [(i, "k", v) for i, v in enumerate(vals)]
    out = zscore_outliers(
        _vals(spark, rows), "value", "event_type", ["event_id"], z=2
    ).collect()
    got = {r["event_id"]: r["side"] for r in out}
    # independent numpy oracle on the same cents contract
    cents = np.floor(np.array(vals) * 100).astype(np.int64)
    mu, sig = cents.mean(), cents.std()  # population
    expect = {
        i: ("high" if c > mu else "low")
        for i, c in enumerate(cents)
        if abs(c - mu) > 2 * sig
    }
    assert got == expect
    assert got[200] == "high" and got[201] == "low"


def test_zscore_min_n_gate_and_strict_inequality(spark):
    # 4 rows in key "tiny": extreme value NOT flagged (min_n=5).
    rows = [(1, "tiny", 1.0), (2, "tiny", 1.0), (3, "tiny", 1.0),
            (4, "tiny", 1000.0)]
    assert zscore_outliers(
        _vals(spark, rows), "value", "event_type", ["event_id"], min_n=5
    ).count() == 0
    # constant key: variance 0, strict > never fires even at n >= min_n
    rows = [(i, "c", 5.0) for i in range(10)]
    assert zscore_outliers(
        _vals(spark, rows), "value", "event_type", ["event_id"]
    ).count() == 0


def test_zscore_floor_scaling_is_floor_not_cast(spark):
    # -1.005 * 100 floors to -101 (a DOUBLE->BIGINT *cast* would round or
    # truncate differently per engine — the operator must floor).
    rows = [(1, "k", -1.005)] + [(i, "k", 0.0) for i in range(2, 30)]
    out = zscore_outliers(
        _vals(spark, rows), "value", "event_type", ["event_id"], z=2
    ).collect()
    assert len(out) == 1
    assert out[0]["value_scaled"] == -101 and out[0]["side"] == "low"


def test_zscore_overflow_raises_instead_of_unflagging(spark):
    # scale=10^15 drives |v| ~ 1e19 past the DECIMAL(38,0) product
    # headroom.  Under ANSI (Spark 4 default) the decimal multiply itself
    # raises; under non-ANSI it nulls out — where the operator's guard
    # must RAISE rather than silently drop the flag.  Both modes must be
    # loud; non-ANSI must carry the operator's own message.
    rows = [(1, "k", 123456.789)] + [(i, "k", 10.0) for i in range(2, 30)]

    def run():
        zscore_outliers(
            _vals(spark, rows),
            "value",
            "event_type",
            ["event_id"],
            z=2,
            scale=10**15,
        ).collect()

    with pytest.raises(
        Exception, match="zscore overflow|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        run()

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="zscore overflow"):
            run()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_frozen_stats_and_flag_accept_non_string_keys(spark):
    # frozen_key_stats casts keys to string to match zscore_flag's
    # probe-side cast — a LONG key column must round-trip through the
    # frozen table without crashing createDataFrame, and flag the same
    # rows the self-fit pass does.
    from minivectordb_spark.operators.anomaly import (
        frozen_key_stats,
        zscore_flag,
    )

    rows = [(1, 7, 1000.0)] + [(i, 7, 1.0) for i in range(2, 30)]
    df = spark.createDataFrame(
        rows, "event_id long, key_num long, value double"
    )
    stats = frozen_key_stats(df, "value", "key_num")
    assert all(isinstance(k, str) for k, *_ in stats)
    flagged = {
        r["event_id"]
        for r in zscore_flag(df, stats, "value", "key_num").collect()
        if r["is_outlier"]
    }
    self_fit = {
        r["event_id"]
        for r in zscore_outliers(
            df, "value", "key_num", ["event_id"]
        ).collect()
    }
    assert flagged == self_fit == {1}


# ---------------------------------------------------------- transitions


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long"
    )


def test_transitions_per_user_ordered_pairs(spark):
    ev = _ev(spark, [
        (1, 1, "view", 10), (2, 1, "click", 20), (3, 1, "buy", 30),
        (4, 2, "view", 10), (5, 2, "view", 20),
    ])
    out = {(r["prev_type"], r["next_type"]): (r["n"], r["n_from"])
           for r in transition_counts(ev).collect()}
    assert out == {
        ("view", "click"): (1, 2),   # n_from: view ->click and view->view
        ("view", "view"): (1, 2),
        ("click", "buy"): (1, 1),
    }


def test_transitions_ts_tie_broken_by_event_id(spark):
    # equal ts: event_id orders the pair deterministically
    ev = _ev(spark, [
        (2, 1, "b", 10), (1, 1, "a", 10), (3, 1, "c", 10),
    ])
    out = {(r["prev_type"], r["next_type"]) for r in
           transition_counts(ev).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_transitions_never_cross_users(spark):
    ev = _ev(spark, [
        (1, 1, "a", 10), (2, 2, "b", 20),
    ])
    assert transition_counts(ev).count() == 0


# ------------------------------------------------------------------ MAD


def test_mad_outliers_hand_computed_and_lower_median(spark):
    from minivectordb_spark.operators.anomaly import mad_outliers

    # key "k": values (cents) 100x {1,2,3,4,5,6,100} -> n=7 (odd),
    # median = 4th smallest = 400, devs {300,200,100,0,100,200,9600},
    # sorted {0,100,100,200,200,300,9600} -> MAD = 4th = 200.
    # flag: dev > 3*200=600 -> only the 100.0 row, side high.
    rows = [(i, "k", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 100])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = mad_outliers(df, "value", "event_type", ["event_id"], z=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_id"] == 6 and r["side"] == "high"
    assert r["value_scaled"] == 10000 and r["dev"] == 9600

    # even n: lower median.  values {1,2,3,1000} -> n=4, (n+1) div 2 = 2,
    # median = 2nd smallest = 200 (NOT the interpolated 250); devs
    # {100,0,100,99800} sorted -> MAD = 2nd = 100; flag dev>300:
    # the 1000.0 row, plus min_n=4 allows it.
    rows = [(i, "k", float(v)) for i, v in enumerate([1, 2, 3, 1000])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = mad_outliers(df, "value", "event_type", ["event_id"], z=3, min_n=4).collect()
    assert [(r["event_id"], r["side"]) for r in out] == [(3, "high")]


def test_mad_outliers_gates(spark):
    from minivectordb_spark.operators.anomaly import mad_outliers

    # min_n gate: 4 rows with min_n=5 -> nothing flagged even with a
    # wild outlier
    rows = [(i, "k", float(v)) for i, v in enumerate([1, 1, 1, 1000])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert mad_outliers(df, "value", "event_type", ["event_id"], min_n=5).count() == 0

    # MAD==0 gate: constant values + one outlier -> MAD is 0 (majority
    # at the median), degenerate spread never flags
    rows = [(i, "k", 5.0) for i in range(6)] + [(9, "k", 500.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    assert mad_outliers(df, "value", "event_type", ["event_id"]).count() == 0


# -------------------------------------------------- contamination frac


def test_contamination_fraction_hand_computed(spark):
    from minivectordb_spark.operators.dedup import contamination_fraction

    corpus = spark.createDataFrame(
        [
            (1, "a b c d"),            # grams {abc, bcd}: abc hits -> 1/2
            (2, "x y z"),              # gram {xyz}: no hit -> 0/1
            (3, "a b c"),              # gram {abc}: hit -> 1/1
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c q r s")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["contamination"])
        for r in contamination_fraction(corpus, bench, window=3).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (1, 0, 0.0), 3: (1, 1, 1.0)}


# ---------------------------------------------------------------- PMI


def test_cooccurrence_pmi_matches_python_model(spark):
    import math
    from collections import Counter

    from minivectordb_spark.operators.text import cooccurrence_pmi

    corpus = [
        "new york is big",
        "new york new york",
        "big apple is new",
    ]
    window, min_count = 2, 2
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["pmi"])
        for r in cooccurrence_pmi(
            df, window=window, min_count=min_count
        ).collect()
    }

    toks = [t.split(" ") for t in corpus]
    pairs = Counter()
    for tk in toks:
        for i in range(len(tk)):
            for j in range(i + 1, min(i + window, len(tk) - 1) + 1):
                a, b = sorted((tk[i], tk[j]))
                pairs[(a, b)] += 1
    uni = Counter(t for tk in toks for t in tk)
    T, P = sum(uni.values()), sum(pairs.values())
    want = {
        pr: (c, round(math.log((c * T * T) / (P * uni[pr[0]] * uni[pr[1]])), 6))
        for pr, c in pairs.items()
        if c >= min_count
    }
    assert got == want
    # sanity: the repeated bigram is the association winner
    assert ("new", "york") in got and got[("new", "york")][0] >= 3


def test_cooccurrence_window_and_canonicalization(spark):
    from minivectordb_spark.operators.text import cooccurrence_pmi

    # window=1 -> adjacent pairs only; "b a" and "a b" canonicalize to
    # the same unordered pair
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b a"), (2, "a x b")], "doc_id long, text string"
    )
    got = {
        (r["w1"], r["w2"]): r["c12"]
        for r in cooccurrence_pmi(df, window=1, min_count=1).collect()
    }
    assert got[("a", "b")] == 2        # adjacent in docs 0 and 1 only
    assert ("a", "x") in got and ("b", "x") in got


# --------------------------------------------------------- source overlap


def test_source_overlap_hand_computed(spark):
    from minivectordb_spark.operators.dedup import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),   # grams {abc, bcd}
            (2, "a b c x", "s2"),   # grams {abc, bcx}
            (3, "q r s t", "s3"),   # grams {qrs, rst} — disjoint
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared_grams"], r["jaccard"])
        for r in source_overlap(docs, window=3).collect()
    }
    # s1 ∩ s2 = {abc} -> 1 shared; |A|=2, |B|=2 -> jaccard 1/3
    assert got == {("s1", "s2"): (1, round(1 / 3, 6))}


def test_source_overlap_ordering_and_dedup(spark):
    from minivectordb_spark.operators.dedup import source_overlap

    # identical text in both sources, duplicated rows: distinct grams
    # per source collapse; pair is reported once, a < b
    docs = spark.createDataFrame(
        [(1, "a b c", "sB"), (2, "a b c", "sA"), (3, "a b c", "sA")],
        "doc_id long, text string, source string",
    )
    out = source_overlap(docs, window=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("sA", "sB")
    assert r["n_shared_grams"] == 1 and r["jaccard"] == 1.0


# ------------------------------------------------------------------ OHLC


def test_ohlc_bars_hand_computed(spark):
    from minivectordb_spark.operators.temporal import ohlc_bars

    H = 3_600_000_000_000
    rows = [
        # key k, hour 0: open=5 (earliest ts), close=2 (latest), hi=9 lo=2
        (1, "k", 100, 5.0),
        (2, "k", 200, 9.0),
        (3, "k", H - 1, 2.0),
        # hour 1: single obs
        (4, "k", H + 5, 7.0),
        # ts tie in hour 0 of key "m": event_id breaks it — open is id 5
        (5, "m", 50, 1.0),
        (6, "m", 50, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts long, value double"
    )
    got = {
        (r["event_type"], r["bucket_epoch"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_obs"]
        )
        for r in ohlc_bars(
            df, "value", "ts", "event_type", "event_id", bucket_ns=H
        ).collect()
    }
    assert got[("k", 0)] == (5.0, 9.0, 2.0, 2.0, 3)
    assert got[("k", 3600)] == (7.0, 7.0, 7.0, 7.0, 1)
    assert got[("m", 0)] == (1.0, 3.0, 1.0, 3.0, 2)


def test_ohlc_bars_negative_ts_floor_bucketing(spark):
    # ADVICE r8: Spark `div` truncates toward zero while the DuckDB
    # oracle floors, so pre-epoch timestamps split engines.  The fixed
    # operator floors: ts=-1 lands in bucket -1 (epoch -3600), NOT in
    # bucket 0 with the positive row.
    from minivectordb_spark.operators.temporal import ohlc_bars

    H = 3_600_000_000_000
    rows = [
        (1, "k", -1, 4.0),        # floor(-1/H) = -1
        (2, "k", -H, 6.0),        # exactly -H -> bucket -1
        (3, "k", -H - 1, 8.0),    # just before -> bucket -2
        (4, "k", 1, 2.0),         # bucket 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts long, value double"
    )
    got = {
        r["bucket_epoch"]: (r["open"], r["close"], r["n_obs"])
        for r in ohlc_bars(
            df, "value", "ts", "event_type", "event_id", bucket_ns=H
        ).collect()
    }
    assert got == {
        -7200: (8.0, 8.0, 1),
        -3600: (6.0, 4.0, 2),
        0: (2.0, 2.0, 1),
    }


def test_frozen_mad_matches_self_fit_and_passes_unseen_keys(spark):
    from minivectordb_spark.operators.anomaly import (
        frozen_mad_stats,
        mad_flag,
        mad_outliers,
    )

    rows = [(i, "k", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 100])]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    stats = frozen_mad_stats(df, "value", "event_type")
    assert stats == [("k", 400, 200, 7)]
    flagged = {
        r["event_id"]
        for r in mad_flag(df, stats, "value", "event_type").collect()
        if r["is_outlier"]
    }
    self_fit = {
        r["event_id"]
        for r in mad_outliers(df, "value", "event_type", ["event_id"]).collect()
    }
    assert flagged == self_fit == {6}

    # unseen key: passes un-flagged rather than crashing or flagging
    probe = spark.createDataFrame(
        [(99, "new_key", 1e9)], "event_id long, event_type string, value double"
    )
    out = mad_flag(probe, stats, "value", "event_type").collect()
    assert len(out) == 1 and out[0]["is_outlier"] is False


def test_winsorize_hand_computed_bounds_and_clip(spark):
    from minivectordb_spark.operators.anomaly import winsorize

    # 10 values 1..10 (cents 100..1000): p20 -> ceil(0.2*10)=2nd smallest
    # = 200; p80 -> ceil(0.8*10)=8th = 800.  1 clips up, 9/10 clip down.
    rows = [(i, "k", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {
        r["event_id"]: r["value_clipped"]
        for r in winsorize(
            df, "value", "event_type", ["event_id"], p_lo_pct=20, p_hi_pct=80
        ).collect()
    }
    assert got[1] == 200 and got[2] == 200
    assert got[5] == 500
    assert got[8] == 800 and got[9] == 800 and got[10] == 800
    # p 0/100 degenerates to min/max -> identity clip
    ident = {
        r["event_id"]: r["value_clipped"]
        for r in winsorize(
            df, "value", "event_type", ["event_id"], p_lo_pct=0, p_hi_pct=100
        ).collect()
    }
    assert ident == {i: i * 100 for i in range(1, 11)}


def test_value_histogram_integer_edges_and_degenerate_key(spark):
    from minivectordb_spark.operators.anomaly import value_histogram

    # key "k": cents 0..99 -> lo=0 hi=99, width=ceil(100/10)=10; value 99
    # lands in bin 9 (a float-width histogram can put it in a phantom
    # bin 10).  key "c": constant -> one bin, width 1.
    rows = [(i, "k", i / 100.0) for i in range(100)] + [
        (200 + i, "c", 5.0) for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    got = {
        (r["event_type"], r["bin"]): (r["bin_lo"], r["bin_hi"], r["n"])
        for r in value_histogram(df, "value", "event_type").collect()
    }
    assert {b for (k, b) in got if k == "k"} == set(range(10))
    assert got[("k", 0)] == (0, 9, 10)
    assert got[("k", 9)] == (90, 99, 10)
    assert got[("c", 0)] == (500, 500, 3)


# ------------------------------------------------- interval overlap join


def _brute_overlaps(ls, rs, keyed=False):
    out = set()
    for l in ls:
        for r in rs:
            if keyed and l[0] != r[0]:
                continue
            (lk, lid, llo, lhi), (rk, rid, rlo, rhi) = l, r
            if llo < rhi and rlo < lhi and lhi > llo and rhi > rlo:
                out.add((lid, rid, max(llo, rlo), min(lhi, rhi)))
    return out


def test_interval_overlap_join_matches_bruteforce(spark):
    from minivectordb_spark.operators.ranges import interval_overlap_join

    # spans crossing many buckets, touching endpoints (half-open: [0,10)
    # and [10,20) do NOT overlap), containment, negative bounds, and a
    # degenerate empty interval
    ls = [
        (0, 1, 0, 10),
        (0, 2, 10, 20),
        (0, 3, -25, 5),
        (0, 4, 100, 101),
        (0, 5, 7, 7),       # empty: never matches
    ]
    rs = [
        (0, 10, 9, 11),     # overlaps 1 and 2
        (0, 11, -30, -24),  # overlaps 3 only
        (0, 12, 0, 200),    # overlaps 1, 2, 3, 4
        (0, 13, 5, 5),      # empty
    ]
    L = spark.createDataFrame(ls, "k long, lid long, lo long, hi long")
    R = spark.createDataFrame(rs, "k long, rid long, lo long, hi long")
    for w in (1, 3, 7, 1000):
        got = {
            (r["lid"], r["rid"], r["overlap_lo"], r["overlap_hi"])
            for r in interval_overlap_join(
                L, R, "lid", "rid", bucket_width=w
            ).collect()
        }
        assert got == _brute_overlaps(ls, rs), f"w={w}"


def test_interval_overlap_join_keyed_and_epoch_nanos_exact(spark):
    from minivectordb_spark.operators.ranges import interval_overlap_join

    # epoch-nano magnitudes where double arithmetic corrupts bucket ids:
    # ts ~ 1.7e18, bucket 1h — (ts/3.6e12) as double has 2-ulp slop
    base = 1_700_000_000_000_000_000
    H = 3_600_000_000_000
    ls = [
        (7, 1, base, base + H // 2),
        (7, 2, base + H, base + 2 * H),
        (8, 3, base, base + 3 * H),   # other key: must not pair with k=7
    ]
    rs = [
        (7, 10, base + H // 4, base + H // 3),   # inside interval 1
        (7, 11, base + 2 * H - 1, base + 5 * H), # touches 2 by one nano
        (8, 12, base + H, base + H + 1),
    ]
    L = spark.createDataFrame(ls, "k long, lid long, lo long, hi long")
    R = spark.createDataFrame(rs, "k long, rid long, lo long, hi long")
    got = {
        (r["k"], r["lid"], r["rid"])
        for r in interval_overlap_join(
            L, R, "lid", "rid", bucket_width=H, partition_cols=["k"]
        ).collect()
    }
    assert got == {(7, 1, 10), (7, 2, 11), (8, 3, 12)}


def test_interval_overlap_diagnostics_counts(spark):
    from minivectordb_spark.operators.ranges import (
        interval_overlap_diagnostics,
    )

    L = spark.createDataFrame(
        [(1, 0, 30)], "lid long, lo long, hi long"
    )  # covers buckets 0,10,20 at w=10
    R = spark.createDataFrame(
        [(2, 5, 15), (3, 25, 26)], "rid long, lo long, hi long"
    )  # buckets {0,10} and {20}
    d = interval_overlap_diagnostics(L, R, bucket_width=10)
    assert d["n_left"] == 1 and d["n_right"] == 2
    assert d["exploded_left_rows"] == 3
    assert d["exploded_right_rows"] == 3
    assert d["n_joint_cells"] == 3        # buckets 0, 10, 20 all joint
    assert d["candidate_pairs"] == 3
    assert d["max_left_per_cell"] == 1 and d["max_right_per_cell"] == 1


def test_choose_bucket_width_reproduces_fixture_pin_and_auto_matches(spark):
    """VERDICT r9 item 2: the w knob automated by the choose_qgram_q
    discipline.  The scalar law must reproduce the r9 hand-pinned graded
    choice (w = the 30-min click-window length — the smaller side's
    median), and bucket_width='auto' must return the identical pair set
    (correctness is w-independent by construction; this pins that the
    auto path wires through)."""
    from minivectordb_spark.operators.ranges import (
        choose_bucket_width,
        interval_overlap_join,
    )

    CLICK, PURCHASE = 1_800_000_000_000, 2_700_000_000_000
    w, fanout, sat = choose_bucket_width(min(CLICK, PURCHASE), PURCHASE)
    assert (w, sat) == (CLICK, False)  # the hand-pinned r9 choice
    assert fanout == PURCHASE // CLICK + 1 == 2

    ls = [(0, 1, 0, 10), (0, 2, 10, 20), (0, 3, -25, 5), (0, 4, 100, 101)]
    rs = [(0, 10, 9, 11), (0, 11, -30, -24), (0, 12, 0, 200)]
    L = spark.createDataFrame(ls, "k long, lid long, lo long, hi long")
    R = spark.createDataFrame(rs, "k long, rid long, lo long, hi long")
    auto = {
        (r["lid"], r["rid"], r["overlap_lo"], r["overlap_hi"])
        for r in interval_overlap_join(
            L, R, "lid", "rid", bucket_width="auto"
        ).collect()
    }
    assert auto == _brute_overlaps(ls, rs)


def test_interval_auto_width_warns_on_mega_interval(spark):
    """One pathological mega-interval (an unclosed session) must trip
    the fan-out saturation warning — and the answer must still be
    exact (the guard is advisory; correctness never depends on w)."""
    import warnings

    from minivectordb_spark.operators.ranges import (
        bucketed_range_join,
        interval_overlap_join,
    )

    ls = [(0, i, i * 10, i * 10 + 8) for i in range(1, 20)]
    ls.append((0, 99, 0, 90_000_000))  # ~9e6 buckets at w=10
    rs = [(0, 100, 15, 25)]
    L = spark.createDataFrame(ls, "k long, lid long, lo long, hi long")
    R = spark.createDataFrame(rs, "k long, rid long, lo long, hi long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = {
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                L, R, "lid", "rid", bucket_width="auto"
            ).collect()
        }
    assert got == {(1, 100), (2, 100), (99, 100)}
    assert any("mega-interval" in str(x.message) for x in w)
    # the point->interval variant shares the guard
    pts = spark.createDataFrame([(1, 17)], "pid long, v long")
    iv = L.select("lid", "lo", "hi")
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        got2 = {
            (r["pid"], r["lid"])
            for r in bucketed_range_join(
                pts, iv, "v", bucket_width="auto"
            ).collect()
        }
    assert got2 == {(1, 1), (1, 99)}
    assert any("mega-interval" in str(x.message) for x in w2)


def test_interval_skew_counters_max_per_key(spark):
    """VERDICT r9 item 6: the mega-key exposure counters — the raw
    per-key interval counts for the overlap join and the sweep."""
    from minivectordb_spark.operators.ranges import (
        coalesce_diagnostics,
        interval_overlap_diagnostics,
    )

    rows = [(7, i, i * 10, i * 10 + 5) for i in range(5)] + [
        (8, 100, 0, 3),
        (8, 101, 4, 4),  # degenerate: not counted
    ]
    df = spark.createDataFrame(rows, "k long, iid long, lo long, hi long")
    d = coalesce_diagnostics(df, partition_cols=["k"])
    assert d == {"n_intervals": 6, "n_keys": 2, "max_intervals_per_key": 5}
    d2 = interval_overlap_diagnostics(
        df, df, bucket_width=10, partition_cols=["k"]
    )
    assert d2["max_left_per_key"] == 5 and d2["max_right_per_key"] == 5
    # unkeyed: the whole frame is one key
    d3 = coalesce_diagnostics(df)
    assert d3 == {"n_intervals": 6, "n_keys": 1, "max_intervals_per_key": 6}


def test_coalesce_intervals_merges_overlap_and_touch(spark):
    from minivectordb_spark.operators.ranges import coalesce_intervals

    rows = [
        # key 1: [0,10) + [5,12) overlap; [12,20) touches -> ONE span
        (1, 0, 10), (1, 5, 12), (1, 12, 20),
        # key 1: disjoint later span, plus an empty interval (dropped)
        (1, 30, 40), (1, 35, 35),
        # key 2: containment + negative bounds
        (2, -10, 50), (2, 0, 5),
    ]
    df = spark.createDataFrame(rows, "k long, lo long, hi long")
    got = {
        (r["k"], r["span_lo"], r["span_hi"], r["n_merged"])
        for r in coalesce_intervals(df, partition_cols=["k"]).collect()
    }
    assert got == {
        (1, 0, 20, 3),
        (1, 30, 40, 1),
        (2, -10, 50, 2),
    }


def test_coalesce_intervals_matches_python_sweep(spark):
    import random

    from minivectordb_spark.operators.ranges import coalesce_intervals

    rng = random.Random(11)
    rows = [
        (k, lo, lo + rng.randint(1, 40))
        for k in (1, 2, 3)
        for lo in (rng.randint(-100, 100) for _ in range(60))
    ]

    def brute(key_rows):
        ivs = sorted((lo, hi) for _, lo, hi in key_rows if hi > lo)
        spans = []
        for lo, hi in ivs:
            if spans and lo <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], hi)
                spans[-1][2] += 1
            else:
                spans.append([lo, hi, 1])
        return {(lo, hi, n) for lo, hi, n in spans}

    df = spark.createDataFrame(rows, "k long, lo long, hi long")
    got = {}
    for r in coalesce_intervals(df, partition_cols=["k"]).collect():
        got.setdefault(r["k"], set()).add(
            (r["span_lo"], r["span_hi"], r["n_merged"])
        )
    for k in (1, 2, 3):
        assert got[k] == brute([r for r in rows if r[0] == k]), k


def test_coalesce_intervals_bucketed_equals_single_pass(spark):
    """The two-level split-merge sweep (the mega-key escape hatch, now a
    real operator) must return EXACTLY the single-pass result — spans,
    keys and n_merged counts — at several bucket widths, including
    widths that force spans to cross many bucket boundaries, plus
    'auto'.  Interval union is associative; this pins the plumbing."""
    import random

    from minivectordb_spark.operators.ranges import (
        coalesce_intervals,
        coalesce_intervals_bucketed,
    )

    rng = random.Random(23)
    rows = [
        (k, lo, lo + rng.randint(1, 60))
        for k in (1, 2)
        for lo in (rng.randint(-150, 150) for _ in range(80))
    ]
    rows.append((1, -200, 300))  # one mega-interval spanning everything
    rows.append((2, 7, 7))       # degenerate: dropped by both paths
    df = spark.createDataFrame(rows, "k long, lo long, hi long")
    want = {
        (r["k"], r["span_lo"], r["span_hi"], r["n_merged"])
        for r in coalesce_intervals(df, partition_cols=["k"]).collect()
    }
    for w in (1, 5, 64, 10_000, "auto"):
        got = {
            (r["k"], r["span_lo"], r["span_hi"], r["n_merged"])
            for r in coalesce_intervals_bucketed(
                df, partition_cols=["k"], bucket_width=w
            ).collect()
        }
        assert got == want, f"w={w}"
    # unkeyed variant too
    want0 = {
        (r["span_lo"], r["span_hi"], r["n_merged"])
        for r in coalesce_intervals(df.drop("k")).collect()
    }
    got0 = {
        (r["span_lo"], r["span_hi"], r["n_merged"])
        for r in coalesce_intervals_bucketed(df.drop("k"), bucket_width=16).collect()
    }
    assert got0 == want0
