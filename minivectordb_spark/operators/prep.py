"""Corpus-preparation operators: chunking, scrubbing, deterministic
sampling — the transforms between raw documents and training batches.

Same design contract as operators/text.py: pure built-in column
expressions (whole-stage codegen, zero Python), every expression with an
exact DuckDB twin for the correctness oracle, and map-only / bounded-growth
plan shapes that hold at 100 TB:

- ``chunk_documents``: one Generate (posexplode) whose fan-out is
  tokens/stride per doc — output volume is ~input volume x (1 +
  overlap/stride), never quadratic.
- ``scrub_text``: three chained regexp_replace passes, JVM-side.
- ``stratified_sample``: hash-gated filter — no RNG state, no shuffle, and
  (unlike ``df.sampleBy``) reproducible bit-for-bit in any engine from the
  row's own bytes, so train/holdout splits stay stable across reruns and
  re-partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from minivectordb_spark.operators.hashing import md5i32
from minivectordb_spark.operators.text import token_count, tokens
from minivectordb_spark.operators.util import materialize

# Java-regex AND RE2-compatible patterns (no lookaround/backrefs) so the
# DuckDB oracle applies the literally identical expressions.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[^ ]+"
LONG_NUM_RE = "[0-9]{6,}"

SAMPLE_BUCKETS = 10_000


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window token chunks: windows of ``chunk_tokens`` whitespace
    tokens starting every ``chunk_tokens - overlap`` tokens (the standard
    training-corpus windowing).  Documents shorter than one window yield
    one chunk; empty documents yield none.

    Output: (id, chunk_id, chunk_text, chunk_tokens) — chunk_id is the
    0-based window index.

    Plan: token array staged once behind a Generate barrier, then one
    posexplode over the per-doc window count; slice/array_join are
    per-row expressions.  Map-only + bounded fan-out.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks_df = materialize(df, tokens(F.col(text_col)), "__toks", [id_col])
    n = F.size(F.col("__toks"))
    # windows: 1 + ceil(max(0, n - chunk) / stride)   (0 when n == 0)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride)).cast(
        "int"
    )
    # guard: sequence(0, -1) would generate a DESCENDING [0, -1] in Spark,
    # so empty docs must produce an explicitly empty window list
    windows = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n_chunks - 1)
    )
    exploded = toks_df.select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(windows).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("chunk_tokens"),
    )


def scrub_expr(text: Column) -> Column:
    """Emails -> <EMAIL>, URLs -> <URL>, 6+-digit runs -> <NUM> — the
    standard pre-training redaction pass, order-sensitive (emails first so
    their digit runs don't half-match)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, URL_RE, "<URL>")
    return F.regexp_replace(out, LONG_NUM_RE, "<NUM>")


def scrub_text(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    return df.withColumn(out_col, scrub_expr(F.col(text_col)))


def sample_gate(key: Column, fraction: float) -> Column:
    """Deterministic keep-gate: hash the key into [0, SAMPLE_BUCKETS) and
    keep the fixed prefix — the same row always lands on the same side,
    in any engine, at any parallelism."""
    return F.pmod(md5i32(key), F.lit(SAMPLE_BUCKETS)) < int(
        round(fraction * SAMPLE_BUCKETS)
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus token-frequency table (token, count, doc_freq) — the vocab /
    tokenizer-training precursor.  One explode + one partial-aggregated
    groupBy on the token (the only shuffle, combiner-reduced map-side);
    ``top_n`` turns the final ordering into TakeOrderedAndProject instead
    of a global sort.  Ordering: count desc, token asc (deterministic)."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    doc_toks = df.select(
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("count"))
    dfreq = doc_toks.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    out = (
        counts.join(dfreq, "token")
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("token").asc())
    )
    return out.limit(top_n) if top_n is not None else out


def temperature_fractions(
    df: DataFrame,
    strata_col: str = "lang",
    tau: float = 0.7,
) -> DataFrame:
    """Temperature-scaled mixing weights over strata (the multilingual
    training-mix rule: p_i ∝ n_i^tau, tau<1 upweights rare strata).
    Returns (stratum, n, mix_frac) with mix_frac summing to 1 — feed the
    resulting per-stratum rates into ``stratified_sample`` to materialize
    the mix.  One count aggregation + a broadcast-size normalization."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    powed = counts.withColumn("__w", F.pow(F.col("n").cast("double"), F.lit(tau)))
    total = powed.agg(F.sum("__w").alias("__t"))
    return (
        powed.crossJoin(F.broadcast(total))
        .select(
            "stratum",
            "n",
            (F.col("__w") / F.col("__t")).alias("mix_frac"),
        )
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (the data-mixing op: e.g. keep
    100% of rare languages, 10% of English).  The gate hashes
    (salt, stratum, id), so changing ``salt`` redraws the sample and
    equal fractions across strata stay uncorrelated with any other salt's
    draw.  Map-only filter; fractions resolve via a literal CASE — no join.
    """
    key = F.concat_ws("#", F.lit(salt), F.col(strata_col), F.col(id_col).cast("string"))
    gate = None
    for stratum, frac in sorted(fractions.items()):
        cond = (F.col(strata_col) == stratum) & sample_gate(key, frac)
        gate = cond if gate is None else (gate | cond)
    # NULL-safe: ~isin() is NULL (not True) for a NULL stratum, which
    # would silently drop every unlabeled row from the default bucket
    others = (
        F.coalesce(~F.col(strata_col).isin(*fractions.keys()), F.lit(True))
        if fractions
        else F.lit(True)
    )
    if default_fraction > 0:
        cond = others & sample_gate(key, default_fraction)
        gate = cond if gate is None else (gate | cond)
    if gate is None:
        gate = F.lit(False)
    return df.filter(gate)


def quota_sample(
    df: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_quota: int = 0,
    salt: str = "q0",
) -> DataFrame:
    """Exact-COUNT per-stratum sampling — the fixed-budget mix op
    ("exactly Q_s docs of stratum s per epoch") that the fraction-based
    ``stratified_sample`` cannot hit (a fraction approximates a budget;
    a quota IS one) and the global ``gumbel_topk`` cannot floor
    per-stratum.  A stratum with fewer rows than its quota keeps them
    all (row_number never pads).

    Order within a stratum is the deterministic md5 draw over
    (salt, stratum, id) with id tiebreak — the same row ORDER in any
    engine, so the oracle reproduces the selected SET, not just its
    size; changing ``salt`` redraws.  One window shuffle keyed on the
    stratum; quotas resolve via a literal CASE — no join.  Strata
    absent from ``quotas`` (including NULL) get ``default_quota``.

    At 100 TB: the window shuffles each stratum's rows to its
    partitions; a single mega-stratum is the skew exposure — the same
    one events_salted_skew documents, with the same salting escape
    hatch — but unlike a global sort the shuffle is per-stratum and
    the filter drops everything past the quota at the first read."""
    from pyspark.sql import Window

    key = F.concat_ws(
        "#", F.lit(salt), F.col(strata_col), F.col(id_col).cast("string")
    )
    w = Window.partitionBy(strata_col).orderBy(
        md5i32(key).asc(), F.col(id_col).asc()
    )
    quota_expr: Column = F.lit(int(default_quota))
    for stratum, q in sorted(quotas.items()):
        quota_expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(q))
        ).otherwise(quota_expr)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota_expr)
        .drop("__rn")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    salt: str = "t0",
) -> DataFrame:
    """Per-stratum TOKEN-budget sampling — the unit training mixes are
    actually specified in ("N tokens of language s per epoch", Llama/
    Gemma-style data cards), where ``quota_sample`` counts rows.  Keeps
    each stratum's md5-order prefix of documents whose RUNNING token sum
    stays within the stratum's budget: the first doc that would overflow
    is cut, so the kept sum is <= budget (never padded, never split —
    document-granular budgets; pack_sequences handles the within-budget
    sequence layout downstream).

    Same determinism contract as quota_sample: the (salt, stratum, id)
    md5 draw orders each stratum identically in any engine, so the twin
    verifies the selected SET; one stratum-keyed window shuffle
    (running sum + the same window's ordering), budgets via literal
    CASE, NULL strata get ``default_budget``."""
    from pyspark.sql import Window

    key = F.concat_ws(
        "#", F.lit(salt), F.col(strata_col), F.col(id_col).cast("string")
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(md5i32(key).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_expr: Column = F.lit(int(default_budget))
    for stratum, b in sorted(budgets.items()):
        budget_expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(b))
        ).otherwise(budget_expr)
    cum = F.sum(token_count(F.col(text_col))).over(w)
    return (
        df.withColumn("__cum_toks", cum)
        .filter(F.col("__cum_toks") <= budget_expr)
        .drop("__cum_toks")
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    concatenation packing: within a shard, documents are laid end-to-end
    in ``id_col`` order and the token stream is cut every ``budget``
    tokens — each document's sequence is the window containing its START
    offset (GPT-style packing: a document may straddle the cut; the
    reference has no packing op — this is pipeline surface the engine
    adds for LLM training prep).

    Spark-first shape: one shuffle (hash by shard), one per-shard
    window cumsum — no driver loop, no UDF, and an exact SQL twin
    (SUM OVER PARTITION BY ... ROWS UNBOUNDED PRECEDING), unlike
    first-fit-decreasing bin packing whose close-on-overflow recursion is
    not window-expressible.  Parallelism equals ``n_shards``: size it to
    the cluster (shards are independent token streams, so more shards
    only adds more, shorter sequences).  ``shard = id % n_shards`` keeps
    the layout reproducible from row bytes alone in any engine.

    Output: one row per document — shard, seq (global: shard * 10^12 +
    window index), seq_off (start offset within the window), n_tokens.
    """
    from pyspark.sql import Window

    tok = F.col(token_col).cast("long")
    shard = (F.col(id_col) % F.lit(n_shards)).cast("long")
    staged = df.select(
        F.col(id_col), tok.alias("__tok"), shard.alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("__tok").over(w) - F.col("__tok")).alias("__start")
    staged = staged.select(F.col(id_col), F.col("shard"), F.col("__tok"), start)
    return staged.select(
        F.col(id_col),
        F.col("shard"),
        (
            F.col("shard") * F.lit(1_000_000_000_000)
            # integral `div` on longs, not floor(double division): exact at
            # any cumulative token count (doubles lose exactness past 2^53),
            # matching the oracle's integer `//` (ADVICE r4)
            + F.expr(f"__start div {int(budget)}")
        ).alias("seq"),
        (F.col("__start") % F.lit(budget)).alias("seq_off"),
        F.col("__tok").alias("n_tokens"),
    )


DSIR_BUCKETS = 4096


def _dsir_feature_buckets(toks: Column, n_buckets: int) -> Column:
    """Hashed unigram+bigram feature MULTISET (bag, not set — DSIR weights
    count feature occurrences) bucketed to ``n_buckets`` via the portable
    md5 hash.  ``toks`` must be a materialized token array (see
    ``operators/util.materialize``)."""
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(toks, bigrams)
    return F.transform(feats, lambda s: md5i32(s) % F.lit(n_buckets))


def dsir_logweights(
    df: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    target_pred: "Column | None" = None,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    arXiv:2302.03169): score every raw-corpus document by how target-like
    its hashed-n-gram distribution is.  Fits two add-one-smoothed
    bag-of-buckets models (unigrams + bigrams hashed into ``n_buckets``):
    p_target over ``target`` and q_raw over ``df``; a document's
    ``log_weight`` is the sum over its feature OCCURRENCES of
    ``ln p_target(b) - ln q_raw(b)`` — the importance log-ratio the
    resampling step (e.g. ``stratified_sample`` keyed on a weight band, or
    Gumbel top-k) consumes.  Returns ``(id_col, n_feats, log_weight)``;
    empty documents carry no features and drop out.

    Numerics: the per-bucket log-ratio is frozen to DECIMAL(18,6) (one
    float round per BUCKET, ≤ ``n_buckets`` of them) before the per-doc
    sum — exact, order-independent, engine-portable (the tpch_q1 trick).

    Plan: one explode per side feeds two bucket-keyed groupBys (combiner-
    reduced; ≤ ``n_buckets`` groups, so the shuffle is bounded by the
    BUCKET count, not the corpus); the two totals are 1-row aggs
    cross-joined in; the ≤``n_buckets``-row log-ratio table broadcasts, so
    the per-doc scoring pass is map-only + ONE id-keyed count shuffle.  At
    100 TB: identical plan — the ratio table is fixed-size by construction
    (that is the point of feature hashing), and every corpus-sized stage
    is map-only or partial-aggregated.

    When the target is a SUBSET of ``df`` expressible as a predicate
    (the common DSIR setup — "docs like Wikipedia/en"), pass
    ``target_pred`` (a boolean Column over ``df``) instead of ``target``:
    both models then derive from ONE tokenize+hash pass over the one
    checkpointed bucket frame, instead of tokenizing the target subset a
    second time.  Identical results (same hashes, same counts) — only
    the redundant pass is removed."""
    from pyspark.sql import types as T

    from minivectordb_spark.operators import kernels
    from minivectordb_spark.operators.util import ensure_parallelism, use_arrow_kernel

    # The per-token md5 bucket hash runs as an Arrow-batched kernel
    # (kernels.dsir_bucket_mapper, guide §4.2) — the interpreted
    # Catalyst HOF chain it replaces is retained as
    # ``_dsir_feature_buckets`` and the kernel is pinned bit-identical
    # against it by tests/test_kernels.py.  The parallelism gate keeps a
    # single-row-group source from running the kernel on one core.  The
    # CORPUS side is read twice (bucket counts, then the scoring probe)
    # — a lazy checkpoint of its compact (id, buckets) frame prices the
    # hashing once and is measurably cheaper than recomputing it
    # (re-measured r5; blocks freed by the ContextCleaner when the
    # caller drops the plan).  The target side is read once and stays
    # recompute-only.
    def _bucket_frame(
        side: DataFrame, reused: bool = False, extra: list[str] | None = None
    ) -> DataFrame:
        keep = [id_col] + (extra or [])
        if not use_arrow_kernel(side):
            # size-gated twin (r15 item 1): below util.KERNEL_MIN_BYTES
            # the retained expression chain avoids the kernel's
            # JVM<->Python crossing floor (VERDICT r14 item 1)
            staged = materialize(
                ensure_parallelism(side), tokens(F.col(text_col)), "__toks", keep
            )
            out = materialize(
                staged,
                _dsir_feature_buckets(F.col("__toks"), n_buckets),
                "__b",
                keep,
            )
            return out.localCheckpoint(eager=False) if reused else out
        schema = T.StructType(
            [side.schema[c] for c in keep]
            + [T.StructField("__b", T.ArrayType(T.LongType()), True)]
        )
        out = ensure_parallelism(side.select(*keep, text_col)).mapInArrow(
            kernels.dsir_bucket_mapper(
                text_col, id_col, n_buckets, extra_cols=tuple(extra or ())
            ),
            schema,
        )
        return out.localCheckpoint(eager=False) if reused else out

    if target_pred is not None:
        # target ⊆ df declared as a predicate: evaluate it BEFORE staging
        # and derive BOTH sides from the ONE checkpointed bucket frame —
        # the corpus is tokenized and md5-hashed exactly once instead of
        # once per side (VERDICT r5 item 4: the target pass was most of
        # the query's fixed floor when target ~= the corpus)
        bf = _bucket_frame(
            df.withColumn("__is_tgt", target_pred.cast("boolean")),
            reused=True,
            extra=["__is_tgt"],
        )
        feats = bf.select(F.col(id_col), F.explode("__b").alias("b"))
        tgt_feats = bf.filter(F.col("__is_tgt")).select(
            F.explode("__b").alias("b")
        )
    else:
        if target is None:
            raise ValueError(
                "dsir_logweights: pass target (a DataFrame) or target_pred "
                "(a boolean Column over df)"
            )
        feats = _bucket_frame(df, reused=True).select(
            F.col(id_col), F.explode("__b").alias("b")
        )
        tgt_feats = _bucket_frame(target).select(F.explode("__b").alias("b"))

    raw_counts = feats.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_counts = tgt_feats.groupBy("b").agg(F.count(F.lit(1)).alias("c_tgt"))
    t_raw = raw_counts.agg(F.sum("c_raw").alias("t_raw"))
    t_tgt = tgt_counts.agg(F.sum("c_tgt").alias("t_tgt"))

    B = F.lit(n_buckets).cast("double")
    ratios = (
        raw_counts.join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(t_raw))
        .crossJoin(F.broadcast(t_tgt))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("t_tgt").cast("double") + B)
                )
                - F.log(
                    (F.col("c_raw") + F.lit(1)).cast("double")
                    / (F.col("t_raw").cast("double") + B)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lr"),
        )
    )
    return (
        feats.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("lr").cast("double"), 6).alias("log_weight"),
        )
    )


def gumbel_topk(
    df: DataFrame,
    weight_col: str = "log_weight",
    id_col: str = "doc_id",
    k: int = 1000,
    seed: int = 17,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Gumbel-top-k trick
    (Vieira 2014; Kool et al., ICML'19): draw g_i ~ Gumbel(0,1), keep the
    k largest ``log_weight + g_i`` — exactly a sample w/o replacement with
    selection probability proportional to exp(log_weight).  This is the
    resampling half of DSIR (``dsir_logweights`` produces the weights).

    The Gumbel noise is DETERMINISTIC per row: u = (md5i32(seed||id)+1) /
    (2^32+1) in (0, 1], g = -ln(-ln u) — no RNG state, bit-reproducible in
    any engine from the row's own bytes (the ``stratified_sample``
    contract), so train-set selections survive reruns and repartitioning,
    and the DuckDB oracle replays the identical draw.

    Plan: map-only key computation + TakeOrderedAndProject — no global
    sort, no shuffle of the corpus; at 100 TB this is one scan plus a
    k-row heap per partition.  Keys are rounded to 6 dp before ordering
    (engine-parity for ties); id ascending breaks residual ties."""
    u = (md5i32(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))) + 1) / F.lit(
        float((1 << 32) + 1)
    )
    key = F.round(F.col(weight_col) + -F.log(-F.log(u)), 6).alias("gumbel_key")
    return (
        df.select(F.col(id_col), F.col(weight_col), key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------- BPE vocabulary induction ----------------

BPE_SEP = "\x1f"  # unit separator: never appears in natural-language tokens
BPE_EOW = "</w>"  # end-of-word marker symbol (Sennrich et al. 2016)


def _bpe_seq_expr(word: Column) -> Column:
    """Initial BPE symbol sequence for a word: its characters joined by
    BPE_SEP with the end-of-word marker appended as a final symbol."""
    chars = F.concat_ws(
        BPE_SEP,
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.substring(word, i, F.lit(1)),
        ),
    )
    return F.concat(chars, F.lit(BPE_SEP + BPE_EOW))


def _bpe_wrap(s: Column) -> Column:
    """Wrap every symbol in its own separators ('a','b' -> '␟a␟␟b␟') so a
    literal pair replace can neither match a SUFFIX of a longer symbol
    ('za␟b' vs pair (a,b)) nor consume the boundary a following
    occurrence needs ('aaaa' with merge (a,a) must yield [aa, aa], which
    single-separator encoding gets wrong — the first replace eats the
    shared separator)."""
    return F.concat(
        F.lit(BPE_SEP), F.replace(s, F.lit(BPE_SEP), F.lit(BPE_SEP * 2)), F.lit(BPE_SEP)
    )


def _bpe_unwrap(s: Column) -> Column:
    inner = F.substring(s, 2, F.length(s) - 2)
    return F.replace(inner, F.lit(BPE_SEP * 2), F.lit(BPE_SEP))


def _bpe_apply_merge(seq: Column, left: str, right: str) -> Column:
    """Apply ONE merge left-to-right non-overlapping — exactly the
    semantics of string replace on the wrapped encoding, identical in
    Spark (UTF8String.replace) and ANSI SQL engines."""
    pat = F.lit(BPE_SEP + left + BPE_SEP + BPE_SEP + right + BPE_SEP)
    rep = F.lit(BPE_SEP + left + right + BPE_SEP)
    return _bpe_unwrap(F.replace(_bpe_wrap(seq), pat, rep))


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(seq, cnt): the distinct-WORD table with per-word corpus counts and
    initial symbol sequences — the ONLY corpus-sized pass the BPE trainer
    makes.  Words containing BPE_SEP are dropped (they cannot occur in
    natural text; the guard keeps the encoding injective)."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(BPE_SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.select(_bpe_seq_expr(F.col("word")).alias("seq"), "cnt")


def bpe_merge_table(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """BPE vocabulary induction (Sennrich et al., arXiv:1508.07909) as a
    relational program — the subword-vocab trainer a training-data
    pipeline runs before tokenization.  Returns the learned merge table
    ``(step, left, right, merged, pair_count)`` in merge order.

    The classic trainer is "iterate: count adjacent symbol pairs, merge
    the most frequent" — quadratic-looking, but industrial trainers run
    it over the WORD table, not the corpus, and so does this one:

    - ONE corpus pass builds (word, count) — after that, every iteration
      touches only the vocab-bounded word table (Heaps' law: millions of
      rows at any corpus size, orders of magnitude under the corpus).
    - Per iteration: one pair-keyed combiner-reduced aggregate over the
      word table, ONE driver-collected argmax row (count DESC, pair ASC —
      deterministic), and a map-only string rewrite.  The rewrite is a
      literal replace over a double-separator encoding (see
      ``_bpe_wrap``), whose left-to-right non-overlapping semantics equal
      BPE's and are IDENTICAL in Spark and ANSI SQL — so the whole
      training loop is replayed by the DuckDB oracle as unrolled CTEs
      (the lloyd_kmeans_fit pattern for iterative algorithms).
    - Lineage is truncated every ``checkpoint_every`` merges (each merge
      otherwise stacks three string ops onto the plan).

    Ties and exhaustion: the argmax tiebreak is (count DESC, left ASC,
    right ASC); training stops early if no pair remains (every word fused
    to one symbol)."""
    spark = df.sparkSession
    cur = bpe_word_counts(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        syms = F.split(F.col("seq"), BPE_SEP)
        n = F.size(syms)
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(syms, 1, n - 1),
                F.slice(syms, 2, n - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        best = (
            cur.select(F.explode(pairs).alias("p"), F.col("cnt"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, l, r, l + r, c))
        cur = cur.select(_bpe_apply_merge(F.col("seq"), l, r).alias("seq"), "cnt")
        if (step + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: (id, n_bpe_tokens,
    bpe_tokens).  The merges compile into ONE chained-replace expression
    evaluated over the DISTINCT word table (vocab-bounded — each word is
    encoded once no matter how often it occurs), then per-doc tokens
    join the encoded table map-side and re-assemble in position order."""
    docs = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    ).filter(~F.col("word").contains(BPE_SEP))
    vocab = docs.select("word").distinct()
    seq = _bpe_seq_expr(F.col("word"))
    for l, r in merges:
        seq = _bpe_apply_merge(seq, l, r)
    encoded = vocab.select(F.col("word"), F.split(seq, BPE_SEP).alias("wtoks"))
    return (
        docs.join(F.broadcast(encoded), "word")
        .select(F.col(id_col), "pos", "wtoks")
        .groupBy(id_col)
        .agg(
            F.flatten(F.array_sort(F.collect_list(F.struct("pos", "wtoks"))).wtoks)
            .alias("bpe_tokens")
        )
        .select(
            F.col(id_col),
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            "bpe_tokens",
        )
    )


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (8, 1, 1),
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/val/test assignment: every member of a duplicate /
    near-duplicate component lands in the SAME split.

    A naive per-document hash split leaks training data into eval — the
    documented failure mode behind inflated benchmark numbers (the
    motivation of Lee et al., arXiv:2107.06499: near-dups straddling the
    split boundary).  Here the split key is the duplicate-component
    representative (min reachable id via ``connected_components`` over
    ``pairs``); singletons key on their own id.  The assignment is the
    engine-portable md5 bucket of the salted key string, so the DuckDB
    twin reproduces it literal-for-literal, and by construction no
    component can span two splits.

    Cost at scale: the CC of the (answer-sized) pair set + one LEFT join
    of the corpus against the (answer-sized) membership table + a
    map-only hash — the corpus itself shuffles zero times.

    Returns ``df``'s rows as (id, split) with split in
    {'train', 'val', 'test'} weighted by ``weights`` (out of their sum).
    """
    from minivectordb_spark.operators.dedup import connected_components

    total = sum(weights)
    comp = connected_components(pairs).select(
        F.col("id").alias("__cid"), F.col("component").alias("__comp")
    )
    joined = df.select(F.col(id_col)).join(
        comp, F.col(id_col) == F.col("__cid"), "left"
    )
    group_key = F.coalesce(F.col("__comp"), F.col(id_col))
    bucket = md5i32(
        F.concat(F.lit(salt + ":"), group_key.cast("string"))
    ) % total
    split = (
        F.when(bucket < F.lit(weights[0]), "train")
        .when(bucket < F.lit(weights[0] + weights[1]), "val")
        .otherwise("test")
    )
    return joined.select(F.col(id_col), split.alias("split"))
