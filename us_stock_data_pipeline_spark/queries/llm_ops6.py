"""LLM-data-pipeline operators, part 6 (round 3): PII redaction, BPE
pair counting, corpus mixture sampling, exact greedy packing, a
from-first-principles Bloom-filter semi-join, inference micro-batch
building, and heavy-hitter skew diagnostics.

Each operator follows the house contract: Spark-first DataFrame plan,
identically-aliased DuckDB oracle (value-hash checkable), floats rounded
identically on both sides, docstring carries the 100 TB plan rationale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# PII detection / redaction
# --------------------------------------------------------------------------

# The fixture text is synthetic word salad with no PII (FIXTURES.md), so
# PII is PLANTED deterministically in-query (same trick as the planted
# embedding near-dups): every 5th doc gets an email and a phone derived
# from doc_id, with the identical planting expression in the oracle.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = rf"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call +1-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
)
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM planted
ORDER BY doc_id
"""


@register("pii_redact", oracle=_PII_ORACLE, tags=("llm", "text", "pii"))
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection and redaction — the compliance pass every training
    corpus runs before anything else. Emails and phone numbers are
    counted (regexp_count) and masked (regexp_replace), entirely in JVM
    codegen — regex over a string column is the textbook map-side-only
    operator: no shuffle, embarrassingly parallel, composes with scan
    pruning, and at 100 TB runs at read bandwidth. The redacted text is
    md5'd for the oracle comparison (hashing the full rewritten column
    proves byte-identical redaction without shipping megabytes through
    the canonicalizer)."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        docs.select("doc_id", planted.alias("text"))
        .select(
            "doc_id",
            F.regexp_count("text", F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
            F.regexp_count("text", F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
            F.md5(redacted).alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# BPE-style adjacent-pair counting
# --------------------------------------------------------------------------

_BPE_ORACLE = """
WITH pairs AS (
  SELECT unnest(list_transform(range(1, length(text)),
                               i -> substr(text, CAST(i AS INTEGER), 2))) AS pair
  FROM documents
  WHERE length(text) >= 2
),
counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs
  WHERE regexp_matches(pair, '^[a-z]{2}$')
  GROUP BY pair
),
ranked AS (
  SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
  FROM counted
)
SELECT CAST(rnk AS BIGINT) AS rnk, pair, cnt
FROM ranked WHERE rnk <= 40
ORDER BY rnk
"""


@register("bpe_pair_counts", oracle=_BPE_ORACLE, tags=("llm", "text", "tokenizer"))
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of the BPE-tokenizer-training inner loop: count every
    adjacent character pair across the corpus and rank the merge
    candidates. The pair stream is generated INSIDE the row via
    transform(sequence(...)) — explode multiplies rows within the stage
    (no shuffle to expand), the count is a two-stage partial aggregate on
    a tiny key space (<= 26^2 letter pairs), and the final top-40 sorts
    only the aggregated counts. At 100 TB this is one scan + one
    KB-sized shuffle: the aggregate state, not the corpus, moves —
    exactly how a production BPE trainer distributes (the full trainer
    iterates this op with a merge table; one round is the representative
    kernel)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    pairs = docs.select(
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("pair")
    ).filter(F.col("pair").rlike("^[a-z]{2}$"))
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        counted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 40)
        .select("rnk", "pair", "cnt")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# Corpus mixture sampling to target proportions
# --------------------------------------------------------------------------

# Target mixture weights (python-generated into BOTH engines' expressions
# so the literals are bit-identical). Heavier weight on three sources,
# uniform remainder — the "up-weight curated, down-weight crawl" shape.
_MIX_WEIGHTS = {"src0": 0.15, "src1": 0.10, "src2": 0.10}
_MIX_DEFAULT = 0.038
_MIX_FRACTION = 0.25  # overall corpus fraction to keep

# Portable deterministic uniform in [0, 1): pure integer arithmetic
# (Weyl-style multiplicative step), identical in both engines — engine
# hash functions (Spark hash/xxhash64 vs DuckDB hash) never agree.
_MIX_U = "((doc_id * 2654435761) % 1000000) / 1000000.0"


def _mix_weight_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {w!r}" for s, w in _MIX_WEIGHTS.items()
    )
    return f"CASE {whens} ELSE {_MIX_DEFAULT!r} END"


_MIX_ORACLE = f"""
WITH sized AS (
  SELECT d.*,
         {_mix_weight_sql()} AS w,
         (SELECT count(*) FROM documents) AS total,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM documents d
),
decided AS (
  SELECT source,
         least(1.0, w * {_MIX_FRACTION!r} * CAST(total AS DOUBLE) / n_src) AS rate,
         CASE WHEN {_MIX_U} < least(1.0, w * {_MIX_FRACTION!r} * CAST(total AS DOUBLE) / n_src)
              THEN 1 ELSE 0 END AS kept
  FROM sized
)
SELECT source,
       CAST(count(*) AS BIGINT)  AS n_docs,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       round(max(rate), 6)       AS rate
FROM decided
GROUP BY source
ORDER BY source
"""


@register("corpus_mixture_sample", oracle=_MIX_ORACLE, tags=("llm", "sampling", "mixture"))
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling to target source proportions — THE operator that
    turns a raw crawl into a training mix (up-weight curated sources,
    cap everything at its available mass). Per-source keep-rate =
    min(1, weight * fraction * corpus_total / source_count), computed
    from two tiny aggregates (a global count broadcast as a 1-row cross
    join and a per-source windowed count); the keep decision is a pure
    function of doc_id (Weyl-sequence uniform — reproducible across
    runs, engines, and retries, join-stable across tables, no seed
    plumbing), so the filter is map-side and composes with scan pruning.
    At 100 TB the only data that moves is the per-source count state;
    the corpus itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    w_col = F.lit(_MIX_DEFAULT)
    for s, wt in reversed(list(_MIX_WEIGHTS.items())):
        w_col = F.when(F.col("source") == s, F.lit(wt)).otherwise(w_col)
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    sized = docs.join(F.broadcast(total)).withColumn(
        "n_src", F.count(F.lit(1)).over(W.partitionBy("source"))
    )
    rate = F.least(
        F.lit(1.0),
        w_col * F.lit(_MIX_FRACTION) * F.col("total").cast("double") / F.col("n_src"),
    )
    kept = (F.expr(_MIX_U) < rate).cast("long")
    return (
        sized.select("source", rate.alias("rate"), kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(F.max("rate"), 6).alias("rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Exact greedy token packing (sequential kernel + recursive-CTE oracle)
# --------------------------------------------------------------------------

_PACK_BUDGET = 512
# Shard fan-out for the pack key: groups shuffle on (source, shard), so no
# group is ever larger than ~|source| / _PACK_SHARDS rows — the knob that
# keeps Arrow batches executor-sized at 100 TB (raise it with corpus size;
# bins never span shards by construction). The shard is a Fibonacci
# (multiplicative) hash of doc_id taking the HIGH 3 bits of the mixed
# 32-bit word: a plain doc_id % 8 inherits the fixture's cyclic
# source-assignment pattern (source = doc_id % n_sources) and lands every
# source on only gcd-related residues — low bits of an arithmetic
# progression don't mix, high bits of odd-multiplier products do. Integer
# arithmetic only, so Spark and DuckDB compute it bit-identically.
_PACK_SHARDS = 8
_SHARD_MULT = 2654435761  # 2^32 / golden ratio, odd => bijection mod 2^32
_SHARD_SQL = f"((doc_id * {_SHARD_MULT}) % 4294967296) // 536870912"  # DuckDB
_SHARD_EXPR = f"((doc_id * {_SHARD_MULT}) % 4294967296) div 536870912"  # Spark

_GREEDY_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT source, {_SHARD_SQL} AS shard, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY source, {_SHARD_SQL}
                            ORDER BY doc_id) AS rn
  FROM documents
),
packed(source, shard, rn, n_tok, bin_id, fill) AS (
  SELECT source, shard, rn, n_tok, 0, n_tok FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.shard, d.rn, d.n_tok,
         CASE WHEN p.fill + d.n_tok > {_PACK_BUDGET} THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + d.n_tok > {_PACK_BUDGET} THEN d.n_tok ELSE p.fill + d.n_tok END
  FROM d JOIN packed p
    ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT source,
       CAST(shard AS BIGINT)      AS shard,
       CAST(bin_id AS BIGINT)     AS bin_id,
       CAST(count(*) AS BIGINT)   AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY source, shard, bin_id
ORDER BY source, shard, bin_id
"""


@register("pack_greedy_exact", oracle=_GREEDY_ORACLE, tags=("llm", "pack", "udf"))
def pack_greedy_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT greedy first-fit token packing — the sequential twin of
    pack_token_budget's offset-binning relaxation (llm_ops3.py): the bin
    resets exactly when adding the next doc would exceed the budget, so
    no bin ever overflows. bin_{i} depends on bin_{i-1}: inherently
    sequential, not window-expressible — the architecture's reserved
    case for applyInPandas (same contract as bars_ema): one shuffle on
    the pack key (source, shard), each group arrives as one Arrow batch,
    the fold is a per-group integer kernel (bit-exact, no float drift),
    and the oracle is the identical fold as a DuckDB recursive CTE. The
    shard sub-key (a Fibonacci hash of doc_id) bounds every group to
    |source| / shards rows so Arrow batches stay executor-sized at any
    corpus scale; bins never span shards by construction (the 100 TB
    deployment raises _PACK_SHARDS with corpus size — the bound is
    tested in tests/test_llm_ops6.py)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.expr(_SHARD_EXPR).cast("long").alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )

    def pack_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids = [0] * len(pdf)
        bin_id, fill = 0, 0
        for i, tok in enumerate(pdf["n_tok"]):
            tok = int(tok)
            if i == 0:
                fill = tok
            elif fill + tok > _PACK_BUDGET:
                bin_id += 1
                fill = tok
            else:
                fill += tok
            bin_ids[i] = bin_id
        pdf["bin_id"] = bin_ids
        return pdf[["source", "shard", "doc_id", "n_tok", "bin_id"]]

    out_schema = "source string, shard long, doc_id long, n_tok long, bin_id long"
    return (
        d.groupBy("source", "shard")
        .applyInPandas(pack_kernel, out_schema)
        .groupBy("source", "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .orderBy("source", "shard", "bin_id")
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join (from first principles)
# --------------------------------------------------------------------------

_BLOOM_MIN_M = 16384  # floor on filter width (bits)
_BLOOM_BITS_PER_KEY = 64  # m = max(floor, bits_per_key * ndv): fp ~ 1e-4 at k=3
_BLOOM_K = 3  # hash functions

# Runtime filters only pay off when the build side is SELECTIVE — an
# unselective build (every probe row a member) leaves nothing to prune
# and saturates any fixed-width filter. The build side here is the
# urgent-priority order slice (~1/5 of orders), so most customers are
# true negatives and the false-positive witness has a real denominator.
_BLOOM_ORACLE = """
WITH probe AS (
  SELECT c_custkey,
         EXISTS (SELECT 1 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderpriority = '1-URGENT') AS is_member
  FROM customer c
)
SELECT
  CAST(count(*) AS BIGINT)                                    AS n_probed,
  CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)  AS n_member_exact,
  true                                                        AS no_false_negatives,
  true                                                        AS fp_rate_ok
FROM probe
"""


@register("bloom_semijoin", oracle=_BLOOM_ORACLE, tags=("join", "sketch", "bloom"))
def bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, built from first principles in
    DataFrame ops (Spark's internal bloom_filter_agg isn't SQL-exposed):
    k=3 hash positions per build-side key (xxhash64, salted), the filter
    is the DISTINCT position set (an aggregated few-KB array), broadcast
    to the probe side where membership = all k positions present. This
    is the runtime-filter pattern that cuts shuffle-joins at 100 TB:
    build over the small/SELECTIVE side (here the urgent-priority order
    slice — an unselective build prunes nothing and saturates the bits),
    broadcast bits, drop probe rows before the expensive join — the
    probe never shuffles to discover non-membership. The position set is
    a sorted-int-array stand-in for the bitset (few-KB broadcast; a real
    deployment packs it into longs — same plan shape). Probabilistic
    halves use the boolean-witness oracle (exact membership via EXISTS
    on both engines, then: a Bloom filter must have ZERO false
    negatives; the false-positive rate must stay under 5% — both
    engine-checked, constant-true in the oracle). Sizing: the filter
    width m is NOT a constant — it is derived in-plan from an
    approx_count_distinct of the build keys (m = max(_BLOOM_MIN_M,
    _BLOOM_BITS_PER_KEY * ndv), a 1-row broadcast both sides feed on),
    so fp stays ~1e-4 at any fixture SF or build selectivity instead of
    saturating a fixed width — the same stats-driven sizing a real
    runtime-filter framework does, with no driver-side action."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    def positions(col: F.Column) -> list[F.Column]:
        # pmod by the in-plan width column `m` (joined in below).
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.col("m")) for i in range(_BLOOM_K)
        ]

    build_keys = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    width = build_keys.agg(
        F.greatest(
            F.lit(_BLOOM_MIN_M),
            F.approx_count_distinct("o_custkey") * _BLOOM_BITS_PER_KEY,
        ).alias("m")
    )
    build = (
        build_keys.join(F.broadcast(width))
        .select(F.explode(F.array(*positions(F.col("o_custkey")))).alias("pos"))
        .distinct()
        .agg(F.collect_set("pos").alias("bits"))
    )
    probed = (
        cust.join(F.broadcast(width))
        .select("c_custkey", *[
            p.alias(f"p{i}") for i, p in enumerate(positions(F.col("c_custkey")))
        ])
        .join(F.broadcast(build))
        .select(
            "c_custkey",
            (
                F.array_contains("bits", F.col("p0"))
                & F.array_contains("bits", F.col("p1"))
                & F.array_contains("bits", F.col("p2"))
            ).alias("bloom_hit"),
        )
    )
    exact = cust.join(
        build_keys.select("o_custkey").distinct(),
        cust.c_custkey == F.col("o_custkey"),
        "left",
    ).select("c_custkey", F.col("o_custkey").isNotNull().alias("is_member"))
    joined = probed.join(exact, "c_custkey")
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("is_member").cast("long")).alias("n_member_exact"),
        # Bloom guarantee: member => hit, no exceptions.
        (F.sum((F.col("is_member") & ~F.col("bloom_hit")).cast("long")) == 0).alias(
            "no_false_negatives"
        ),
        # FP rate over true negatives stays under 5% at m/n >= 16, k=3.
        (
            F.sum((~F.col("is_member") & F.col("bloom_hit")).cast("long"))
            <= F.sum((~F.col("is_member")).cast("long")) * 0.05
        ).alias("fp_rate_ok"),
    )


# --------------------------------------------------------------------------
# Inference micro-batch builder (length-sorted padding minimization)
# --------------------------------------------------------------------------

_BATCH_SIZE = 8

_BATCH_ORACLE = f"""
WITH d AS (
  SELECT source, {_SHARD_SQL} AS shard, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
ranked AS (
  SELECT source, shard, n_tok,
         row_number() OVER (PARTITION BY source, shard
                            ORDER BY n_tok, doc_id) AS rn
  FROM d
)
SELECT source,
       CAST(shard AS BIGINT)                                AS shard,
       CAST((rn - 1) // {_BATCH_SIZE} AS BIGINT)            AS batch_id,
       CAST(count(*) AS BIGINT)                             AS n_docs,
       CAST(max(n_tok) AS BIGINT)                           AS max_tok,
       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT)   AS pad_tokens
FROM ranked
GROUP BY source, shard, batch_id
ORDER BY source, shard, batch_id
"""


@register("batch_padding_builder", oracle=_BATCH_ORACLE, tags=("llm", "batching"))
def batch_padding_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference micro-batching: sort docs by token
    length within each source, cut into fixed-size batches, report the
    padding each batch wastes (batch_size * max_len - sum_len — what a
    padded tensor actually allocates). Sorting by length before batching
    is the standard padding minimizer (random batching wastes ~40%+;
    sorted batching single digits). The sort key is (source, shard) —
    the same Fibonacci-hash sub-key as pack_greedy_exact — so no
    window partition ever exceeds |source| / shards rows: one bounded
    shuffle, no global sort, at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        F.expr(_SHARD_EXPR).cast("long").alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = W.partitionBy("source", "shard").orderBy("n_tok", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", ((F.col("rn") - 1) / _BATCH_SIZE).cast("long"))
        .groupBy("source", "shard", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_tok"),
            (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")).alias("pad_tokens"),
        )
        .orderBy("source", "shard", "batch_id")
    )


# --------------------------------------------------------------------------
# Heavy-hitter skew diagnostics
# --------------------------------------------------------------------------

_HH_ORACLE = """
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(sum(n_events) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_users
  FROM counts
),
ranked AS (
  SELECT c.user_id, c.n_events,
         round(CAST(c.n_events AS DOUBLE) / t.total, 6) AS share,
         c.n_events * t.n_users > 2 * t.total AS is_heavy,
         row_number() OVER (ORDER BY c.n_events DESC, c.user_id) AS rnk
  FROM counts c, tot t
)
SELECT CAST(rnk AS BIGINT) AS rnk, user_id, n_events, share, is_heavy
FROM ranked WHERE rnk <= 15
ORDER BY rnk
"""


@register("skew_heavy_hitters", oracle=_HH_ORACLE, tags=("analytics", "skew"))
def skew_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection — the diagnostic you run BEFORE picking a
    join strategy: per-key frequency, share of total, and a 2x-uniform
    heaviness flag (the keys join_salted_skew's salting exists for).
    Two-stage partial aggregate on the key, a 1-row totals broadcast,
    then top-15 via orderBy(...).limit(15) — Spark compiles that to
    TakeOrderedAndProject: every partition computes its own partial
    top-15 in parallel and only 15-row candidate sets reach the driver
    merge, so at billions of keys no single task ever sorts the full
    count table (the plan shape is asserted in tests/test_plans.py).
    Ranks are attached afterwards by a window over the 15 surviving
    rows only. The integer heaviness predicate (n * n_users > 2 *
    total) avoids float thresholds entirely. At 100 TB this is the
    profile that decides salting width per key, fed by exactly this
    plan over a sample or the full data."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    tot = counts.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_users")
    )
    top15 = counts.orderBy(F.desc("n_events"), F.asc("user_id")).limit(15)
    w = W.orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        top15.join(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .select(
            "rnk",
            "user_id",
            "n_events",
            F.round(F.col("n_events").cast("double") / F.col("total"), 6).alias("share"),
            (F.col("n_events") * F.col("n_users") > 2 * F.col("total")).alias("is_heavy"),
        )
        .orderBy("rnk")
    )
