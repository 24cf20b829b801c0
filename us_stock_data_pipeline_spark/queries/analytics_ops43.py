"""Round-35 analytics, part 43: loan amortization schedules (closed
form) and per-document char-entropy compressibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.functions import detmath
from us_stock_data_pipeline_spark.registry import register

# --------------------------------------------------------------------------
# Amortization schedule (closed-form balance, no recursion)
# --------------------------------------------------------------------------

_AMORT_MONTHS = 12
_AMORT_RATE_BP = 100  # 1% per month

# power() is libm territory (transcendental audit r9): precompute the
# (1+r)^m ladder and the annuity factor r/(1-(1+r)^-n) as PYTHON double
# literals — repr() round-trips exactly, so both engines parse the same
# bits and the floor() quantization below can never straddle.
_AMORT_R = _AMORT_RATE_BP / 10000.0
_AMORT_AF = _AMORT_R / (1.0 - (1.0 + _AMORT_R) ** -_AMORT_MONTHS)
_AMORT_POWS = [(m, (1.0 + _AMORT_R) ** m) for m in range(1, _AMORT_MONTHS + 1)]
_AMORT_VALUES = ", ".join(
    f"({m}, CAST({pw!r} AS DOUBLE))" for m, pw in _AMORT_POWS
)

_AMORT_ORACLE = f"""
WITH loans AS (
  SELECT o_orderkey AS loan_id,
         CAST(round(o_totalprice * 100) AS BIGINT) AS principal_cents
  FROM orders WHERE o_orderkey % 1000 = 0
),
months AS (SELECT * FROM (VALUES {_AMORT_VALUES}) AS t(m, pw)),
sched AS (
  SELECT l.loan_id, l.principal_cents, m.m, m.pw
  FROM loans l CROSS JOIN months m
)
SELECT loan_id, CAST(m AS BIGINT) AS month,
       -- annuity payment: P * precomputed r/(1-(1+r)^-n), quantized once
       CAST(floor(principal_cents * CAST({_AMORT_AF!r} AS DOUBLE) + 0.5) AS BIGINT) AS payment_cents,
       -- closed-form balance after m payments:
       -- B_m = P*(1+r)^m - pmt*((1+r)^m - 1)/r
       CAST(floor(principal_cents * pw
                  - floor(principal_cents * CAST({_AMORT_AF!r} AS DOUBLE) + 0.5)
                    * (pw - 1.0) / CAST({_AMORT_R!r} AS DOUBLE)
                  + 0.5) AS BIGINT) AS balance_cents
FROM sched
ORDER BY loan_id, month
"""


@register("finance_amortization_schedule", oracle=_AMORT_ORACLE, tags=("analytics", "finance"))
def finance_amortization_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loan amortization schedule WITHOUT the sequential balance walk:
    the annuity payment is P*r/(1-(1+r)^-n) and the balance after m
    payments has the closed form B_m = P(1+r)^m - pmt*((1+r)^m - 1)/r,
    so the whole schedule is a months-ladder fan-out plus expression
    arithmetic — no recursion, no window, embarrassingly parallel
    across loans (the shape that matters when "loans" is every
    customer of a lender). The payment is quantized ONCE and the
    quantized payment feeds the balance formula, so the schedule is
    self-consistent; both engines evaluate the identical double
    expression over exact integer principals. Plan: a keyed sample of
    orders as loans, a {_AMORT_MONTHS}-row broadcast ladder, pure
    codegen after that."""
    loans = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 1000 == 0)
        .select(
            F.col("o_orderkey").alias("loan_id"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("principal_cents"),
        )
    )
    months = spark.createDataFrame(_AMORT_POWS, "m int, pw double")
    pmt = F.floor(F.col("principal_cents") * F.lit(_AMORT_AF) + F.lit(0.5))
    bal = F.floor(
        F.col("principal_cents") * F.col("pw")
        - pmt * (F.col("pw") - 1.0) / F.lit(_AMORT_R)
        + F.lit(0.5)
    )
    return (
        loans.crossJoin(F.broadcast(months))
        .select(
            "loan_id",
            F.col("m").cast("long").alias("month"),
            pmt.cast("long").alias("payment_cents"),
            bal.cast("long").alias("balance_cents"),
        )
        .orderBy("loan_id", "month")
    )


# --------------------------------------------------------------------------
# Char-entropy compressibility
# --------------------------------------------------------------------------

# ln(p) = ln(c) - ln(n) via the libm-free integer-ln kernel: identical
# IEEE arithmetic in both engines, so the floor() quantization below can
# never straddle differently (transcendental audit r9 tier-1 fix).
_ENTROPY_STAGES = detmath.det_ln_int_stages("c", "ln_c") + detmath.det_ln_int_stages(
    "n", "ln_n"
)
_ENTROPY_TERM = (
    "CAST(floor(-(CAST(c AS DOUBLE) / n) * (ln_c - ln_n) / "
    f"{detmath.LN2} * 1000000 + 0.5) AS BIGINT)"
)

_ENTROPY_ORACLE = f"""
WITH chars AS (
  SELECT d.doc_id, substr(d.text, t.p, 1) AS ch
  FROM documents d,
       LATERAL unnest(generate_series(1, length(d.text))) AS t(p)
),
freqs AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM chars GROUP BY doc_id, ch
),
lens AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM freqs GROUP BY doc_id
),
terms AS (
  SELECT doc_id, n, {_ENTROPY_TERM} AS h_term_e6
  FROM {detmath.stages_to_select(_ENTROPY_STAGES,
        "(SELECT f.doc_id, l.n, f.c FROM freqs f JOIN lens l ON l.doc_id = f.doc_id)")}
)
SELECT doc_id, n AS n_chars,
       CAST(sum(h_term_e6) AS BIGINT) AS entropy_bits_e6,
       CAST(sum(h_term_e6) * 100 // 8000000 AS BIGINT) AS est_compressed_pct
FROM terms
GROUP BY doc_id, n
ORDER BY doc_id
"""


@register("text_char_entropy", oracle=_ENTROPY_ORACLE, tags=("llm", "text"))
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character entropy (bits/char) and the order-0
    compressibility estimate it implies — the cheap screen for
    binary-garbage, base64 blobs, and degenerate repetition in a crawl
    (near-8-bit entropy = encoded junk; near-0 = spam padding; prose
    sits ~4.0-4.5). Each -p*log2(p) term is micro-quantized to 1e-6
    BEFORE the per-doc sum (order-independence), with ln(p) =
    ln(c) - ln(n) computed by the libm-free detmath kernel so both
    engines produce bit-identical doubles and the floor() boundary is
    moot. The estimated compressed size is the exact integer ratio
    entropy/8. Plan: one char explode (positions ladder, 1-char
    substrings), two aggregates — all shuffles keyed on doc_id."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 2)
    docs = load_table(spark, sf_dir, "documents").repartition(n_parts, "doc_id")
    chars = docs.select(
        "doc_id",
        F.explode(F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")).alias("ch"),
    )
    freqs = chars.groupBy("doc_id", "ch").agg(F.count("*").cast("long").alias("c"))
    lens = freqs.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    terms = detmath.apply_stages(freqs.join(lens, "doc_id"), _ENTROPY_STAGES).selectExpr(
        "doc_id",
        "n",
        f"{_ENTROPY_TERM} AS h_term_e6",
    )
    return (
        terms.groupBy("doc_id", "n")
        .agg(F.sum("h_term_e6").cast("long").alias("entropy_bits_e6"))
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "entropy_bits_e6",
            F.expr("CAST(entropy_bits_e6 * 100 div 8000000 AS BIGINT)").alias(
                "est_compressed_pct"
            ),
        )
        .orderBy("doc_id")
    )
