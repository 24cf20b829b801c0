"""Round-64 LLM ops, part 32: LSH S-curve calibration — observed
band-collision rate vs the analytic 1-(1-s^r)^b curve, per exact-
Jaccard decile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from us_stock_data_pipeline_spark.catalog import load_table
from us_stock_data_pipeline_spark.queries.llm_ops import (
    _BAND_ROWS,
    _MERSENNE,
    _MINHASH_BAND_ROWS,
    _MINHASH_MIN_EXPRS,
    _N_PERM,
    exploded_shingle_hashes,
    minhash_agg_exprs,
)
from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.registry import register

_SAMPLE_MOD = 7  # ~14% doc sample keeps the exact-Jaccard pair table small
_HOT_SHINGLE_CAP = 50  # drop shingles shared by more docs (quadratic guard)
_N_BANDS = _N_PERM // _BAND_ROWS


def _theory_e4(decile: int) -> int:
    s = (decile + 0.5) / 10.0
    p = 1.0 - (1.0 - s**_BAND_ROWS) ** _N_BANDS
    return int(p * 10_000 + 0.5)

_THEORY_CASE = "CASE " + " ".join(
    f"WHEN decile = {d} THEN {_theory_e4(d)}" for d in range(10)
) + " END"

_SCURVE_ORACLE = f"""
WITH sample_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_SAMPLE_MOD} = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM sample_docs),
tg0 AS (
  SELECT DISTINCT doc_id,
         ('0x' || substring(md5(array_to_string(list_slice(ws, i.g, i.g + 2), ' ')), 1, 15))::BIGINT AS h
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS g) i
),
hot AS (
  SELECT h FROM tg0 GROUP BY h HAVING count(*) > {_HOT_SHINGLE_CAP}
),
tg AS (
  SELECT * FROM tg0 WHERE h NOT IN (SELECT h FROM hot)
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tg GROUP BY 1),
shared AS (
  SELECT ta.doc_id AS a, tb.doc_id AS b, CAST(count(*) AS BIGINT) AS ns
  FROM tg ta JOIN tg tb ON tb.h = ta.h AND tb.doc_id > ta.doc_id
  GROUP BY 1, 2
),
jacc AS (
  SELECT s.a, s.b,
         least(9, CAST(s.ns * 10 // (ca.n + cb.n - s.ns) AS BIGINT)) AS decile
  FROM shared s
  JOIN counts ca ON ca.doc_id = s.a
  JOIN counts cb ON cb.doc_id = s.b
),
sig AS (
  SELECT doc_id,
         {_MINHASH_MIN_EXPRS}
  FROM tg GROUP BY doc_id
),
bands AS (
  {_MINHASH_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.m0 = b.m0 AND a.m1 = b.m1
   AND a.m2 = b.m2 AND a.m3 = b.m3 AND a.doc_id < b.doc_id
),
tagged AS (
  SELECT j.decile,
         CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS collided
  FROM jacc j LEFT JOIN cand c ON c.a = j.a AND c.b = j.b
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(collided) AS BIGINT) AS n_collided,
       CAST(sum(collided) * 10000 // count(*) AS BIGINT) AS observed_e4,
       CAST({_THEORY_CASE} AS BIGINT) AS theory_e4
FROM tagged
GROUP BY decile
ORDER BY decile
"""


@register("dedup_lsh_scurve", oracle=_SCURVE_ORACLE, tags=("llm", "dedup", "approx"))
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve calibration: for every exact-Jaccard decile among
    shingle-sharing doc pairs, the OBSERVED rate at which the
    {_N_PERM}-perm / {_N_BANDS}x{_BAND_ROWS}-band MinHash pipeline of
    `dedup_minhash_lsh` produces a band collision, next to the
    ANALYTIC 1-(1-s^r)^b value at the decile midpoint — the
    calibration table that answers "is my banding config actually
    catching the similarity range I think it is" BEFORE committing a
    100 TB dedup run to it (recall misses at s~0.5-0.7 are invisible
    in output volume and fatal to dedup quality). Same md5-derived
    shingle hashes, same 16 affine permutations, same band rule as
    the production op; a ~1/{_SAMPLE_MOD} doc sample plus a
    {_HOT_SHINGLE_CAP}-doc hot-shingle cap bound the exact-Jaccard
    pair table (the cap drops degenerate boilerplate shingles that
    would quadratically blow up ANY exact verify — the same guard the
    fuzzy-dedup ops use). All rates are integer floor-divides; the
    theory column is a constant CASE. On the fixture the observed
    curve is BIMODAL (decile 0: 0/275 collide; decile 9: 4/4 vs
    theory 0.9988 at sf0.1) — which is exactly what real corpora look
    like and why the middle of the S-curve needs planted pairs to
    probe (tests/test_lsh_recall.py plants them). Plan: one shingle
    explode
    (shared by Jaccard and signature paths), one h-keyed pair join
    bounded by the cap, one band equi-join — no O(n^2) stage."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _SAMPLE_MOD == 0
    )
    tg0 = exploded_shingle_hashes(docs)
    hot = tg0.groupBy("h").agg(F.count(F.lit(1)).alias("dc")).filter(
        F.col("dc") > _HOT_SHINGLE_CAP
    ).select("h")
    # tg feeds FOUR consumers (counts, both pair legs, the signature
    # aggregate) — without persist each one re-runs scan+explode+anti-join
    # (the round-7 multi-consumer rule).
    tg = registry.track_persist(tg0.join(F.broadcast(hot), "h", "left_anti"))
    counts = tg.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ta = tg.select(F.col("doc_id").alias("a"), "h")
    tb = tg.select(F.col("doc_id").alias("b"), F.col("h").alias("hb"))
    shared = (
        ta.join(tb, (F.col("hb") == F.col("h")) & (F.col("b") > F.col("a")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("ns"))
    )
    jacc = (
        shared.join(counts.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(counts.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            F.least(
                F.lit(9),
                F.floor(F.col("ns") * 10 / (F.col("na") + F.col("nb") - F.col("ns"))).cast(
                    "long"
                ),
            ).alias("decile"),
        )
    )
    # sig fans into one frame per band and then both join legs.
    sig = registry.track_persist(tg.groupBy("doc_id").agg(*minhash_agg_exprs()))
    band_frames = []
    for band in range(_N_BANDS):
        cols = [F.col(f"mh{band * _BAND_ROWS + r}").alias(f"m{r}") for r in range(_BAND_ROWS)]
        band_frames.append(sig.select("doc_id", F.lit(band).alias("band_id"), *cols))
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionAll(bf)
    left = bands.select(
        F.col("doc_id").alias("a"), "band_id", *[F.col(f"m{r}") for r in range(_BAND_ROWS)]
    )
    right = bands.select(
        F.col("doc_id").alias("b"),
        F.col("band_id").alias("band_id_b"),
        *[F.col(f"m{r}").alias(f"mb{r}") for r in range(_BAND_ROWS)],
    )
    cond = (F.col("band_id_b") == F.col("band_id")) & (F.col("b") > F.col("a"))
    for r in range(_BAND_ROWS):
        cond = cond & (F.col(f"mb{r}") == F.col(f"m{r}"))
    cand = left.join(right, cond).select("a", "b").distinct().withColumn("hit", F.lit(1))
    tagged = jacc.join(cand, ["a", "b"], "left").select(
        "decile", F.coalesce(F.col("hit"), F.lit(0)).alias("collided")
    )
    theory = F.expr(_THEORY_CASE)
    return (
        tagged.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("collided").cast("long").alias("n_collided"),
            F.floor(F.sum("collided") * 10_000 / F.count(F.lit(1)))
            .cast("long")
            .alias("observed_e4"),
        )
        .withColumn("theory_e4", theory.cast("long"))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_pairs",
            "n_collided",
            "observed_e4",
            "theory_e4",
        )
        .orderBy("decile")
    )
