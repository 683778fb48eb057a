"""Corpus-curation analytics: line-level boilerplate frequency stats,
per-source quality percentile gating, dedup-novelty timeline, Zipf
rank-frequency slope.

These are the C4 / RefinedWeb / Gopher curation passes that sit between
raw ingest and training-data packing: measure how much of each document
is corpus-frequent boilerplate (C4's "three-sentence rule" generalized),
gate each source to its own quality percentile (per-source gating keeps
one noisy source from eating the whole keep-budget), track how fast the
dedup novelty rate decays as ingestion proceeds (the signal that a crawl
has saturated), and fit the Zipf slope of the term distribution (a
healthy natural-language corpus sits near -1; scraped spam does not).

Scale design:

- boilerplate: one posexplode, one hash exchange on the segment
  fingerprint (groupBy + join reuse the same clustering), one doc_id
  rollup — the text itself never keys a shuffle, only its md5.
- percentile gate: rank windows partitioned BY SOURCE — no global sort;
  per-source partitions are the natural unit and AQE splits a skewed
  source.
- novelty timeline: bucket ids by value range against a broadcast 1-row
  min/max frame (NO global ntile sort); first-occurrence via the same
  md5-window pattern as `dedup.paragraph_dedup`; the cumulative pass
  runs over n_buckets rows — bounded by contract.
- zipf: term counts (one exchange) -> TakeOrderedAndProject top-k ->
  all remaining math on <= top_n rows. Double sums over <= top_n terms
  drift ~1e-13 relative between engines while the 6dp rounding boundary
  sits 5e-7 away — the same margin argument `stats_moments`' rounded
  corr() rides in the driver hash window.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOPWORDS = ("the", "a", "and", "of", "to")


def _fx(col, scale: float = 1e6):
    """floor(x*scale + 0.5)/scale — engine-shared half-up rounding."""
    return F.floor(col * scale + F.lit(0.5)) / scale


def line_boilerplate_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 3,
) -> DataFrame:
    """Per-document boilerplate exposure: split each doc into segments
    on ``sep``, call a segment boilerplate when it occurs in >=
    ``min_docs`` DISTINCT documents, and report each doc's segment
    count, boilerplate-segment count, and boilerplate character ratio
    — the RefinedWeb line-frequency filter as a measurement pass (the
    removal itself is `dedup.paragraph_dedup`'s job; this query is the
    audit that sizes it).

    All counts are integers and the single ratio is one division of two
    exact bigints: hash-safe.
    """
    segs = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), _re.escape(sep))
            ).alias("_s"),
        )
        .select(F.col(id_col), F.trim(F.col("_s")).alias("_seg"))
        .filter(F.col("_seg") != "")
        .withColumn("_k", F.md5(F.col("_seg")))
    )
    freq = segs.groupBy("_k").agg(
        F.countDistinct(id_col).alias("_nd")
    )
    joined = segs.join(freq, "_k")
    is_boiler = (F.col("_nd") >= min_docs).cast("int")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(is_boiler).alias("n_boiler"),
        F.sum(F.length("_seg")).alias("total_chars"),
        F.sum(F.length("_seg") * is_boiler).alias("boiler_chars"),
        _fx(
            F.sum(F.length("_seg") * is_boiler) / F.sum(F.length("_seg"))
        ).alias("boiler_ratio"),
    )


def quality_percentile_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    keep_frac: float = 0.6,
) -> DataFrame:
    """Per-source quality gating: score every doc (chars + 10x stopword
    hits — the cheap fluency proxy), rank within its source, keep the
    top ``keep_frac`` by count (ceil, so a 1-doc source keeps its doc),
    and report per-source keep statistics.

    Rank-and-count gating (row_number <= ceil(frac * n)) is all-integer
    — no percentile float anywhere — and the (score desc, id) tiebreak
    makes the kept set deterministic on both engines. The mean kept
    score is an exact bigint sum / count.
    """
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    hits = F.size(
        F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    )
    scored = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        (
            F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("bigint")
            + 10 * hits.cast("bigint")
        ).alias("score"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    ranked = scored.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    kept = F.col("_rn") <= F.ceil(F.lit(keep_frac) * F.col("_n"))
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("int")).alias("n_kept"),
        F.min(F.when(kept, F.col("score"))).alias("min_kept_score"),
        _fx(
            F.sum(F.when(kept, F.col("score"))) / F.sum(kept.cast("int"))
        ).alias("mean_kept_score"),
    )


def novelty_timeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Dedup-novelty decay: bucket documents into ``n_buckets`` equal
    id-ranges (arrival order proxy), mark each doc novel iff it is the
    FIRST occurrence of its exact text (md5, earliest id wins), and
    report per-bucket novelty: n_docs, n_new, dup_rate, and the
    cumulative distinct count — the curve that tells a crawl operator
    when additional ingestion stops buying new data.

    The bucket edge comes from a broadcast 1-row (min, max) frame — no
    global sort; the cumulative window runs over n_buckets rows,
    bounded by contract. Counts are exact integers; dup_rate is one
    bigint/bigint division.
    """
    docs = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    bounds = docs.agg(
        F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi")
    )
    # integer DIV keeps the bucket edge exact on both engines (a float
    # division would truncate an IEEE quotient — boundary ids could flip)
    bucket = F.least(
        F.lit(n_buckets).cast("bigint"),
        F.expr(
            f"(({id_col} - _lo) * {n_buckets}) DIV (_hi - _lo + 1)"
        )
        + 1,
    )
    w = Window.partitionBy("_h").orderBy(id_col)
    marked = (
        docs.crossJoin(F.broadcast(bounds))
        .withColumn("_b", bucket)
        .withColumn("_rn", F.row_number().over(w))
    )
    per_bucket = marked.groupBy(F.col("_b").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_rn") == 1).cast("int")).alias("n_new"),
    )
    cum_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.withColumn(
            "dup_rate",
            _fx((F.col("n_docs") - F.col("n_new")) / F.col("n_docs")),
        )
        .withColumn("cum_distinct", F.sum("n_new").over(cum_w))
        .select("bucket", "n_docs", "n_new", "dup_rate", "cum_distinct")
    )


def zipf_slope(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """OLS slope of ln(frequency) on ln(rank) over the top ``top_n``
    terms — the Zipf diagnostic (natural language ~ -1; template spam
    and OCR noise flatten or cliff it). Returns one row: n_terms,
    slope, intercept (both 6dp).

    Term counts take one exchange; the top-k is a
    TakeOrderedAndProject with a (count desc, term) tiebreak so the
    ranked set is identical on both engines; all regression sums run
    over <= top_n rows. See the module docstring for the float-margin
    argument that keeps the 6dp rounding hash-stable.
    """
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    counts = (
        df.select(F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term"))
        .limit(top_n)
    )
    ranked = counts.withColumn(
        "_r",
        F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("term"))),
    )
    xy = ranked.select(
        F.log(F.col("_r").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # degenerate guard: with 0 or 1 distinct terms the OLS denominator is
    # 0 and 0/0 is NaN — which Spark's floor (returns BIGINT) and
    # DuckDB's floor (returns DOUBLE) then disagree on. NULL both sides.
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / den,
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        _fx(slope).alias("slope"),
        _fx(intercept).alias("intercept"),
    )


def lexical_diversity(
    df: DataFrame,
    low_ttr: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source type-token-ratio report: mean TTR (distinct tokens /
    tokens per doc), the share of low-diversity docs (TTR <
    ``low_ttr`` — template/boilerplate-shaped text repeats itself), and
    the doc count. TTR is the lexical-diversity screen Gopher's
    repetition rules approximate (Rae et al. 2021 §A1.1); per-source
    means tell you WHICH feed is template spam.

    Exactness: per-doc TTR is ONE bigint floor-division
    ``(n_distinct * 1e6) div n_tokens`` (exact on both engines); the
    per-source mean sums those integers and divides once. Zero-token
    docs are excluded (no tokens, no diversity to measure). Map-only
    token math + one source-keyed agg with map-side combine: a single
    group-bounded exchange.
    """
    from .text import tokens

    toks = tokens(text_col)
    per_doc = (
        df.withColumn("_n_tok", F.size(toks))
        .withColumn("_n_dist", F.size(F.array_distinct(toks)))
        .filter(F.col("_n_tok") > 0)
        .withColumn(
            "_ttr_fx",
            F.expr("_n_dist * cast(1000000 as bigint) div _n_tok"),
        )
    )
    # floor(x*scale+0.5): bare int() truncates (int(0.29*1e6)=289999),
    # shifting the threshold one fixed-point unit for many non-default
    # values (r10 ADVICE; the trading_calendar_coverage fix's twin).
    low_fx = int(low_ttr * 1e6 + 0.5)
    return per_doc.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        _fx(F.sum("_ttr_fx") / F.count(F.lit(1)) / 1e6).alias("mean_ttr"),
        _fx(
            F.sum((F.col("_ttr_fx") < low_fx).cast("int")) / F.count(F.lit(1))
        ).alias("low_diversity_share"),
    )
