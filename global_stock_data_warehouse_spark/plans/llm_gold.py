"""The LLM training-data flagship: gate -> dedup -> decontaminate ->
leakage-safe split, as ONE composed distributed plan.

The documents-table counterpart of ``plans/wmy.py`` (the reference's
analytics flagship, downloader_wmy.py:130-179 re-expressed for market
bars): five already-individually-oracled operators chained the way a
production pretraining-data job chains them —

    documents ──text_stats──> quality gate (score >= threshold)
        │                        │
        └── exact dedup (fingerprint window, keep-one)
                │
                ├── hold out the eval split (caller predicate)
                ├── n-gram decontaminate survivors vs eval (Dolma rule)
                ├── near-dup pairs (bigram Jaccard) -> components
                └── leakage-safe md5 split on the component min-id

Scale shape: the gate and dedup share one scan (text_stats is pure
codegen; the fingerprint window is the first exchange). The eval gram
set and the component frame broadcast (both << corpus under realistic
contamination/dup rates). Multi-consumer frames (``clean``, the kept
train set) are materialized ONCE with an eager localCheckpoint — the
alternative re-runs the tokenize+score+gram lineage per consumer (3x
measured on the sf0.1 shape). The only wide exchanges are the
fingerprint window, the decontamination per-doc count, the near-dup
inverted index, and the component rounds — each individually measured
in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.corpus import decontaminate, leakage_safe_split
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.text import text_stats, tokens


def llm_gold_pipeline(
    docs: DataFrame,
    eval_pred: Column,
    quality_min: float = 0.5,
    decontaminate_n: int = 5,
    neardup_threshold: float = 0.2,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the full gold pipeline over ``docs`` (must carry ``id_col``
    and ``text``). ``eval_pred`` is a boolean Column marking the held-out
    eval/benchmark docs (e.g. ``F.col("doc_id") % 20 == 0``); they are
    excluded from the output and their RAW text (ungated — a benchmark
    is a benchmark even if low-quality) defines the contamination gram
    set. Returns one row per surviving train doc:
    (id, n_tokens, lang_pred, quality, group_key, split)."""
    # Tokenize the corpus ONCE (r6): text_stats, decontaminate, and the
    # near-dup shingles each previously re-split the full text — three
    # identical regexp-tokenize passes over the corpus. The token arrays
    # are materialized alongside the text in one checkpoint and every
    # consumer reuses them (tokens_col hooks). At cluster scale this
    # checkpoint would be a parquet stage dir; the trade is ~2x bytes
    # held once vs 3x tokenize CPU re-run per consumer.
    from ..operators.skew import fan_scan

    # fan BEFORE the tokenize+checkpoint (r12): the regex-tokenize pass
    # parallelizes and the checkpointed frame keeps >= core-count
    # partitions, so text_stats, the gram joins, and the near-dup
    # shingle build all inherit the parallelism instead of running in
    # however few tasks the scan yields (structural no-op at scale —
    # see fan_scan)
    toked = fan_scan(docs.select(id_col, "text")).select(
        F.col(id_col), F.col("text"), tokens("text").alias("_toks")
    ).localCheckpoint(eager=True)
    st = text_stats(toked, tokens_col="_toks")
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    clean = (
        st.filter(F.col("quality") >= quality_min)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "n_tokens", "lang_pred", "quality")
    ).localCheckpoint(eager=True)
    eval_docs = docs.filter(eval_pred)
    # anti-join instead of filter(~eval_pred): eval_pred may reference
    # docs columns the narrow toked frame dropped; the eval id set is
    # tiny, so AQE broadcasts the anti side. NULL semantics match the
    # original filter(~eval_pred): a row whose predicate evaluates to
    # NULL is excluded from train (filter drops non-TRUE rows), so the
    # anti side is TRUE-or-NULL ids — only explicitly-FALSE rows train.
    # The contamination gram set stays the explicitly-TRUE docs only.
    non_train_ids = docs.filter(eval_pred.isNull() | eval_pred).select(id_col)
    train_docs = toked.join(clean.select(id_col), id_col).join(
        non_train_ids, id_col, "left_anti"
    )
    kept_ids = (
        decontaminate(
            train_docs,
            eval_docs,
            n=decontaminate_n,
            id_col=id_col,
            train_tokens_col="_toks",
        )
        .filter(~F.col("contaminated"))
        .select(id_col)
    )
    kept_docs = train_docs.join(kept_ids, id_col).localCheckpoint(eager=True)
    pairs = ngram_jaccard_pairs(
        kept_docs, threshold=neardup_threshold, tokens_col="_toks"
    )
    split = leakage_safe_split(kept_docs, pairs, weights=weights, id_col=id_col)
    return clean.join(split, id_col).select(
        id_col, "n_tokens", "lang_pred", "quality", "group_key", "split"
    )
