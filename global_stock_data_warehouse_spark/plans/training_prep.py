"""The training-prep flagship: the LAST mile from a cleaned corpus to a
packed, shuffled token stream — the step every pretraining run performs
after the `llm_gold_pipeline`-style curation is done.

    documents ──text_stats──> quality gate (score >= threshold)
        │                        │
        └── exact dedup (fingerprint window, keep-one)
                │
                ├── BPE train on the survivors (capped word vocab)
                ├── BPE encode every survivor (broadcast ranks, map-only)
                ├── deterministic shard shuffle (md5 training order)
                └── pack the per-shard token streams into ctx_len windows

Output is one row per surviving doc locating it in the final training
stream: ``(id, shard, pos, n_bpe_tokens, seq_first, seq_last, n_seqs)``.
Everything after the gate is integer/md5 arithmetic over a deterministic
merge table, so the full map is bit-reproducible across runs, engines,
partitionings, and seeds-held-fixed — re-running the job on a backfilled
corpus reproduces the identical curriculum.

Scale shape: gate + dedup share ONE scan (the same fused head as
``plans/llm_gold.py``); the survivor frame is checkpointed once and feeds
both BPE training (corpus-sized word agg, then rounds on the capped
vocab — SCALE.md r6: shuffle linear, round cost constant) and encoding
(broadcast ranks, zero shuffle). The shard assignment is a map-only md5
expression; the only remaining exchanges are the shard-keyed packing
window and the fingerprint window. No stage holds token ARRAYS on the
wire — the pack consumes only the per-doc count, so the wide token frame
never shuffles.

Reference: the reference repo has no tokenizer/packing stage (its unit
is market bars, main.py:100-150 stops at gold parquet); this plan is the
documents-table extension SURVEY §6 prescribes for LLM-pipeline parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.corpus import bpe_encode, bpe_train, pack_sequences, shard_shuffle
from ..operators.text import text_stats, tokens


def training_prep_pipeline(
    docs: DataFrame,
    ctx_len: int = 512,
    n_merges: int = 48,
    quality_min: float = 0.5,
    n_shards: int = 16,
    seed: int = 0,
    max_words: int | None = 100_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Run gate -> dedup -> BPE train+encode -> shard shuffle -> pack over
    ``docs`` (must carry ``id_col`` and ``text``). Returns one row per
    surviving doc: ``(id, shard, pos, n_bpe_tokens, seq_first, seq_last,
    n_seqs)`` — ``pos`` is the doc's deterministic position within its
    training shard and ``seq_*`` locate it in that shard's packed
    ``ctx_len``-token windows."""
    toked = docs.select(
        F.col(id_col), F.col("text"), tokens("text").alias("_toks")
    )
    # gate + dedup in ONE corpus-wide exchange: text rides through the
    # fingerprint window (text_stats passthrough) so no join back onto
    # the source is ever needed — the llm_gold join pattern costs a
    # second wide shuffle here because its downstream consumers only
    # need _toks, while BPE needs the raw text.
    st = text_stats(toked, tokens_col="_toks", passthrough=("text",))
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    # multi-consumer survivor frame: BPE train AND encode both read it —
    # checkpoint once so the gate+dedup lineage never re-runs; project to
    # (id, text) first (localCheckpoint materializes every column and
    # blocks Catalyst's pruning across it).
    kept_docs = (
        st.filter(F.col("quality") >= quality_min)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "text")
    ).localCheckpoint(eager=True)
    merges, _ = bpe_train(
        kept_docs, n_merges=n_merges, min_count=2, max_words=max_words
    )
    enc = bpe_encode(kept_docs, merges, id_col=id_col).select(
        id_col, F.col("n_tokens").alias("n_bpe_tokens")
    )
    order = shard_shuffle(kept_docs, n_shards=n_shards, seed=seed, id_col=id_col)
    packed = pack_sequences(
        enc.join(order, id_col),
        ctx_len=ctx_len,
        shard_col="shard",
        id_col=id_col,
        n_tokens_col="n_bpe_tokens",
        order_col="pos",
    )
    return packed.select(
        id_col,
        "shard",
        "pos",
        F.col("n_tokens").alias("n_bpe_tokens"),
        "seq_first",
        "seq_last",
        "n_seqs",
    )
