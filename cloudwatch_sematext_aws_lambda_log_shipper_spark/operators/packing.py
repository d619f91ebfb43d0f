"""Sequence packing for LLM pretraining: assign documents to fixed
token-budget bins using concat-then-chunk semantics — the way training
corpora are actually packed (documents are concatenated in a
deterministic order and the token stream is cut every ``budget``
tokens; a document belongs to the bin where it STARTS).

This formulation is a pure window computation (no greedy driver loop,
no UDF): running token offset per group, bin = floor(offset / budget).
It is deterministic for any (group, order) choice and replicable in
ANSI SQL, so the oracle can check it bit-for-bit.

Scale: one shuffle on the group column + an in-partition sort — the
minimal cost of any order-dependent packing. Groups are the packing
unit (a real pipeline packs per source shard, not globally): pick a
group granularity that bounds per-partition rows, e.g. (source,
doc_id range) composite, and the window never sees more than one
shard. Global packing of 100 TB in ONE ordered stream would serialize
on a single partition — that is a property of the problem statement,
not the engine; shard first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import whitespace_token_count


def with_packing_bins(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    tokens: Column | None = None,
) -> DataFrame:
    """Attach ``n_tokens``, ``bin_offset`` (token offset where this doc
    starts within its group's concatenated stream) and ``bin_id``
    (= floor(bin_offset / budget)).

    ``tokens`` overrides the token-count expression (default whitespace
    tokens) — pass ``subword_token_count(F.col("text"))`` for the
    BPE-ish estimate.
    """
    n_tokens = tokens if tokens is not None else whitespace_token_count(
        F.col(text_col)
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("n_tokens", n_tokens).withColumn(
        "bin_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return out.withColumn(
        "bin_id", F.floor(F.col("bin_offset") / F.lit(int(budget)))
    )


def packing_stats(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group packing summary: bins produced, docs-per-start-bin
    extremes, and fill efficiency.

    ``n_bins`` is the number of budget-sized chunks the concatenated
    stream actually occupies — ``ceil(total_tokens / budget)`` — NOT
    the count of distinct bins where some document starts: a document
    longer than the budget overruns into bins no document starts in,
    and those chunks exist in the packed output all the same.
    ``fill_efficiency`` = total_tokens / (n_bins * budget) is therefore
    always <= 1 (only the last chunk can be partial).
    ``max_docs_per_bin`` counts document STARTS per bin (the boundary-
    crossing fragment of a previous doc is not a membership)."""
    binned = with_packing_bins(df, budget, group_col, order_col, text_col)
    per_bin = binned.groupBy(group_col, "bin_id").agg(
        F.count(F.lit(1)).alias("_docs"),
        F.sum("n_tokens").alias("_tokens"),
    )
    n_bins = F.ceil(
        F.sum("_tokens").cast("double") / F.lit(int(budget))
    ).cast("long")
    return per_bin.groupBy(group_col).agg(
        n_bins.alias("n_bins"),
        F.sum("_docs").alias("n_docs"),
        F.sum("_tokens").alias("total_tokens"),
        F.max("_docs").alias("max_docs_per_bin"),
        F.round(
            F.sum("_tokens").cast("double")
            / (n_bins * F.lit(int(budget))).cast("double"),
            6,
        ).alias("fill_efficiency"),
    )
