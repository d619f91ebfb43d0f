"""Corpus-trained unigram language-model scoring — the perplexity-proxy
quality filter (the CCNet/Wenzek et al. pattern, reduced to its
scalable core): train token frequencies on the corpus itself, score
each document by mean negative log-likelihood of its tokens. Documents
full of rare/garbled tokens score high (surprising); boilerplate scores
low. Filter or stratify on the score before pretraining.

Numeric determinism: per-token costs are rounded to 9 decimals and
summed as DECIMAL(20,9) — an order-independent exact sum, so the result
is identical across partitionings, engines, and the DuckDB oracle
(double summation order would differ per shuffle; a last-ulp ln()
disagreement between libm implementations is absorbed by the 9-decimal
rounding long before the 6-decimal output rounding).

Scale: one explode pass (narrow), one |vocab|-sized count aggregate
with map-side partial combine, the corpus total as a broadcast scalar,
one shuffle join of token positions against the vocab (the vocab of a
100 TB corpus exceeds broadcast limits — Catalyst/AQE picks sort-merge
or shuffled-hash; both shuffle only (token, count)), then a per-doc
aggregate. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words


def unigram_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-document mean unigram negative log-likelihood under the
    corpus's own token distribution: mean over tokens of
    ``-ln(count(w) / total_tokens)``.

    Output: (id, *extra_cols, n_tokens, mean_nll). Every token is in
    the vocabulary by construction (trained on the same corpus), so no
    smoothing is needed; held-out scoring would add add-one smoothing
    in the same expressions.
    """
    base = df.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("_w"))
    # The vocab feeds two branches (the scalar total and the scoring
    # join build side) and so aggregates twice; measured, that beats an
    # eager checkpoint at bench scale (the extra job launch costs more
    # than the re-aggregation saves — same finding as the dup-span
    # operators). On a corpus where one vocab pass dominates, persist()
    # vocab here; nothing else changes. toks re-derives with a narrow
    # scan+split pass either way.
    vocab = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    total = vocab.agg(F.sum("_c").alias("_total"))
    cost = (
        toks.join(vocab, "_w")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(F.log(F.col("_total")) - F.log(F.col("_c")), 9)
            .cast("decimal(20,9)")
            .alias("_nll"),
        )
    )
    per_doc = cost.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum("_nll").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_nll"),
    )
    return base.join(per_doc, id_col)
