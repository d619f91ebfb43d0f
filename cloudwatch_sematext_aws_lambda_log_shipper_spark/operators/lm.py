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


def bigram_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-document mean bigram negative log-likelihood under the
    corpus's own bigram distribution with add-one (Laplace) smoothing:
    mean over adjacent token pairs of
    ``-ln((C(w1,w2) + 1) / (C(w1) + V))`` where C(w1) counts bigram
    CONTEXTS (so the conditional sums to 1 over the smoothed vocab) and
    V is the corpus's distinct-unigram count.

    A sharper quality/fluency signal than the unigram filter: a bag of
    plausible words in implausible order (shuffled text, keyword spam)
    scores high here while passing the unigram filter. Documents with
    fewer than two tokens have no bigrams and drop (same inner-join
    policy as unigram's zero-token documents).

    Numeric determinism follows the unigram recipe: per-pair costs are
    ln() of exact integer ratios rounded to 9 decimals, summed as
    DECIMAL(20,9) (order-independent), mean rounded to 6.

    Scale: bigrams come from zipping the token array with its own
    1-shifted slice — a narrow projection, never a self-join or window
    over token positions. Then one |bigram-vocab| count with map-side
    combine, one |context-vocab| count, a broadcast scalar V, and one
    equi-join of pair positions against the two count tables (no
    broadcast assumption on either vocab).
    """
    base = df.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    ws = words(F.col(text_col))
    arr = df.select(F.col(id_col), ws.alias("_ws"))
    pairs = arr.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice("_ws", F.lit(1), F.size("_ws") - 1),
                F.slice("_ws", F.lit(2), F.size("_ws") - 1),
            )
        ).alias("_bg"),
    ).select(
        F.col(id_col),
        F.col("_bg").getItem("0").alias("_w1"),
        F.col("_bg").getItem("1").alias("_w2"),
    )
    bg_counts = pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c12"))
    ctx_counts = pairs.groupBy("_w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab_size = (
        df.select(F.explode(ws).alias("_w"))
        .agg(F.count_distinct("_w").alias("_v"))
    )
    cost = (
        pairs.join(bg_counts, ["_w1", "_w2"])
        .join(ctx_counts, "_w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.col("_c1") + F.col("_v")) - F.log(F.col("_c12") + F.lit(1)),
                9,
            )
            .cast("decimal(20,9)")
            .alias("_nll"),
        )
    )
    per_doc = cost.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("_nll").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_bigram_nll"
        ),
    )
    return base.join(per_doc, id_col)


def kneser_ney_nll_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-document mean bigram NLL under interpolated Kneser-Ney
    smoothing (Kneser & Ney 1995; Chen & Goodman 1999) with the
    standard discount d = 0.75 — the PROPER smoothed LM filter:
    unlike add-one, the backoff weight goes to words that appear in
    many CONTEXTS (continuation probability), so versatile words absorb
    mass and burstiness is punished correctly.

    With d = 3/4 every probability is an exact integer ratio:
      P(w2|w1) = [(4*c12 - 3)*B + 3*R(w1)*L(w2)] / (4*c1*B)
    where c12/c1 are bigram/context counts, R = distinct right
    continuations of w1, L = distinct left contexts of w2, B = distinct
    bigram types (scoring observed bigrams, the max(c12-d, 0) never
    binds). NLL terms are ln of these integers, rounded to 9 and
    summed as DECIMAL — the engine-exact recipe shared with the other
    LM scores.

    Scale: the same narrow array-zip bigram extraction as
    bigram_nll_scores; three aggregates over the bigram vocabulary
    (counts, right-continuations, left-contexts) with map-side combine;
    B broadcasts."""
    base = df.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    ws = words(F.col(text_col))
    arr = df.select(F.col(id_col), ws.alias("_ws"))
    pairs = arr.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice("_ws", F.lit(1), F.size("_ws") - 1),
                F.slice("_ws", F.lit(2), F.size("_ws") - 1),
            )
        ).alias("_bg"),
    ).select(
        F.col(id_col),
        F.col("_bg").getItem("0").alias("_w1"),
        F.col("_bg").getItem("1").alias("_w2"),
    )
    bg = pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c12"))
    ctx = bg.groupBy("_w1").agg(
        F.sum("_c12").alias("_c1"), F.count(F.lit(1)).alias("_r")
    )
    left = bg.groupBy("_w2").agg(F.count(F.lit(1)).alias("_l"))
    btypes = bg.agg(F.count(F.lit(1)).alias("_b"))
    cost = (
        pairs.join(bg, ["_w1", "_w2"])
        .join(ctx, "_w1")
        .join(left, "_w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            F.col(id_col),
            F.round(
                F.log(F.lit(4) * F.col("_c1") * F.col("_b"))
                - F.log(
                    (F.lit(4) * F.col("_c12") - F.lit(3)) * F.col("_b")
                    + F.lit(3) * F.col("_r") * F.col("_l")
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("_nll"),
        )
    )
    per_doc = cost.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("_nll").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_kn_nll"
        ),
    )
    return base.join(per_doc, id_col)
