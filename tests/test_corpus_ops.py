"""Corpus mixing / scrubbing / packing operators: PII redaction,
deterministic weighted sampling, sequence packing, repetition stats."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.packing import (
    packing_stats,
    with_packing_bins,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sampling import (
    with_weighted_sample,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
    pii_counts,
    redact_pii,
    top_word_ratio,
)


def test_redact_pii_classes_and_idempotence(spark):
    df = spark.createDataFrame(
        [
            Row(t="mail me at jane.doe+x@sub.example.org today"),
            Row(t="server 192.168.0.1 then call +44-207-9460-718"),
            Row(t="no pii here at all"),
            Row(t="two mails a@b.io and c@d.co plus 10.0.0.7"),
        ]
    )
    out = df.select(
        F.col("t"),
        redact_pii(F.col("t")).alias("red"),
        *[c.alias(f"n_{k}") for k, c in pii_counts(F.col("t")).items()],
    ).collect()
    by_t = {r.t: r for r in out}
    assert by_t["mail me at jane.doe+x@sub.example.org today"].red == (
        "mail me at <email> today"
    )
    r2 = by_t["server 192.168.0.1 then call +44-207-9460-718"]
    assert "<ipv4>" in r2.red and "<phone>" in r2.red
    assert r2.n_ipv4 == 1 and r2.n_phone == 1 and r2.n_email == 0
    assert by_t["no pii here at all"].red == "no pii here at all"
    r4 = by_t["two mails a@b.io and c@d.co plus 10.0.0.7"]
    assert r4.n_email == 2 and r4.n_ipv4 == 1
    # idempotence/leak-freedom: redacting redacted text changes nothing
    again = df.select(
        redact_pii(redact_pii(F.col("t"))).alias("twice"),
        redact_pii(F.col("t")).alias("once"),
    ).collect()
    assert all(r.twice == r.once for r in again)


def test_weighted_sample_deterministic_and_rate_shaped(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    # rate 0: nothing; rate 1: everything
    assert (
        with_weighted_sample(df, F.lit(0.0)).filter("sampled").count() == 0
    )
    assert (
        with_weighted_sample(df, F.lit(1.0)).filter("sampled").count()
        == 20000
    )
    kept = with_weighted_sample(df, F.lit(0.25), salt="s1").filter("sampled")
    n = kept.count()
    assert abs(n - 5000) < 300  # ~1/2^16 bucket resolution + binomial-ish
    # deterministic: identical draw both times
    again = with_weighted_sample(df, F.lit(0.25), salt="s1").filter("sampled")
    assert kept.select("doc_id").subtract(again.select("doc_id")).count() == 0
    # independent across salts
    other = with_weighted_sample(df, F.lit(0.25), salt="s2").filter("sampled")
    inter = kept.select("doc_id").intersect(other.select("doc_id")).count()
    assert 0 < inter < n  # overlaps like an independent draw, not equal


def test_packing_bins_concat_then_chunk_semantics(spark):
    # source x: docs of 300, 300, 300 tokens, budget 500:
    #   offsets 0, 300, 600 -> bins 0, 0, 1
    rows = [
        Row(source="x", doc_id=i, text=" ".join(["w"] * 300)) for i in range(3)
    ] + [
        # source y: one huge doc (1200 tokens) then a small one ->
        # offsets 0, 1200 -> bins 0, 2 (bin 1 is skipped: the big doc
        # overran it — concat-then-chunk, no bin-capacity search)
        Row(source="y", doc_id=0, text=" ".join(["v"] * 1200)),
        Row(source="y", doc_id=1, text="tiny doc"),
    ]
    df = spark.createDataFrame(rows)
    binned = with_packing_bins(df, budget=500)
    got = {
        (r.source, r.doc_id): (r.bin_offset, r.bin_id)
        for r in binned.collect()
    }
    assert got[("x", 0)] == (0, 0)
    assert got[("x", 1)] == (300, 0)
    assert got[("x", 2)] == (600, 1)
    assert got[("y", 0)] == (0, 0)
    assert got[("y", 1)] == (1200, 2)

    stats = {r.source: r for r in packing_stats(df, budget=500).collect()}
    assert stats["x"].n_bins == 2 and stats["x"].max_docs_per_bin == 2
    assert stats["x"].total_tokens == 900
    assert stats["x"].fill_efficiency == pytest.approx(900 / 1000, abs=1e-6)
    # the 1200-token doc occupies bins 0-2 even though nothing STARTS in
    # bin 1: n_bins counts stream chunks (ceil(1202/500) = 3), so fill
    # efficiency stays <= 1
    assert stats["y"].n_bins == 3 and stats["y"].n_docs == 2
    assert stats["y"].max_docs_per_bin == 1
    assert stats["y"].fill_efficiency == pytest.approx(1202 / 1500, abs=1e-6)


def test_top_word_ratio_matches_bruteforce(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, t="a a a a"),                  # 1.0
            Row(doc_id=1, t="a b c d"),                  # 0.25
            Row(doc_id=2, t="spam spam eggs spam ham"),  # 3/5
            Row(doc_id=3, t="  Mixed  case MIXED miXed "),  # lowercased: 3/4? no: mixed x3 + case -> 0.75
            Row(doc_id=4, t=""),                          # empty -> null/size quirk
        ]
    )
    got = {r.doc_id: r.ratio for r in df.select(
        "doc_id", top_word_ratio(F.col("t")).alias("ratio")
    ).collect()}
    assert got[0] == 1.0
    assert got[1] == 0.25
    assert got[2] == pytest.approx(0.6)
    assert got[3] == 0.75
    # empty text: split('', '\s+') yields [''] — the empty-token filter
    # must yield NULL, not "one word repeated" (ratio 1.0)
    assert got[4] is None


# --- duplicated n-gram spans --------------------------------------------


def _span_docs(spark):
    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 words
    return spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text=boiler + " unique tail one alpha"),
            Row(doc_id=2, source="b", text=boiler + " other ending two beta"),
            Row(doc_id=3, source="c", text="entirely different words with no "
                                           "shared span of any kind here"),
            Row(doc_id=4, source="c", text="short doc"),
            Row(doc_id=5, source="d", text=boiler + " " + boiler),
        ]
    )


def test_dup_span_counts_cross_doc_and_within_doc(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_ngram_stats,
    )

    out = {
        r.doc_id: r
        for r in duplicated_ngram_stats(_span_docs(spark), n=10).collect()
    }
    # doc 1/2: 14 words -> 5 gram positions; only position 1 (the boiler
    # 10-gram) also occurs elsewhere (docs 2 and 5).
    assert out[1].n_grams == 5 and out[1].n_dup_grams == 1
    assert out[2].n_grams == 5 and out[2].n_dup_grams == 1
    assert out[1].dup_ratio == 0.2
    # doc 3: 11 words -> 2 positions, none shared
    assert out[3].n_grams == 2 and out[3].n_dup_grams == 0
    # doc 4: shorter than n -> zero grams, null ratio
    assert out[4].n_grams == 0 and out[4].n_dup_grams == 0
    assert out[4].dup_ratio is None
    # doc 5 is boiler twice (20 words -> 11 positions): position 1 and
    # position 11 are the boiler gram (corpus count 4 with docs 1/2);
    # the 9 straddling grams are unique.
    assert out[5].n_grams == 11 and out[5].n_dup_grams == 2


def test_dup_span_min_count_raises_threshold(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_ngram_stats,
    )

    # boiler occurs 4 times corpus-wide; min_count=5 finds nothing
    out = duplicated_ngram_stats(_span_docs(spark), n=10, min_count=5)
    assert out.agg(F.sum("n_dup_grams")).collect()[0][0] == 0


def test_dup_span_plan_has_no_cartesian(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_ngram_stats,
    )

    plan = duplicated_ngram_stats(_span_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- int8 embedding quantization ----------------------------------------


def test_quantize_roundtrip_bounds_and_zero_vector(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        dequantize,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.5, -1.0, 0.25, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),
            Row(vec_id=3, embedding=[3.0]),
        ]
    )
    out = quantize_embeddings(df).withColumn(
        "dq", dequantize(F.col("q_code"), F.col("q_scale"))
    ).collect()
    by_id = {r.vec_id: r for r in out}
    # codes are genuine int8 (max|v| maps to +/-127)
    assert by_id[1].q_code == [64, -127, 32, 0]
    assert by_id[1].q_scale == 1.0
    # reconstruction error bounded by scale/254 per element
    for orig, dq in zip([0.5, -1.0, 0.25, 0.0], by_id[1].dq):
        assert abs(orig - dq) <= 1.0 / 254 + 1e-12
    # zero vector: no div-by-zero, zero code, zero reconstruction
    assert by_id[2].q_scale == 0.0
    assert by_id[2].q_code == [0, 0, 0, 0] and by_id[2].dq == [0.0] * 4
    assert by_id[3].q_code == [127] and by_id[3].dq == [3.0]


def test_quantized_topk_tracks_exact_neighbors(spark):
    import random

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
    )

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.gauss(0, 1) for _ in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    corpus, queries = df.filter("vec_id >= 5"), df.filter("vec_id < 5")
    qt = quantized_topk(corpus, queries, k=3).collect()
    assert len(qt) == 15
    # int8 cosine error is small: every emitted gap under 1%
    assert all(r.quant_err < 0.01 for r in qt)
    # and the quantized ranking recovers most exact neighbors
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(corpus, queries, k=3).collect()}
    got = {(r.query_id, r.neighbor_id) for r in qt}
    assert len(got & exact) >= 12


# --- unigram LM scoring -------------------------------------------------


def test_unigram_nll_orders_rare_above_common(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.lm import (
        unigram_nll_scores,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="the the the the the"),
            Row(doc_id=2, source="a", text="the the the zyx the"),
            Row(doc_id=3, source="b", text="qqq www eee rrr ttt"),
        ]
    )
    out = {r.doc_id: r for r in unigram_nll_scores(df).collect()}
    assert out[1].n_tokens == 5
    # all-common doc is least surprising; all-singleton doc is most
    assert out[1].mean_nll < out[2].mean_nll < out[3].mean_nll
    # exact value for doc 1: 9 'the' in 15 tokens -> -ln(9/15) each
    import math

    expect = round(round(math.log(15) - math.log(9), 9), 6)
    assert abs(out[1].mean_nll - expect) < 1e-9


def test_unigram_nll_partition_invariant(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.lm import (
        unigram_nll_scores,
    )

    rows = [
        Row(doc_id=i, source="s", text=" ".join(f"w{(i * 7 + j) % 13}" for j in range(20)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    a = {r.doc_id: r.mean_nll for r in unigram_nll_scores(df.repartition(1)).collect()}
    b = {r.doc_id: r.mean_nll
         for r in unigram_nll_scores(df.repartition(16, "doc_id")).collect()}
    # DECIMAL summation makes the score bit-identical across layouts
    assert a == b


def test_bigram_nll_penalizes_word_order_not_just_vocab(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.lm import (
        bigram_nll_scores,
        unigram_nll_scores,
    )

    # docs 1-8 share the SAME unigram bag; doc 9 scrambles the order.
    natural = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    rows = [Row(doc_id=i, source="a", text=natural) for i in range(1, 9)]
    rows.append(Row(doc_id=9, source="a", text=scrambled))
    df = spark.createDataFrame(rows)
    uni = {r.doc_id: r.mean_nll for r in unigram_nll_scores(df).collect()}
    bi = {r.doc_id: r.mean_bigram_nll for r in bigram_nll_scores(df).collect()}
    # unigram filter is blind to the scramble
    assert abs(uni[9] - uni[1]) < 1e-9
    # bigram filter is not: the scrambled doc's pairs are all rare
    assert bi[9] > bi[1]


def test_bigram_nll_short_doc_drops_and_layout_invariant(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.lm import (
        bigram_nll_scores,
    )

    rows = [
        Row(doc_id=i, source="s",
            text=" ".join(f"w{(i * 7 + j) % 13}" for j in range(20)))
        for i in range(40)
    ]
    rows.append(Row(doc_id=99, source="s", text="solo"))
    df = spark.createDataFrame(rows)
    a = {r.doc_id: r.mean_bigram_nll
         for r in bigram_nll_scores(df.repartition(1)).collect()}
    b = {r.doc_id: r.mean_bigram_nll
         for r in bigram_nll_scores(df.repartition(16, "doc_id")).collect()}
    assert 99 not in a  # one-token doc has no bigrams
    assert a == b  # DECIMAL sums: bit-identical across layouts
    n = {r.doc_id: r.n_bigrams for r in bigram_nll_scores(df).collect()}
    assert n[1] == 19


def test_temperature_mixture_rebalances_head_and_tail(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    rows = [Row(doc_id=i, source="big", text="t") for i in range(900)]
    rows += [Row(doc_id=1000 + i, source="small", text="t") for i in range(100)]
    df = spark.createDataFrame(rows)
    out = temperature_mixture_sample(df, alpha=0.5, target_frac=0.2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.doc_id)
    n_big, n_small = len(by_src["big"]), len(by_src["small"])
    # corpus is 90/10; sqrt temperature pulls the sample toward 75/25
    assert n_small / (n_big + n_small) > 0.15
    # quotas respected and sample hits the target within ceil slack
    assert abs((n_big + n_small) - 200) <= 2
    # alpha=1 degenerates to proportional allocation
    prop = temperature_mixture_sample(df, alpha=1.0, target_frac=0.2).collect()
    n_small_prop = sum(1 for r in prop if r.source == "small")
    assert n_small_prop < n_small
    # deterministic across layouts; salt re-rolls membership
    a = {r.doc_id for r in
         temperature_mixture_sample(df.repartition(13), alpha=0.5,
                                    target_frac=0.2).collect()}
    assert a == {r.doc_id for r in out}
    b = {r.doc_id for r in
         temperature_mixture_sample(df, alpha=0.5, target_frac=0.2,
                                    salt="v2").collect()}
    assert b != a and len(b) == len(a)


def test_readability_orders_simple_above_dense(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import llmops  # noqa: F401
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import QUERIES

    import tempfile, os
    rows = [
        Row(doc_id=1, source="a", lang="en", n_chars=30,
            text="The cat sat. The dog ran. We go."),
        Row(doc_id=2, source="a", lang="en", n_chars=80,
            text="Incomprehensibility characterizes multisyllabic terminological proliferation"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r for r in QUERIES["doc_readability"](spark, d).collect()}
    assert out[1].n_sentences == 3
    assert out[1].flesch > out[2].flesch  # short sentences read easier


# --- benchmark decontamination ------------------------------------------


def test_benchmark_overlap_flags(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        benchmark_overlap_flags,
    )

    leak = "what is the capital of france the answer is paris"  # 10 words
    bench = spark.createDataFrame([Row(doc_id=900, source="eval", text=leak)])
    corpus = spark.createDataFrame(
        [
            # contains the benchmark text verbatim -> 3 distinct shared
            # 8-grams (positions 1..3 of the 10-word span)
            Row(doc_id=1, source="web", text="intro words " + leak + " trailing"),
            Row(doc_id=2, source="web", text="a clean document about spark "
                                             "joins windows and aggregation "
                                             "strategies at scale"),
            Row(doc_id=3, source="web", text="too short to shingle"),
            # repeats one leaked 8-gram twice -> still ONE distinct overlap
            Row(doc_id=4, source="web",
                text="what is the capital of france the answer "
                     "what is the capital of france the answer"),
        ]
    )
    out = {r.doc_id: r for r in
           benchmark_overlap_flags(corpus, bench, n=8).collect()}
    assert out[1].contaminated and out[1].n_overlap_grams == 3
    assert not out[2].contaminated and out[2].n_overlap_grams == 0
    assert not out[3].contaminated  # shorter than n: can never overlap
    assert out[4].contaminated and out[4].n_overlap_grams == 1
    assert len(out) == 4  # benchmark docs are not in the output


def test_benchmark_overlap_uses_broadcast_join(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        benchmark_overlap_flags,
    )

    bench = spark.createDataFrame([Row(doc_id=0, source="e", text="a b c d e f g h")])
    corpus = spark.createDataFrame([Row(doc_id=1, source="w", text="a b c d e f g h i")])
    plan = benchmark_overlap_flags(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    # the gram semi-join must be broadcast (the corpus side never
    # shuffles its gram positions to meet the benchmark set)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_remove_duplicated_spans_cuts_exactly_the_covered_words(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    out = {
        r.doc_id: r
        for r in remove_duplicated_spans(_span_docs(spark), n=10).collect()
    }
    # docs 1/2 share the 10-word boiler prefix: exactly those 10 words
    # go, the unique 4-word tails survive
    assert out[1].clean_text == "unique tail one alpha"
    assert out[1].n_words == 14 and out[1].n_removed == 10
    assert out[2].clean_text == "other ending two beta"
    # doc 3 shares nothing: untouched (normalized token stream)
    assert out[3].n_removed == 0
    assert out[3].clean_text == ("entirely different words with no shared "
                                 "span of any kind here")
    # doc 4 is shorter than n: can never be covered
    assert out[4].clean_text == "short doc" and out[4].n_removed == 0
    # doc 5 = boiler twice: both occurrences covered -> fully removed
    assert out[5].clean_text == "" and out[5].n_removed == 20


# --- exact character-level duplicated spans ------------------------------


def test_char_spans_find_what_word_grams_miss(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_char_spans,
        duplicated_ngram_stats,
    )

    # a 6-word, 44-char phrase duplicated across two docs: invisible to
    # word 10-grams (needs 10 consecutive shared words), found exactly
    # by 30-char windows — including across a word-boundary SHIFT (doc
    # b's prefix ends without a space so the shared text starts mid-
    # token from a word-gram perspective)
    shared = "the quick brown fox jumps over lazy dogs tod"  # 44 chars
    docs = spark.createDataFrame(
        [
            (1, "unique lead-in text one " + shared + " unique tail one"),
            (2, "completely different opening" + shared + " and another end"),
            (3, "no duplication in this document at all whatsoever here"),
        ],
        "doc_id long, text string",
    )
    words_stats = {
        r.doc_id: r.n_dup_grams
        for r in duplicated_ngram_stats(
            docs, n=10, extra_cols=()
        ).collect()
    }
    assert words_stats == {1: 0, 2: 0, 3: 0}  # word grams: blind

    spans = duplicated_char_spans(docs, min_len=30).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.span_len)
        )
    assert set(by_doc) == {1, 2}
    # the maximal span is the shared phrase PLUS the trailing space both
    # docs also share — exactly the suffix-array answer, one char longer
    # than the "intended" plant (1-based, end exclusive)
    truly_shared = shared + " "
    (s1,) = by_doc[1]
    text1 = "unique lead-in text one " + shared + " unique tail one"
    assert text1[s1[0] - 1 : s1[1] - 1] == truly_shared
    (s2,) = by_doc[2]
    text2 = "completely different opening" + shared + " and another end"
    assert text2[s2[0] - 1 : s2[1] - 1] == truly_shared
    assert s1[2] == s2[2] == len(truly_shared)


def test_char_spans_merge_overlapping_regions(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_char_spans,
    )

    # two duplicated regions whose [p, p+L) tilings touch must merge
    # into ONE maximal span; a far-apart third region stays separate
    a = "A" * 40
    b = "B" * 40
    # repeat-free gap > L ("x"*100 would itself be duplicated — every
    # 30-window of a uniform run is identical, and within-doc
    # multiplicity counts)
    gap = " ".join(f"g{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, a + b + gap + "Q" * 35),
            (2, "zzz " + a + b + " yyy"),
            (3, "Q" * 35 + " unrelated suffix padding here"),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in duplicated_char_spans(docs, min_len=30).collect()
    )
    doc1 = [s for s in spans if s[0] == 1]
    assert len(doc1) == 2  # merged A+B block, separate Q block
    assert doc1[0][1] == 1 and doc1[0][2] == 80  # a+b merged maximal
    # within-doc repeats count toward min_count too: "Q"*35 in docs 1&3
    assert any(s[0] == 3 for s in spans)


# --- BM25 ranked retrieval ----------------------------------------------


def test_bm25_semantics(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        bm25_scores,
    )

    filler = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "rare common " + filler),             # both terms, short
            (2, "rare common " + filler + " " + filler),  # same, longer doc
            (3, "common " + filler),                  # common term only
            (4, "rare rare rare " + filler),          # tf saturation probe
            (5, filler),                              # no query terms
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score
           for r in bm25_scores(docs, ["rare", "common"]).collect()}
    assert 5 not in got                   # no matching term -> no row
    assert got[1] > got[2]                # length normalization
    assert got[1] > got[3]                # idf: rare term outweighs common
    assert got[4] > got[3]                # repeated rare term scores high
    # tf saturation: 3x the tf must be well under 3x the score
    one_rare = {r.doc_id: r.score
                for r in bm25_scores(docs, ["rare"]).collect()}
    assert one_rare[4] < 3 * one_rare[1]


def test_char_span_removal_preserves_unique_bytes(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        remove_duplicated_char_spans,
    )

    shared = "the quick brown fox jumps over lazy dogs tod"  # 44 chars
    t1 = "unique lead-in text one " + shared + " unique tail one"
    t2 = "completely different opening" + shared + " and another end"
    t3 = "no duplication in this document at all whatsoever here"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in
           remove_duplicated_char_spans(docs, min_len=30).collect()}
    # the truly shared region is shared + trailing space (45 chars) —
    # byte-exact excision, everything else verbatim
    assert out[1].clean_text == "unique lead-in text one " + "unique tail one"
    assert out[2].clean_text == "completely different opening" + "and another end"
    assert out[1].n_removed == out[2].n_removed == len(shared) + 1
    assert out[3].clean_text == t3 and out[3].n_removed == 0
    assert out[1].n_chars == len(t1)


def test_stratified_sample_exact_quota_and_salt(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample_exact(df, ["source"], 0.3)
    got = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in got}
    assert by_src == {"big": 30, "small": 3}  # ceil(0.3*100), ceil(0.3*7)
    # deterministic: same draw twice
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in stratified_sample_exact(df, ["source"], 0.3).collect()}
    assert a == b
    # salt re-rolls the draw but keeps quotas exact
    c = {r.doc_id
         for r in stratified_sample_exact(df, ["source"], 0.3, salt="s2").collect()}
    assert len(c) == len(a) and c != a


def test_char_spans_hash_grams_mode_identical(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        duplicated_char_spans,
    )

    shared = "the quick brown fox jumps over lazy dogs tod"
    docs = spark.createDataFrame(
        [
            (1, "unique lead-in text one " + shared + " unique tail one"),
            (2, "completely different opening" + shared + " and another end"),
            (3, "no duplication in this document at all whatsoever here"),
        ],
        "doc_id long, text string",
    )
    raw = sorted(tuple(r) for r in duplicated_char_spans(docs, 30).collect())
    hashed = sorted(
        tuple(r)
        for r in duplicated_char_spans(docs, 30, hash_grams=True).collect()
    )
    assert raw == hashed  # the 8-byte-shuffle scale path changes nothing


def test_kneser_ney_matches_python_replay_and_rewards_versatility(spark):
    import math

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.lm import (
        kneser_ney_nll_scores,
    )

    rows = [
        # 'cat' follows many contexts; 'york' only ever follows 'new'
        Row(doc_id=1, source="a", text="big cat small cat fast cat new york"),
        Row(doc_id=2, source="a", text="new york new york"),
        Row(doc_id=3, source="a", text="big cat"),
    ]
    df = spark.createDataFrame(rows)
    out = {r.doc_id: r for r in kneser_ney_nll_scores(df).collect()}

    # python replay of the exact integer formula
    texts = [r.text.split() for r in rows]
    bg = {}
    for t in texts:
        for a, b in zip(t, t[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    c1, r_cont, l_ctx = {}, {}, {}
    for (a, b), c in bg.items():
        c1[a] = c1.get(a, 0) + c
        r_cont[a] = r_cont.get(a, 0) + 1
        l_ctx[b] = l_ctx.get(b, 0) + 1
    B = len(bg)

    def nll(a, b):
        num = (4 * bg[(a, b)] - 3) * B + 3 * r_cont[a] * l_ctx[b]
        den = 4 * c1[a] * B
        return round(math.log(den) - math.log(num), 9)

    for i, t in enumerate(texts, start=1):
        terms = [nll(a, b) for a, b in zip(t, t[1:])]
        expect = round(sum(terms) / len(terms), 6)
        assert abs(out[i].mean_kn_nll - expect) < 1e-9
        assert out[i].n_bigrams == len(terms)

    # continuation effect: with equal bigram counts, a continuation
    # into the versatile word ('cat', L=3 contexts) beats one into the
    # bursty word ('york', L=1)
    assert nll("big", "cat") < nll("new", "york") or l_ctx["cat"] > l_ctx["york"]
