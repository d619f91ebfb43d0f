"""Unigram-LM tokenizer trainer (operators/unigram.py): one
deterministic EM round — coverage, pruning, exclusion-bound and score
semantics. The cross-engine bit-parity of the whole pipeline is pinned
by the strict oracle on `unigram_vocab_table`; these tests pin the
operator-level contracts."""

from __future__ import annotations

import math
import re

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.unigram import (
    train_unigram,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the rat"),
    (3, "mat rat cat bat"),
    (4, "the the the cat"),
]


def _words(rows, max_word_len=12):
    out = []
    for _, t in rows:
        out += [
            w
            for w in re.split(r"\s+", t.lower().strip())
            if w and len(w) <= max_word_len
        ]
    return out


def test_every_character_is_covered_exactly_once(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = train_unigram(docs, n_multi=8).collect()
    total_chars = sum(len(w) for w in _words(CORPUS))
    covered = sum(r["n_uses"] * len(r["piece"]) for r in rows)
    # Viterbi segmentation tiles each word occurrence exactly — no
    # overlap, no gap, weighted by word frequency
    assert covered == total_chars


def test_frequent_whole_words_become_pieces(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = {r["piece"]: r for r in train_unigram(docs, n_multi=8).collect()}
    words = _words(CORPUS)
    # 'the' dominates the corpus: it must survive as one piece and be
    # used once per occurrence
    assert "the" in rows
    assert rows["the"]["n_uses"] == words.count("the")


def test_scores_are_ln_of_usage_ratios(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = train_unigram(docs, n_multi=8).collect()
    total = sum(r["n_uses"] for r in rows)
    for r in rows:
        want = round(math.log(r["n_uses"]) - math.log(total), 9)
        assert abs(r["logprob"] - want) < 1e-12, r


def test_overlong_words_are_excluded_by_the_documented_bound(spark):
    docs = spark.createDataFrame(
        CORPUS + [(9, "supercalifragilistic")],
        "doc_id long, text string",
    )
    rows = train_unigram(docs, n_multi=8).collect()
    covered = sum(r["n_uses"] * len(r["piece"]) for r in rows)
    # the 20-char word contributes nothing (documented max_word_len=12)
    assert covered == sum(len(w) for w in _words(CORPUS))


def test_viterbi_beats_greedy_longest_prefix(spark):
    # corpus engineered so the greedy longest-prefix segmentation of
    # 'abcd' (ab + cd or abc + d) is NOT optimal: 'bcd' is far more
    # frequent than any prefix piece, so the optimal path is a + bcd.
    rows_src = [(i, "bcd " * 30) for i in range(3)] + [(100, "abcd abcd")]
    docs = spark.createDataFrame(rows_src, "doc_id long, text string")
    out = {r["piece"]: r["n_uses"]
           for r in train_unigram(docs, n_multi=4).collect()}
    # 'bcd' must be chosen inside 'abcd' too: 90 standalone + 2 from
    # the two 'abcd' occurrences
    assert out.get("bcd") == 92, out
    assert out.get("a") == 2, out


def test_unigram_segment_roundtrips_and_prefers_trained_pieces(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.unigram import (
        unigram_segment,
        train_unigram,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    vocab = train_unigram(docs, n_multi=8)
    segged = {r["doc_id"]: r["pieces"]
              for r in unigram_segment(docs, vocab).collect()}
    # concatenating a doc's pieces reproduces its lowercased words
    for did, text in CORPUS:
        want = "".join(w for w in re.split(r"\s+", text.lower().strip()) if w)
        assert "".join(segged[did]) == want
    # the dominant word segments as one trained piece
    assert "the" in segged[4]
    # OOV characters at inference fall back to single chars, not errors
    oov = spark.createDataFrame([(9, "zzz the")], "doc_id long, text string")
    got = unigram_segment(oov, vocab).collect()[0]["pieces"]
    assert got[:3] == ["z", "z", "z"] and got[-1] == "the"


def test_em2_prunes_by_likelihood_loss_and_keeps_singles(spark):
    """r15 (r14 verdict stretch): round 2 runs under a vocabulary
    pruned to the top-`prune_keep` multi pieces by likelihood loss;
    single characters always survive (every word stays segmentable)."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.unigram import (
        train_unigram,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    v1 = train_unigram(docs, n_multi=8)
    v2 = train_unigram(docs, n_multi=8, em_rounds=2, prune_keep=2)
    m1 = {r["piece"] for r in v1.collect() if len(r["piece"]) > 1}
    out2 = v2.collect()
    m2 = {r["piece"] for r in out2 if len(r["piece"]) > 1}
    # the prune genuinely bit: at most prune_keep multi pieces survive
    assert len(m2) <= 2 < len(m1)
    assert m2 <= m1  # pruning selects, never invents
    # every single char the round-2 segmentations use is scored sanely
    assert all(r["n_uses"] >= 1 and r["logprob"] < 0 for r in out2)
    # total usage must still cover the corpus: concatenated piece mass
    # (sum over n_uses weighted by len) equals round 1's — both rounds
    # segment the same words end to end
    mass1 = sum(r["n_uses"] * len(r["piece"]) for r in v1.collect())
    mass2 = sum(r["n_uses"] * len(r["piece"]) for r in out2)
    assert mass1 == mass2


def test_em2_reduces_to_em1_when_nothing_prunable(spark):
    """With prune_keep >= all used multis, round 2 still re-runs EM
    under the smoothed scores — the output stays a valid vocabulary
    covering the same corpus mass."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.unigram import (
        train_unigram,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    v1 = train_unigram(docs, n_multi=8).collect()
    v2 = train_unigram(docs, n_multi=8, em_rounds=2,
                       prune_keep=100).collect()
    mass1 = sum(r["n_uses"] * len(r["piece"]) for r in v1)
    mass2 = sum(r["n_uses"] * len(r["piece"]) for r in v2)
    assert mass1 == mass2
    assert {r["piece"] for r in v2 if len(r["piece"]) > 1} <= {
        r["piece"] for r in v1 if len(r["piece"]) > 1
    } | {r["piece"] for r in v1 if len(r["piece"]) == 1}


def test_tokenize_pack_unigram_plan_and_bins(spark, sf_dir):
    """corpus_tokenize_pack_unigram (r15): the unigram twin keeps the
    corpus_tokenize_pack shuffle profile — word-frequency + per-doc
    joins plus ONE packing window exchange on source, no cartesian
    products — and the bin arithmetic is the running per-source sum."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        corpus_tokenize_pack_unigram,
    )

    df = corpus_tokenize_pack_unigram(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert sum("hashpartitioning(source" in ln for ln in ex) == 1
    assert "CartesianProduct" not in plan

    rows = df.collect()
    assert rows and any(r.n_tokens > 0 for r in rows)
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        run = by_src.get(r.source, 0)
        assert r.bin_offset == run, (r.source, r.doc_id)
        assert r.bin_id == r.bin_offset // 128
        by_src[r.source] = run + r.n_tokens
