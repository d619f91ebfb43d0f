"""Round-12: batched BPE merge rounds (r11 verdict #5).

_select_batch applies, per pair-count snapshot, exactly the merges
sequential greedy would pick next (see its docstring for the proof
sketch); these tests pin (a) bit-equality of the batched loop against
a pure-Python sequential reference on an interaction-heavy corpus,
(b) the job bound: 100 merges on a disjoint-pair corpus in <= 20
Spark jobs."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import bpe


def _sequential_reference(word_counts: dict[str, int], n_merges: int):
    """Pure-Python sequential greedy BPE — the ground truth."""
    tab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in tab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((step, l, r, l + r, n))
        for w in tab:
            tab[w] = bpe._merge_syms(tab[w], l, r, l + r)
    return merges


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_batched_equals_sequential_on_interacting_corpus(spark):
    # heavy symbol sharing (e/t/h/</w> everywhere) so batches truncate
    # constantly — the hard case for the prefix-soundness rule
    texts = [
        "the theme these then there tether ether he she thee " * 3,
        "that this those hat het hete teeth tee eat tea heat " * 2,
        "a ab abc abcd abcde ae be ce de thee thee the the the",
    ]
    docs = _docs_df(spark, texts)
    got, _ = bpe.train_bpe(docs, n_merges=25)
    wf = {
        r["word"]: r["count"]
        for r in bpe.word_freq_table(docs).collect()
    }
    want = _sequential_reference(wf, 25)
    assert got == want


def test_batched_equals_sequential_with_ties(spark):
    # equal-count pairs exercise the lexicographic tie-break + the
    # strict-bound truncation together
    texts = ["xy xy qr qr mn mn xq xq ym ym rn rn"] * 2
    docs = _docs_df(spark, texts)
    got, _ = bpe.train_bpe(docs, n_merges=12)
    wf = {
        r["word"]: r["count"] for r in bpe.word_freq_table(docs).collect()
    }
    assert got == _sequential_reference(wf, 12)


def test_100_merges_within_20_jobs(spark):
    # 120 symbol-disjoint bigrams, each repeated 3x inside its word
    # ("ababab") so the interior pair count (3n) dominates the word's
    # own shadow pairs ((b,a): 2n, (b,</w>): n) — every round's ranked
    # snapshot then starts with a LONG disjoint prefix and the whole
    # 100-merge table lands in a handful of rounds. The job count is
    # the point: per-merge scheduling (~3 jobs/merge in the r11 loop)
    # is what a 30k-merge production run cannot afford.
    import string

    alphabet = list(string.ascii_lowercase + string.digits)
    # extend with caseless CJK chars (lowercasing must not collide)
    alphabet += [chr(0x4E00 + i) for i in range(2 * 120 - len(alphabet))]
    bigrams = [
        alphabet[2 * i] + alphabet[2 * i + 1] for i in range(120)
    ]
    text = " ".join(
        " ".join([w * 3] * (300 - 2 * k)) for k, w in enumerate(bigrams)
    )
    docs = _docs_df(spark, [text])
    sc = spark.sparkContext
    sc.setJobGroup("bpe100", "batched bpe")
    try:
        merges, _ = bpe.train_bpe(docs, n_merges=100)
    finally:
        sc.setJobGroup(None, None)
    assert len(merges) == 100
    tracker = sc.statusTracker()
    jobs = tracker.getJobIdsForGroup("bpe100")
    assert len(jobs) <= 20, f"{len(jobs)} jobs for 100 merges"
    # and the table still matches sequential greedy
    wf = {
        r["word"]: r["count"] for r in bpe.word_freq_table(docs).collect()
    }
    assert merges == _sequential_reference(wf, 100)
