"""WordPiece-style training (operators/bpe.py train_wordpiece):
likelihood-scored merges vs a pure-Python replay, divergence from the
BPE criterion, and layout determinism."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.bpe import (
    _WP_SCALE,
    train_bpe,
    train_wordpiece,
)


def _py_wordpiece(word_counts: dict[str, int], n_merges: int):
    tabs = {w: list(w) + ["</w>"] for w in word_counts}
    out = []
    for step in range(1, n_merges + 1):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for w, syms in tabs.items():
            c = word_counts[w]
            for s in syms:
                uc[s] += c
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        cand = [
            (pc[p] * _WP_SCALE // (uc[p[0]] * uc[p[1]]), p)
            for p in pc
            if pc[p] >= 2
        ]
        if not cand:
            break
        # max score with lexicographic MIN tie-break on (left, right):
        best_q = max(q for q, _ in cand)
        best_p = min(p for q, p in cand if q == best_q)
        out.append(
            (step, best_p[0], best_p[1], best_p[0] + best_p[1],
             pc[best_p], best_q)
        )
        left, right, merged = best_p[0], best_p[1], best_p[0] + best_p[1]
        for w, syms in tabs.items():
            res, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            tabs[w] = res
    return out


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_wordpiece_matches_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low wide",
    ]
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.lower().split())
    want = _py_wordpiece(dict(wc), 6)
    got, _ = train_wordpiece(_docs_df(spark, texts), n_merges=6)
    assert got == want


def test_wordpiece_diverges_from_bpe_criterion(spark):
    # 'ab' is the most FREQUENT pair but its symbols are ubiquitous;
    # 'xy' is rarer but exclusive — WordPiece must prefer the
    # higher-likelihood 'xy' merge, BPE the raw-count 'ab' one
    texts = ["ab ab ab ab ab abc abd abe", "xy xy xy"]
    wp, _ = train_wordpiece(_docs_df(spark, texts), n_merges=1)
    bpe, _ = train_bpe(_docs_df(spark, texts), n_merges=1)
    assert (wp[0][1], wp[0][2]) == ("x", "y")
    assert (bpe[0][1], bpe[0][2]) == ("a", "b")


def test_wordpiece_layout_deterministic(spark):
    texts = [f"tok{i % 7} tok{i % 5} shared word" for i in range(40)]
    df = _docs_df(spark, texts)
    a, _ = train_wordpiece(df, n_merges=4)
    b, _ = train_wordpiece(df.repartition(13), n_merges=4)
    assert a == b


def test_wordpiece_stops_when_no_pair_repeats(spark):
    got, _ = train_wordpiece(_docs_df(spark, ["a b c d e"]), n_merges=5)
    assert got == []


def test_wordpiece_string_and_array_paths_identical(spark):
    """The all-JVM string-replace loop (opt r15) and the Arrow array
    fallback must return byte-identical merges AND symbol tables. The
    ';'-bearing corpus forces the array path; the clean corpus takes
    the string path; a word_filter dropping the ';' words makes the
    filtered corpus take the string path on the same residual vocab."""
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "mid;dle mid;dle",  # delimiter word: forces the array path
        "low newer low wide",
    ]
    df = _docs_df(spark, texts)
    arr_merges, arr_tab = train_wordpiece(df, n_merges=5)
    # same corpus MINUS the ';' words, via filter -> string path
    filt_merges, filt_tab = train_wordpiece(
        df, n_merges=5, word_filter=~F.col("word").contains(";")
    )
    clean = _docs_df(spark, [t for t in texts if ";" not in t])
    str_merges, str_tab = train_wordpiece(clean, n_merges=5)
    assert filt_merges == str_merges
    assert sorted(map(tuple, filt_tab.collect())) == sorted(
        map(tuple, str_tab.collect())
    )
    # the array path on the full corpus agrees with the python replay
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.lower().split())
    assert arr_merges == _py_wordpiece(dict(wc), 5)
    # the array-path symbol table still reconstructs every word
    for r in arr_tab.collect():
        assert "".join(r.syms).removesuffix("</w>") == r.word
