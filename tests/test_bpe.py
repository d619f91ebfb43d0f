"""Distributed BPE training vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.bpe import (
    encode_with_merges,
    train_bpe,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "low newer low lowest newest",
    "wider wide wider wide wide",
]


def _ref_bpe(texts, n_merges):
    """Sennrich-style reference: word-freq dict, greedy pair merges,
    ties broken lexicographically on (left, right)."""
    wf = Counter(w for t in texts for w in t.lower().split())
    symtab = {w: tuple(list(w) + ["</w>"]) for w in wf}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in symtab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), n = best
        if n < 2:
            break
        merges.append((step, left, right, left + right, n))
        new = {}
        for w, syms in symtab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[w] = tuple(res)
        symtab = new
    return merges, symtab


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got_merges, got_symtab = train_bpe(docs, n_merges=8)
    ref_merges, ref_symtab = _ref_bpe(TEXTS, 8)
    assert got_merges == ref_merges
    got_tab = {
        r.word: tuple(r.syms) for r in got_symtab.collect()
    }
    assert got_tab == ref_symtab


def test_encode_applies_merges_in_training_order(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, symtab = train_bpe(docs, n_merges=8)
    enc = encode_with_merges(docs, merges)
    rows = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    # encoding a training word must reproduce its final symbol table entry
    final = {r.word: list(r.syms) for r in symtab.collect()}
    for i, t in enumerate(TEXTS):
        expect = [s for w in t.lower().split() for s in final[w]]
        assert rows[i] == expect


def test_training_stops_when_no_repeated_pair(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    merges, _ = train_bpe(docs, n_merges=50)
    # every word is a single char + </w>; each pair occurs once -> stop
    assert merges == []


def test_train_bpe_delimiter_fallback_matches_reference(spark):
    """A vocab word containing the ';' string-encoding delimiter must
    route training through the array path and still match the pure
    reference — and the clean-vocab string path must agree with the
    reference on the same texts minus the dirty word."""
    dirty = TEXTS + ["odd;word odd;word lower low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(dirty)], "doc_id long, text string"
    )
    got_merges, got_tab = train_bpe(docs, n_merges=8)
    ref_merges, ref_tab = _ref_bpe(dirty, 8)
    assert [tuple(m) for m in got_merges] == ref_merges
    assert {r.word: tuple(r.syms) for r in got_tab.collect()} == ref_tab


def test_train_bpe_string_and_array_paths_identical(spark):
    """The two loop bodies must be interchangeable: same merge table,
    same final symbol table, on a clean vocab."""
    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.bpe import (
        _encoded_symbols,
        _initial_symbols,
        _train_loop_array,
        _train_loop_string,
        word_freq_table,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    wf = word_freq_table(docs).localCheckpoint()
    m_s, t_s = _train_loop_string(_encoded_symbols(wf).localCheckpoint(), 8)
    m_a, t_a = _train_loop_array(_initial_symbols(wf).localCheckpoint(), 8)
    assert m_s == m_a
    tab_s = {r.word: tuple(r.syms) for r in t_s.collect()}
    tab_a = {r.word: tuple(r.syms) for r in t_a.collect()}
    assert tab_s == tab_a
