"""Content-defined chunking: exact tiling, edit resilience (the
property fixed-size chunking lacks), short-doc handling, layout
invariance."""

from __future__ import annotations

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.cdc import (
    cdc_chunks,
    cdc_dedup_stats,
)


def _text(seed: int, n: int = 1500) -> str:
    # deterministic pseudo-random text with enough alphabet variety to
    # hit the 1/64 boundary rate
    out = []
    x = seed * 2654435761 % (1 << 32)
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        out.append(chr(97 + x % 26) if x % 7 else " ")
    return "".join(out)


def test_chunks_tile_document_exactly(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=_text(3))])
    ch = sorted(
        (r.chunk_idx, r.chunk_start, r.chunk_len) for r in cdc_chunks(df).collect()
    )
    assert ch[0][1] == 1
    pos = 1
    for idx, start, ln in ch:
        assert start == pos
        pos += ln
    assert pos - 1 == 1500
    assert len(ch) > 5  # the 1/64 rate actually cuts


def test_insert_edit_realigns_chunks(spark):
    base = _text(7, 2000)
    edited = base[:900] + "XYZQW" + base[900:]  # 5-char insert mid-doc
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=edited)]
    )
    ch = cdc_chunks(df).collect()
    fps = {1: set(), 2: set()}
    lens = {1: 0, 2: 0}
    shared_chars = 0
    for r in ch:
        fps[r.doc_id].add(r.fp)
        lens[r.doc_id] += r.chunk_len
    common = fps[1] & fps[2]
    for r in ch:
        if r.doc_id == 1 and r.fp in common:
            shared_chars += r.chunk_len
    # chunks re-align after the edit: the vast majority of the original
    # bytes live in chunks byte-identical to the edited doc's chunks.
    # Fixed-size chunking would share ~45% (everything before the edit).
    assert shared_chars / lens[1] > 0.8


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="tiny"), Row(doc_id=2, text="")]
    )
    ch = cdc_chunks(df).collect()
    assert [(r.doc_id, r.chunk_start, r.chunk_len) for r in ch] == [(1, 1, 4)]


def test_stats_layout_invariant_and_self_dup_not_shared(spark):
    rows = [Row(doc_id=i, text=_text(i)) for i in range(12)]
    # doc 50 repeats its own content twice: within-doc dup is NOT
    # cross-doc shared
    rows.append(Row(doc_id=50, text=_text(99, 800) + _text(99, 800)))
    df = spark.createDataFrame(rows)
    a = sorted(
        (r.doc_id, r.n_chunks, r.n_shared_chunks, r.shared_chars)
        for r in cdc_dedup_stats(df.repartition(1)).collect()
    )
    b = sorted(
        (r.doc_id, r.n_chunks, r.n_shared_chunks, r.shared_chars)
        for r in cdc_dedup_stats(df.repartition(16, "doc_id")).collect()
    )
    assert a == b
    by_id = {t[0]: t for t in a}
    assert by_id[50][2] == 0  # within-doc repeats don't count as shared


def test_exact_copy_fully_shared(spark):
    t = _text(21)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t), Row(doc_id=3, text=_text(22))]
    )
    out = {r.doc_id: r for r in cdc_dedup_stats(df).collect()}
    assert out[1].shared_chars == 1500 and out[2].shared_chars == 1500
    assert out[1].n_shared_chunks == out[1].n_chunks
    assert out[3].shared_chars == 0
