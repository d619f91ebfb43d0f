"""Content-defined chunking (the Rabin-fingerprint / LBFS family,
Muthitacharoen et al. 2001): cut each document into variable-size
chunks at positions where a hash of the trailing ``window`` characters
satisfies a boundary condition. Unlike fixed-size chunking, an insert
or delete only perturbs the chunks around the edit — every chunk after
it re-aligns — so cross-document shared content (boilerplate, quoted
passages, near-copies) lands in IDENTICAL chunks with identical
fingerprints, dedupable by exact hash.

Boundary condition: the first md5 hex digit of the window is '0' and
the second is in 0..3 — a 1/64 rate, so expected chunk length is
~window + 64 characters. md5-on-substring instead of a true rolling
polynomial: same content-defined property (the cut depends only on
LOCAL bytes), engine-native in both Spark (codegen'd md5) and any SQL
oracle, no per-row Python. No min/max chunk clamps: greedy clamps make
each cut depend on the previous one (sequential, unreplayable by
position-parallel SQL); the rate divisor alone controls the size
distribution.

Scale: the position explode is NARROW (one pass over characters,
~len(text) rows that immediately filter to the ~1/64 boundary hits);
the only shuffle is the tiny per-doc cut-ordering window (cuts are
sparse) and the fingerprint count aggregate — both map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, chunk_len, fp) — 1-based character
    intervals covering the document exactly; fp = md5 of the chunk
    text. Documents shorter than ``window`` become one whole-doc chunk;
    empty documents yield no chunks."""
    d = df.select(
        F.col(id_col), F.col(text_col).alias("_t"), F.length(text_col).alias("_n")
    )
    pos = d.filter(F.col("_n") >= window).select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), F.col("_n") - window + 1)).alias("_p"),
        "_t",
    )
    h = F.md5(F.expr(f"substring(_t, _p, {window})"))
    bnd = pos.filter(
        (F.substring(h, 1, 1) == "0") & F.substring(h, 2, 1).isin("0", "1", "2", "3")
    ).select(F.col(id_col), (F.col("_p") + window - 1).alias("_cut"))
    final = d.filter(F.col("_n") > 0).select(
        F.col(id_col), F.col("_n").alias("_cut")
    )
    cuts = bnd.unionByName(final).distinct()
    w = Window.partitionBy(id_col).orderBy("_cut")
    chunks = cuts.select(
        F.col(id_col),
        (F.coalesce(F.lag("_cut").over(w), F.lit(0)) + 1).alias("chunk_start"),
        F.col("_cut").alias("_cend"),
        (F.row_number().over(w) - 1).alias("chunk_idx"),
    ).withColumn("chunk_len", F.col("_cend") - F.col("chunk_start") + 1)
    return (
        chunks.join(d, id_col)
        .select(
            F.col(id_col),
            "chunk_idx",
            "chunk_start",
            "chunk_len",
            F.md5(F.expr("substring(_t, chunk_start, chunk_len)")).alias("fp"),
        )
    )


def cdc_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """Per-document storage-dedup report over CDC chunks: how many of
    the document's chunks (and characters) are byte-identical to a
    chunk of ANOTHER document — the dedup ratio a chunk-store would
    achieve, and a shared-boilerplate signal at sub-document
    granularity the word-n-gram span detectors don't see as exact
    bytes. Output: (id, n_chunks, n_shared_chunks, shared_chars)."""
    chunks = cdc_chunks(df, text_col=text_col, id_col=id_col, window=window)
    # One (fp, doc) row per group, then a COUNT window over fp gives the
    # distinct-doc multiplicity without joining chunks back to an
    # aggregate of themselves — a chunks⋈agg(chunks) self-join resolved
    # ambiguously here (Catalyst reused the same attribute on both
    # sides and silently dropped matching rows); the window shape also
    # saves that join's second fp shuffle.
    per = chunks.groupBy("fp", id_col).agg(
        F.count(F.lit(1)).alias("_k"),
        F.sum("chunk_len").alias("_chars"),
    )
    w = Window.partitionBy("fp")
    per = per.withColumn("_dc", F.count(F.lit(1)).over(w))
    shared = F.col("_dc") >= 2
    return per.groupBy(id_col).agg(
        F.sum("_k").alias("n_chunks"),
        F.sum(F.when(shared, F.col("_k")).otherwise(F.lit(0))).alias(
            "n_shared_chunks"
        ),
        F.sum(F.when(shared, F.col("_chars")).otherwise(F.lit(0))).alias(
            "shared_chars"
        ),
    )
