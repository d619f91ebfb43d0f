"""Unigram-LM (SentencePiece-style) tokenizer training — the third
member of the tokenizer-trainer family (operators/bpe.py: BPE merges,
WordPiece score-quotient merges).

Kudo 2018's unigram model trains by EM: score candidate pieces, Viterbi-
segment the corpus under the current scores, recount piece usage from
the optimal segmentations, re-score. This module implements ONE
deterministic EM round under the repo's exact-arithmetic contract so a
DuckDB oracle replays every step bit-for-bit:

- candidate pieces are all substrings (length <= max_piece_len) of the
  distinct-word table, counted per occurrence weighted by word
  frequency; the vocabulary keeps EVERY single character (so every
  word stays segmentable) plus the top ``n_multi`` multi-character
  pieces by (count DESC, piece ASC) with count >= min_count — a
  deterministic truncation, no RNG;
- initial scores are ln of exact integers rounded to 9 decimals
  (the lm.py idiom — the one ln-parity pattern the oracle suite has
  proven across engines), carried as DECIMAL(20,9);
- Viterbi DP: best[i] = max over spans (j..i] in the vocab of
  best[j] + logp(piece), with every partial sum CAST back to
  DECIMAL(20,9) (exact: 9-dp terms, bounded magnitude) and the argmax
  tie-broken (total DESC, span length DESC, piece ASC) — identical to
  a row_number in SQL. Words longer than ``max_word_len`` are excluded
  from training (documented bound; it is what makes the oracle's DP a
  fixed unroll);
- the optimal path is recovered by walking the stored per-position
  choices back from the word end (<= max_word_len steps), and the
  M-step recounts piece usage over the paths weighted by word counts;
- final scores are ln(n_uses) - ln(total_uses), rounded to 9.

Scale: the full corpus is touched ONCE (the word-frequency scan); all
DP/backtrack work runs on the DISTINCT-word table (orders of magnitude
smaller) as ONE Arrow-batched pass with the driver-sized vocabulary in
the closure — the operators/bpe.py merge-pass shape. The only collect
is the vocabulary itself (every corpus character + n_multi pieces,
bounded by construction, never by the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_freq_table

DEC = "decimal(20,9)"


class _NegStr:
    """Order-reversing string wrapper: used as the LAST component of a
    max() key so equal (total, l) candidates pick the lexicographically
    SMALLEST piece — the row_number (total DESC, l DESC, piece ASC)
    tie-break both engines evaluate."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __gt__(self, other):
        return self.s < other.s

    def __lt__(self, other):
        return self.s > other.s

    def __eq__(self, other):
        return self.s == other.s


def _spans(wf: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, cnt, i=end pos, l, piece) for every substring span of
    length <= max_piece_len; positions 1-based (both engines')."""
    return (
        wf.select(
            "word",
            "cnt",
            F.explode(
                F.sequence(F.lit(1), F.length("word"))
            ).alias("i"),
        )
        .select(
            "word",
            "cnt",
            "i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.col("i")),
                )
            ).alias("l"),
        )
        .withColumn("piece", F.expr("substring(word, i - l + 1, l)"))
    )


def _segment_kernel(logp_by_piece: dict, max_piece_len: int):
    """Arrow kernel factory: Viterbi-segment the distinct-word table
    under ``logp_by_piece`` (piece -> Decimal score) and emit per-piece
    usage counts weighted by word frequency. Shared by every EM round
    — the scores map is the only thing that changes between rounds."""

    def segment(batches):
        from decimal import Decimal as _D

        import pandas as pd

        for pdf in batches:
            counts: dict[str, int] = {}
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                L = len(word)
                # best[i]: (total Decimal, chosen l) for prefix length i
                best = [None] * (L + 1)
                best[0] = (_D("0.000000000"), 0)
                for i in range(1, L + 1):
                    top = None
                    for l in range(1, min(max_piece_len, i) + 1):
                        piece = word[i - l : i]
                        lp = logp_by_piece.get(piece)
                        if lp is None or best[i - l] is None:
                            continue
                        total = best[i - l][0] + lp
                        key = (total, l, _NegStr(piece))
                        if top is None or key > top[0]:
                            top = (key, total, l)
                    if top is not None:
                        best[i] = (top[1], top[2])
                pos = L
                while pos > 0:
                    l = best[pos][1]
                    piece = word[pos - l : pos]
                    counts[piece] = counts.get(piece, 0) + int(cnt)
                    pos -= l
            yield pd.DataFrame(
                {
                    "piece": list(counts.keys()),
                    "n": list(counts.values()),
                }
            )

    return segment


def _viterbi_best(
    target: str, logp: dict, max_piece_len: int, exclude: str
):
    """Best segmentation score of ``target`` under ``logp`` with the
    span equal to ``exclude`` banned — the likelihood-loss denominator
    of Kudo's prune (driver-side: targets are vocabulary pieces, <=
    max_piece_len chars, and the vocab is bounded by construction).
    Same Decimal arithmetic + (total DESC, l DESC, piece ASC) argmax as
    the corpus kernel, so the oracle's unrolled replay is bit-equal."""
    from decimal import Decimal as _D

    L = len(target)
    best = [None] * (L + 1)
    best[0] = (_D("0.000000000"), 0)
    for i in range(1, L + 1):
        top = None
        for l in range(1, min(max_piece_len, i) + 1):
            piece = target[i - l : i]
            if piece == exclude:
                continue
            lp = logp.get(piece)
            if lp is None or best[i - l] is None:
                continue
            total = best[i - l][0] + lp
            key = (total, l, _NegStr(piece))
            if top is None or key > top[0]:
                top = (key, total, l)
        if top is not None:
            best[i] = (top[1], top[2])
    return best[L][0] if best[L] is not None else None


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = 12,
    max_piece_len: int = 4,
    min_count: int = 2,
    n_multi: int = 48,
    em_rounds: int = 1,
    prune_keep: int = 32,
) -> DataFrame:
    """Deterministic EM round(s) of unigram-LM training over the
    corpus; returns the trained vocabulary as
    (piece, n_uses BIGINT, logprob DOUBLE) — pieces that the Viterbi
    segmentations actually use, scored by usage (the unigram prune:
    candidates no optimal path touches drop out).

    ``em_rounds=2`` (r15 — the r14 verdict's stretch ask) adds Kudo
    2018's full loop shape: after round 1's usage recount, scores are
    re-estimated with +max(n,1) smoothing so every single character
    stays segmentable, the multi-piece vocabulary is PRUNED by
    likelihood loss — loss(p) = n_uses(p) * (score(p) - best
    segmentation score of p's own string WITHOUT p), keep the top
    ``prune_keep`` by (loss DESC, piece ASC) — and a second Viterbi
    E-step + usage M-step runs under the pruned vocabulary. Every
    stage (both DPs, the smoothing, the prune loss and its
    tie-broken truncation) is exact Decimal/ln-of-integer arithmetic,
    so the DuckDB oracle replays the whole two-round chain."""
    spark = docs.sparkSession
    wf = (
        word_freq_table(docs, text_col)
        .filter(F.length("word") <= max_word_len)
        .withColumnRenamed("count", "cnt")
        .localCheckpoint(eager=False)  # lazy (r15): spans' first action materializes
    )
    spans = _spans(wf, max_piece_len).localCheckpoint(eager=False)

    # candidate counts -> deterministic vocabulary
    pc = spans.groupBy("piece").agg(F.sum("cnt").alias("c"))
    singles = pc.filter(F.length("piece") == 1)
    multi = (
        pc.filter(
            (F.length("piece") > 1) & (F.col("c") >= min_count)
        )
        .orderBy(F.col("c").desc(), "piece")
        .limit(n_multi)  # TakeOrdered — no global sort
    )
    kept = singles.unionByName(multi)
    total = kept.agg(F.sum("c").alias("t"))
    vocab = (
        kept.crossJoin(F.broadcast(total))
        .select(
            "piece",
            F.round(F.log("c") - F.log("t"), 9)
            .cast(DEC)
            .alias("logp"),
        )
        .localCheckpoint(eager=False)  # lazy (r15): the vocab collect materializes
    )

    # Viterbi DP + backtrack in ONE Arrow pass over the DISTINCT-word
    # table (the operators/bpe.py merge-pass pattern): the vocab is
    # driver-sized by construction (every corpus character + n_multi
    # pieces), so it ships in the closure as exact Decimals, and the
    # per-word DP (<= max_word_len positions x <= max_piece_len spans)
    # runs in Python Decimal arithmetic — the IDENTICAL 9-dp-scale
    # additions and (total DESC, l DESC, piece ASC) argmax the engines'
    # DECIMAL(20,9) chain evaluates, so the oracle replays it
    # bit-for-bit. The first cut ran the DP as 12 chained join+window
    # stages + 12 backtrack joins: bit-equal but ~8 s of per-stage
    # scheduling overhead at sf0.1 for milliseconds of arithmetic
    # (PROFILE_r14); one Arrow stage does it in <1 s.
    logp_by_piece = {
        r["piece"]: r["logp"] for r in vocab.collect()
    }  # DECIMAL(20,9) -> decimal.Decimal, exact

    all_used = wf.mapInPandas(
        _segment_kernel(logp_by_piece, max_piece_len),
        "piece string, n long",
    )
    usage = all_used.groupBy("piece").agg(
        F.sum("n").alias("n_uses")
    )

    if em_rounds >= 2:
        # --- M-step round 1 with +max(n,1) smoothing + Kudo prune ---
        # Everything here is driver-sized: usage is bounded by |vocab|
        # (every corpus character + n_multi pieces), never the corpus.
        u1 = {r["piece"]: int(r["n_uses"]) for r in usage.collect()}
        n1 = {
            p: max(u1.get(p, 0), 1)
            for p in logp_by_piece
            if len(p) == 1
        }
        n1.update({p: c for p, c in u1.items() if len(p) > 1})
        # ln parity: compute the smoothed scores IN SPARK (the proven
        # cross-engine ln-of-integers pattern), then collect
        t1 = sum(n1.values())
        s1_rows = spark.createDataFrame(
            sorted(n1.items()), "piece string, n1 long"
        ).select(
            "piece",
            F.round(F.log("n1") - F.log(F.lit(t1).cast("long")), 9)
            .cast(DEC)
            .alias("logp"),
        )
        s1 = {r["piece"]: r["logp"] for r in s1_rows.collect()}
        # likelihood loss of dropping each multi piece: usage times
        # (own score - best self-segmentation without it)
        losses = []
        for p, c in sorted(n1.items()):
            if len(p) == 1:
                continue
            alt = _viterbi_best(p, s1, max_piece_len, exclude=p)
            losses.append((c * (s1[p] - alt), p))
        losses.sort(key=lambda t: (-t[0], t[1]))
        kept2 = {p for _loss, p in losses[:prune_keep]}
        vocab2 = {
            p: lp
            for p, lp in s1.items()
            if len(p) == 1 or p in kept2
        }
        # --- E-step round 2 under the pruned vocabulary ---
        used2 = wf.mapInPandas(
            _segment_kernel(vocab2, max_piece_len),
            "piece string, n long",
        )
        usage = used2.groupBy("piece").agg(F.sum("n").alias("n_uses"))

    tot = usage.agg(F.sum("n_uses").alias("t"))
    return usage.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.col("n_uses").cast("long").alias("n_uses"),
        F.round(F.log("n_uses") - F.log("t"), 9)
        .cast("double")
        .alias("logprob"),
    )


def unigram_segment(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inference half (the encode_with_merges analogue for BPE): Viterbi-
    segment every document's words under a TRAINED vocabulary — the
    (piece, logprob) frame train_unigram returns — and emit
    (id, pieces array<string>) with pieces in document order.

    Same kernel shape as training: the vocabulary collects once
    (driver-sized by construction) and one Arrow pass segments the
    documents; scores are carried as 9-dp Decimals so the argmax is
    deterministic under any partitioning. Characters absent from the
    vocabulary (possible at inference — training saw a different
    corpus) fall back to single-character pieces with a score below
    every trained piece, the conventional UNK-penalty treatment; no
    word length bound applies at inference (the DP is data-side, not
    an oracle unroll)."""
    from decimal import Decimal

    rows = vocab.select("piece", "logprob").collect()
    logp = {
        r["piece"]: Decimal(str(round(float(r["logprob"]), 9)))
        for r in rows
    }
    floor = (
        min(logp.values()) if logp else Decimal("0")
    ) - Decimal("100.000000000")
    max_l = max((len(p) for p in logp), default=1)

    def seg_word(word: str) -> list[str]:
        L = len(word)
        best: list = [None] * (L + 1)
        best[0] = (Decimal("0.000000000"), 0)
        for i in range(1, L + 1):
            top = None
            for l in range(1, min(max_l, i) + 1):
                piece = word[i - l : i]
                lp = logp.get(piece)
                if lp is None:
                    if l != 1:
                        continue
                    lp = floor  # OOV char fallback
                total = best[i - l][0] + lp
                key = (total, l, _NegStr(piece))
                if top is None or key > top[0]:
                    top = (key, total, l)
            best[i] = (top[1], top[2])
        out: list[str] = []
        pos = L
        while pos > 0:
            l = best[pos][1]
            out.append(word[pos - l : pos])
            pos -= l
        out.reverse()
        return out

    import re as _re

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            ids, pieces = [], []
            for did, text in zip(pdf["_id"], pdf["_t"]):
                toks: list[str] = []
                for w in _re.split(r"\s+", str(text).lower().strip()):
                    if w:
                        toks += seg_word(w)
                ids.append(did)
                pieces.append(toks)
            yield pd.DataFrame({"_id": ids, "pieces": pieces})

    id_type = docs.schema[id_col].dataType.simpleString()
    return (
        docs.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
        )
        .mapInPandas(kern, f"_id {id_type}, pieces array<string>")
        .withColumnRenamed("_id", id_col)
    )
