"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The classic algorithm (Sennrich et al. 2016, public): pre-tokenize the
corpus into words, keep a (word, count) frequency table, represent each
word as a symbol sequence, and repeatedly (1) count adjacent symbol
pairs weighted by word frequency, (2) merge the most frequent pair
everywhere. Tokenizer TRAINING is a training-data-pipeline operator the
same way dedup is: it consumes the whole corpus but its working set
collapses to the distinct-word table after one scan.

Distribution shape per merge step:
- pair counting: posexplode the symbol arrays' adjacent pairs ->
  groupBy(pair) weighted sum — map-side combined, |distinct pairs|
  rows shuffle, NOT |corpus|;
- argmax pair: orderBy(count desc, pair) limit 1 — a
  TakeOrderedAndProject, one row to the driver (the only driver state:
  the merge table itself, one row per step);
- merge application: one Arrow-batched mapInPandas pass over the
  distinct-word table rewriting symbol sequences (an inherently
  sequential per-word scan — the documented exception to the
  built-ins-only rule, bounded by |vocab| not |corpus|);
- localCheckpoint between steps truncates the iterative lineage,
  exactly like connected_components.

Ties break lexicographically on (left, right), so training is
deterministic across partitionings and engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import cut_lineage

from .text import words


def _merge_syms(syms, left: str, right: str, merged: str) -> list:
    """Apply one (left, right) -> merged rewrite to a symbol sequence,
    left-to-right, non-overlapping — the single definition both training
    and encoding use, so their semantics cannot diverge."""
    res, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            res.append(merged)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def word_freq_table(
    docs: DataFrame, text_col: str = "text", word_filter=None
) -> DataFrame:
    """(word, count) over the corpus — the one full-corpus scan.

    ``word_filter``: optional Column predicate over ``word`` applied
    after tokenization (BPE pre-tokenizers conventionally restrict the
    training charset; it also lets callers reserve a delimiter
    character for serialized symbol-sequence artifacts)."""
    wf = docs.select(F.explode(words(F.col(text_col))).alias("word")).filter(
        F.col("word") != ""
    )
    if word_filter is not None:
        wf = wf.filter(word_filter)
    return wf.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def _initial_symbols(wf: DataFrame) -> DataFrame:
    # character symbols + an end-of-word marker, the standard setup
    return wf.select(
        "word",
        "count",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit("</w>"))
        ).alias("syms"),
    )


def _pair_counts(symtab: DataFrame) -> DataFrame:
    pairs = symtab.select(
        "count",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("count").alias("pair_count")
    )


def _merge_pass(symtab: DataFrame, left: str, right: str) -> DataFrame:
    merged = left + right

    def apply_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_merge_syms(syms, left, right, merged) for syms in pdf["syms"]]
            yield pd.DataFrame(
                {"word": pdf["word"], "count": pdf["count"], "syms": out}
            )

    return symtab.mapInPandas(
        apply_merge, schema="word string, count long, syms array<string>"
    )


# Scale factor for the WordPiece likelihood score's exact integer
# quotient: floor(pair_count * 10^18 / (left_count * right_count)).
# Both engines floor-divide identically (Spark `div` on DECIMAL(38,0)
# products == DuckDB `//` on HUGEINT), so the argmax is
# hash-replayable; two true ratios only collide after agreeing to 18
# digits, where the (left, right) lexicographic tie-break is applied
# identically anyway.
_WP_SCALE = 10**18


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    word_filter=None,
    min_pair_count: int = 2,
    checkpoint_dir: str | None = None,
):
    """WordPiece-style tokenizer training (Schuster & Nakajima 2012;
    the BERT tokenizer's criterion): like BPE but each step merges the
    pair maximizing count(pair) / (count(left) * count(right)) — the
    likelihood gain of the merge under a unigram LM — instead of the
    raw pair count. Unigram counts come from the CURRENT segmentation,
    so the loop is inherently sequential (a merge changes every score
    globally — BPE's greedy-batching soundness argument does not
    transfer).

    Returns (merges, symtab): merges = [(step, left, right, merged,
    pair_count, score_q)] with score_q the exact integer quotient
    above; symtab = the final (word, count, syms) table.

    Distribution shape per step: the BPE pair-count aggregate plus one
    symbol-unigram aggregate (both map-side combined, |vocab|-bounded),
    a broadcast join of pair rows against the two unigram counts, a
    TakeOrdered(1) argmax, and the merge pass. Like train_bpe (opt
    r15, guide §4.1): one vocab-bounded probe picks the loop body —
    the all-JVM string-``replace`` path whenever no vocab word
    contains ';' (no Python worker round-trips in the sequential
    per-step jobs), else the Arrow-batched array path; both return
    byte-identical merge tables and symbol tables (pinned in
    tests/test_wordpiece.py)."""
    wf = cut_lineage(
        word_freq_table(docs, text_col, word_filter), checkpoint_dir,
        eager=False,
    )
    has_delim = wf.filter(F.col("word").contains(_DELIM)).limit(1).count() > 0
    if has_delim:
        symtab = cut_lineage(
            _initial_symbols(wf), checkpoint_dir, eager=False
        )
        return _wordpiece_loop(
            symtab, n_merges, min_pair_count, checkpoint_dir, string_form=False
        )
    symtab = cut_lineage(_encoded_symbols(wf), checkpoint_dir, eager=False)
    merges, symtab = _wordpiece_loop(
        symtab, n_merges, min_pair_count, checkpoint_dir, string_form=True
    )
    return merges, symtab.select(
        "word", "count", _decode_syms_col().alias("syms")
    )


def _wordpiece_loop(
    symtab: DataFrame,
    n_merges: int,
    min_pair_count: int,
    checkpoint_dir: str | None,
    string_form: bool,
):
    """Shared WordPiece step loop over either symbol representation.

    ``string_form=True``: ``symtab`` carries the encoded ``s`` column
    (';a;;b;'), pair/unigram aggregates run over the decoded split
    array, and the argmax merge applies as one JVM string ``replace``
    (same left-to-right non-overlapping semantics as _merge_syms — the
    _train_loop_string argument). ``False``: the original ``syms``
    array form with the Arrow merge pass."""
    merges = []
    for step in range(1, n_merges + 1):
        if string_form:
            syms_col = _decode_syms_col().alias("syms")
            stab = symtab.select("count", syms_col)
        else:
            stab = symtab
        pairs = _pair_counts(stab).filter(
            F.col("pair_count") >= min_pair_count
        )
        uni = (
            stab.select("count", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("count").alias("uc"))
        )
        lc = uni.select(
            F.col("sym").alias("left"), F.col("uc").alias("_lc")
        )
        rc = uni.select(
            F.col("sym").alias("right"), F.col("uc").alias("_rc")
        )
        scored = (
            pairs.join(lc, "left")
            .join(rc, "right")
            .selectExpr(
                "left",
                "right",
                "pair_count",
                f"(CAST(pair_count AS DECIMAL(20,0))"
                f" * CAST({_WP_SCALE} AS DECIMAL(19,0)))"
                f" div (CAST(_lc AS DECIMAL(20,0))"
                f" * CAST(_rc AS DECIMAL(20,0))) AS score_q",
            )
        )
        top = scored.orderBy(
            F.col("score_q").desc(), F.col("left"), F.col("right")
        ).take(1)
        if not top:
            break
        t = top[0]
        merges.append(
            (
                step,
                t["left"],
                t["right"],
                t["left"] + t["right"],
                int(t["pair_count"]),
                int(t["score_q"]),
            )
        )
        if string_form:
            merged = symtab.withColumn(
                "s",
                F.replace(
                    "s",
                    F.lit(
                        f"{_DELIM}{t['left']}{_DELIM}{_DELIM}"
                        f"{t['right']}{_DELIM}"
                    ),
                    F.lit(f"{_DELIM}{t['left']}{t['right']}{_DELIM}"),
                ),
            )
        else:
            merged = _merge_pass(symtab, t["left"], t["right"])
        # r15: lazy cut — the next step's take(1) (or the caller's
        # first action) materializes it; the eager form cost one
        # dedicated job per merge step
        symtab = cut_lineage(merged, checkpoint_dir, eager=False)
    return merges, symtab


# Delimiter for the JVM string representation of a symbol sequence:
# [a, b] <-> ";a;;b;". Sound only while no symbol contains it — merged
# symbols are concatenations of their parts, so delimiter-freedom is
# invariant once the initial single-char symbols are clean. train_bpe
# probes the vocab once and falls back to the Arrow path otherwise.
_DELIM = ";"


def _encoded_symbols(wf: DataFrame) -> DataFrame:
    """_initial_symbols, JVM string form: ';c;;h;...;</w>;'."""
    return wf.select(
        "word",
        "count",
        F.concat(
            F.lit(_DELIM),
            F.array_join(
                F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))),
                _DELIM * 2,
            ),
            F.lit(_DELIM),
        ).alias("s"),
    )


def _decode_syms_col():
    """Column expr: encoded string -> symbol array (drops the outer
    delimiters, splits on the ';;' boundary)."""
    return F.split(F.expr("substring(s, 2, length(s) - 2)"), _DELIM * 2)


# How many ranked pairs one snapshot fetches for batch selection. A
# TakeOrderedAndProject of 256 skinny rows costs the same job as the
# old limit(1) — the window only bounds how large one batch can get.
_BATCH_WINDOW = 256


def _select_batch(ranked, max_n: int):
    """Greedy-batch prefix selection: from one ranked pair-count
    snapshot ((count DESC, left, right) — the sequential tie-break),
    pick the merges sequential greedy would provably choose next, in
    order. Soundness argument:

    - A pair whose symbols are DISJOINT from every earlier batch
      member's symbols keeps its exact count after those merges apply.
    - Every pair whose count a batch merge (a,b)->ab can change either
      touches {a, b} (and can only DECREASE), or is a NEW pair
      (x,ab)/(ab,y) whose count is bounded by the OLD count of a
      touching pair ((x,a) / (b,y) respectively).
    - Scanning in rank order, the FIRST pair that touches the batch's
      symbol set bounds every touched/new pair's possible count (all
      touching pairs rank at or below it). Batch members STRICTLY
      above that bound therefore remain the argmax at their step —
      ties are impossible, so the lexicographic tie-break never has to
      compare against an unknowable new symbol.

    The batched merge table is bit-identical to the sequential one by
    construction, which is why the DuckDB oracles (which replay
    sequential steps) need no change."""
    batch, seen = [], set()
    adding = True
    stop_count = None
    for r in ranked:
        if r.pair_count < 2:
            break
        syms = {r.left, r.right}
        if batch and (syms & seen):
            # the first touching pair IN RANK ORDER bounds every
            # touched/new count — even entries past the max_n cutoff
            # must be scanned for it, or a touching pair TYING a batch
            # member's count could beat it lexicographically as a new
            # pair in the sequential replay
            stop_count = r.pair_count
            break
        if adding:
            batch.append(r)
            seen |= syms
            if len(batch) >= max_n:
                adding = False  # stop adding, keep scanning for touch
    else:
        # window exhausted with no touching pair: pairs beyond the
        # window rank at or below the last seen count — same bound
        if len(ranked) >= _BATCH_WINDOW and ranked:
            stop_count = ranked[-1].pair_count
    if stop_count is not None:
        batch = [b for b in batch if b.pair_count > stop_count]
    if not batch and ranked and ranked[0].pair_count >= 2:
        # the global argmax is always a sound single-step batch
        batch = [ranked[0]]
    return batch


def _train_loop_string(symtab: DataFrame, n_merges: int,
                       checkpoint_dir: str | None = None):
    """Merge loop, 100% JVM: pair counts from the split-on-';;' array
    (slice/zip_with builtins), merge application as one string
    ``replace`` per step. Java's replace substitutes leftmost-first and
    resumes AFTER the substituted region — exactly the left-to-right
    non-overlapping semantics of :func:`_merge_syms` (same argument the
    DuckDB oracle in plans/llmops.py relies on: with every symbol
    ';'-free, ';l;;r;' matches exactly an (l, r) adjacency at symbol
    boundaries). No Python workers anywhere in the loop.

    BATCHED (r11 verdict #5): each round collects one ranked
    pair-count snapshot and applies every merge :func:`_select_batch`
    proves sequential greedy would pick next — disjoint batch members'
    replaces compose into ONE projection, so a round costs one
    counting job + one lineage cut no matter how many merges land.
    Production tokenizers need 30k merges; per-merge job scheduling is
    the binding constraint, and corpora with many disjoint frequent
    pairs batch dozens of merges per round (pinned in
    tests/test_bpe_batch.py: 100 merges in <= 20 jobs). Output is
    bit-identical to the sequential loop by the _select_batch proof."""
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        syms = _decode_syms_col()
        pairs = (
            symtab.select(
                "count",
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda a, b: F.struct(
                            a.alias("left"), b.alias("right")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("pair_count"))
        )
        ranked = (
            pairs.orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(_BATCH_WINDOW)
            .collect()
        )
        batch = _select_batch(ranked, n_merges - len(merges))
        if not batch:
            break
        for t in batch:
            merges.append(
                (len(merges) + 1, t.left, t.right, t.left + t.right,
                 t.pair_count)
            )
            symtab = symtab.withColumn(
                "s",
                F.replace(
                    "s",
                    F.lit(f"{_DELIM}{t.left}{_DELIM}{_DELIM}{t.right}{_DELIM}"),
                    F.lit(f"{_DELIM}{t.left}{t.right}{_DELIM}"),
                ),
            )
        symtab = cut_lineage(symtab, checkpoint_dir, eager=False)
    return merges, symtab.select("word", "count", _decode_syms_col().alias("syms"))


def _train_loop_array(symtab: DataFrame, n_merges: int,
                      checkpoint_dir: str | None = None):
    """Merge loop over explicit symbol arrays (Arrow-batched merge
    pass) — the fallback when some vocab word contains the delimiter,
    where the string encoding would be ambiguous."""
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(symtab)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < 2:
            break
        t = top[0]
        merges.append((step, t.left, t.right, t.left + t.right, t.pair_count))
        symtab = cut_lineage(
            _merge_pass(symtab, t.left, t.right), checkpoint_dir, eager=False
        )
    return merges, symtab


def train_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text", word_filter=None,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merge_table, final symbol
    table with a ``syms`` array column); merge_table rows are
    (step, left, right, merged, pair_count). Stops early if no pair
    occurs at least twice (merging singletons is noise).
    ``word_filter`` is forwarded to :func:`word_freq_table`.

    Execution: the (word, count) table is checkpointed after the single
    corpus scan, then one vocab-bounded probe picks the loop body —
    the all-JVM string-``replace`` path (symbols encoded ';a;;b;',
    identical semantics, ~40% faster: no Python worker round-trips in
    the 2*n_merges tiny sequential jobs) whenever no vocab word
    contains ';', else the Arrow-batched array path. Both return
    byte-identical merge tables and symbol tables (pinned in
    tests/test_bpe.py)."""
    wf = cut_lineage(
        word_freq_table(docs, text_col, word_filter=word_filter),
        checkpoint_dir, eager=False,
    )
    has_delim = wf.filter(F.col("word").contains(_DELIM)).limit(1).count() > 0
    if has_delim:
        return _train_loop_array(
            cut_lineage(_initial_symbols(wf), checkpoint_dir, eager=False),
            n_merges, checkpoint_dir,
        )
    return _train_loop_string(
        cut_lineage(_encoded_symbols(wf), checkpoint_dir, eager=False),
        n_merges, checkpoint_dir,
    )


def encode_with_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize text with a learned merge list: adds a ``bpe_tokens``
    array column. Merges apply in training order (the BPE contract).
    One Arrow-batched pass; the merge list broadcasts with the closure.

    Why Arrow and not a chained-``replace`` JVM expression like the
    training loop: measured r10 at sf0.1, the JVM chain is NOT faster
    here (2.6s vs 2.4s corpus encode; the per-word early-exit Python
    loop is competitive with 12 whole-string copies), it degrades for
    real 30k+ merge tables (expression depth vs janino's method-size
    limit), and a whole-text encoding cannot escape delimiter
    characters without changing word boundaries. Training wins from
    the string path because ITS loop is |vocab|-bounded and dominated
    by Python-worker round-trips; this pass is |corpus|-scale and
    scan-bound either way."""
    order = [(m[1], m[2], m[3]) for m in merges]

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().split():
                    syms = list(w) + ["</w>"]
                    for left, right, merged_sym in order:
                        syms = _merge_syms(syms, left, right, merged_sym)
                    toks.extend(syms)
                toks_out.append(toks)
            pdf = pdf.copy()
            pdf["bpe_tokens"] = toks_out
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(enc, schema=f"{schema}, bpe_tokens array<string>")
