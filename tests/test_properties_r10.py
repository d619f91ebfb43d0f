"""Property-based tests for the round-10 operators.

MP4 codec: ARBITRARY frame payloads, counts and chunk layouts
round-trip bit-exactly through the vendored 14496-12 writer/reader
(pure Python — cheap enough for many hypothesis examples). Positional
search: on arbitrary small-alphabet corpora (collisions guaranteed)
the distributed phrase and proximity operators must equal direct
pure-Python references over the same whitespace tokenization.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# --- MP4 round-trip: pure python, generous example count ----------------

frames_strategy = st.lists(
    st.binary(min_size=0, max_size=300), min_size=1, max_size=9
)


@settings(max_examples=60, deadline=None)
@given(frames=frames_strategy, fpc=st.integers(0, 4), fps=st.integers(1, 60))
def test_mp4_roundtrip_property(frames, fpc, fps):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.mp4_mjpeg import (
        decode_mp4_frames,
        encode_mp4_mjpeg,
        mp4_meta,
    )

    data = encode_mp4_mjpeg(frames, 16, 8, fps=fps, frames_per_chunk=fpc)
    assert [f for _, f in decode_mp4_frames(data)] == frames
    m = mp4_meta(data)
    assert m["n_frames"] == len(frames)
    assert (m["timescale"], m["duration"]) == (fps, len(frames))
    # deterministic bytes
    assert data == encode_mp4_mjpeg(frames, 16, 8, fps=fps, frames_per_chunk=fpc)


# --- positional search vs pure-python reference --------------------------

words_st = st.text(alphabet="ab", min_size=1, max_size=2)
docs_st = st.lists(
    st.lists(words_st, min_size=0, max_size=12), min_size=1, max_size=6
)


def _ref_phrase(docs, phrase):
    out = []
    for i, ws in enumerate(docs):
        k = len(phrase)
        for s in range(len(ws) - k + 1):
            if ws[s : s + k] == phrase:
                out.append((i, s + 1))  # 1-based
    return sorted(out)


def _ref_near(docs, a, b, w):
    out = []
    for i, ws in enumerate(docs):
        pa = [p + 1 for p, t in enumerate(ws) if t == a]
        pb = [p + 1 for p, t in enumerate(ws) if t == b]
        for x in pa:
            for y in pb:
                if abs(x - y) <= w:
                    out.append((i, x, y, abs(x - y)))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=docs_st,
    phrase=st.lists(words_st, min_size=1, max_size=3),
    window=st.integers(1, 4),
)
def test_positional_search_matches_reference(spark, docs, phrase, window):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        build_positional_index,
        phrase_search,
        proximity_search,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_positional_index(df, n_buckets=4).cache()

    got = sorted(
        (r.doc_id, r.start)
        for r in phrase_search(index, phrase, n_buckets=4).collect()
    )
    assert got == _ref_phrase(docs, phrase)

    near = sorted(
        (r.doc_id, r.pos_a, r.pos_b, r.distance)
        for r in proximity_search(index, "a", "b", window=window,
                                  n_buckets=4).collect()
    )
    assert near == _ref_near(docs, "a", "b", window)
