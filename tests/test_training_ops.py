"""Plan-shape pins for the training-data operators added in round 6:
the scale properties (narrow hash-split, no cartesian in contamination,
narrow multimodal chain) are asserted on the executed plan, same
contract as test_relational.py."""

from __future__ import annotations

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
    corpus_contamination,
    corpus_train_split,
    multimodal_frame_sample,
    multimodal_resize,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_train_split_is_narrow_single_shuffle(spark, sf_dir):
    df = corpus_train_split(spark, sf_dir)
    plan = plan_of(df)
    # md5 bucketing is pure JVM column work: no Python eval anywhere,
    # and the ONLY exchange is the final groupBy's (partial agg before it)
    assert "EvalPython" not in plan and "InPandas" not in plan
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_contamination_no_cartesian(spark, sf_dir):
    df = corpus_contamination(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_chains_are_narrow(spark, sf_dir):
    # resize -> re-decode is two back-to-back mapInPandas stages with no
    # exchange between them (the only exchanges are the intentional
    # _docs spread and the final aggregate's)
    plan = plan_of(multimodal_resize(spark, sf_dir))
    assert plan.count("MapInPandas") == 2
    between = plan.split("MapInPandas")[1]
    assert "Exchange" not in between
    assert plan.count("Exchange") == 2

    plan2 = plan_of(multimodal_frame_sample(spark, sf_dir))
    assert plan2.count("MapInPandas") == 1
    # _docs spread + countDistinct's two-phase exchange pair; nothing else
    assert plan2.count("Exchange") == 3


# --- perceptual dHash + Hamming blocking --------------------------------


def _ppm(pixels):
    """Build a P6 image from a h x w x 3 nested list."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for px in row for v in px)
    return b"P6\n%d %d\n255\n" % (w, h) + body


def test_dhash_hamming_finds_perturbed_image(spark):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        dhash_images,
    )

    import random

    rng = random.Random(11)
    base = [[[rng.randrange(256) for _ in range(3)] for _ in range(9)]
            for _ in range(8)]  # 9x8: grid sampling is identity
    near = [row[:] for row in base]
    near[0][0] = [255, 255, 255]  # one pixel: flips at most 1 dHash bit
    other = [[[rng.randrange(256) for _ in range(3)] for _ in range(9)]
             for _ in range(8)]
    df = spark.createDataFrame(
        [
            Row(media_id=1, media=bytearray(_ppm(base))),
            Row(media_id=2, media=bytearray(_ppm(near))),
            Row(media_id=3, media=bytearray(_ppm(other))),
            Row(media_id=4, media=bytearray(b"not a ppm at all")),
        ]
    )
    hashes = dhash_images(df)
    got = {r.media_id: (r.dh_hi, r.dh_lo) for r in hashes.collect()}
    assert got[1] == got[1] and got[1][0] is not None
    assert got[4] == (None, None)  # undecodable -> null, not a crash
    # identical-structure images land within hamming 1; random ones far
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in hamming_near_dup_pairs(hashes, max_hamming=3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 1
    assert all(3 not in p and 4 not in p for p in pairs)


def test_dhash_invariant_to_brightness_shift(spark):
    """dHash compares ADJACENT luminance, so a global brightness shift
    (every channel +40) leaves the hash bits unchanged — the property
    that makes it perceptual rather than a content checksum."""
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        dhash_images,
    )

    import random

    rng = random.Random(5)
    base = [[[rng.randrange(180) for _ in range(3)] for _ in range(9)]
            for _ in range(8)]
    brighter = [[[v + 40 for v in px] for px in row] for row in base]
    df = spark.createDataFrame(
        [
            Row(media_id=1, media=bytearray(_ppm(base))),
            Row(media_id=2, media=bytearray(_ppm(brighter))),
        ]
    )
    got = {r.media_id: (r.dh_hi, r.dh_lo) for r in dhash_images(df).collect()}
    assert got[1] == got[2]


def test_decode_audio_features_real_wav_parse(spark):
    import struct

    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        decode_audio_features,
    )

    def wav(samples, rate=8000, extra_chunk=False, fmt_tag=1, bits=16):
        pcm = b"".join(struct.pack("<h", s) for s in samples)
        parts = [b"RIFF", struct.pack("<I", 0), b"WAVE"]
        if extra_chunk:  # chunk walker must skip unknown chunks
            parts += [b"LIST", struct.pack("<I", 4), b"info"]
        parts += [
            b"fmt ",
            struct.pack("<IHHIIHH", 16, fmt_tag, 1, rate, rate * 2, 2, bits),
            b"data",
            struct.pack("<I", len(pcm)),
            pcm,
        ]
        return b"".join(parts)

    rows = [
        Row(media_id=1, media=bytearray(wav([100, -50, 3]))),
        Row(media_id=2, media=bytearray(wav([7], rate=16000, extra_chunk=True))),
        Row(media_id=3, media=bytearray(wav([1, 2], fmt_tag=85))),  # mp3 tag
        Row(media_id=4, media=bytearray(b"P6\n1 1\n255\nxxx")),     # not RIFF
    ]
    got = {r.media_id: r for r in
           decode_audio_features(spark.createDataFrame(rows)).collect()}
    assert got[1].sample_rate == 8000 and got[1].n_samples == 3
    assert got[1].sum_sq == 100 * 100 + 50 * 50 + 9
    assert got[2].sample_rate == 16000 and got[2].sum_sq == 49  # LIST skipped
    assert got[3].sum_sq is None  # compressed formats out of scope
    assert got[4].sample_rate is None


def test_chunk_documents_coverage_and_overlap(spark):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        chunk_documents,
    )

    words = [f"w{i}" for i in range(130)]
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(words)),
            Row(doc_id=2, text="short doc"),
            Row(doc_id=3, text="   "),  # blank: no chunks
        ]
    )
    out = chunk_documents(df, chunk_size=50, overlap=10)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # 130 words, stride 40: ceil((130-10)/40) = 3 chunks
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    c0, c1, c2 = (rows[(1, i)].chunk_text.split(" ") for i in range(3))
    assert c0 == words[0:50] and c1 == words[40:90] and c2 == words[80:130]
    assert c0[-10:] == c1[:10]  # overlap shared verbatim
    # union of chunks covers every word in order
    assert c0 + c1[10:] + c2[10:] == words
    assert rows[(2, 0)].chunk_text == "short doc"
    assert rows[(2, 0)].n_words == 2
    assert not any(k[0] == 3 for k in rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        chunk_documents,
    )

    df = spark.range(1).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=10, overlap=10)


def test_inverted_index_search_matches_bruteforce(spark, tmp_path):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        build_inverted_index,
        search_index,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta gamma"),
            Row(doc_id=1, text="Alpha beta"),          # case-folds
            Row(doc_id=2, text="beta gamma delta"),
            Row(doc_id=3, text="alpha alpha gamma"),   # dup tokens once
            Row(doc_id=4, text="   "),
        ]
    )
    path = str(tmp_path / "idx")
    idx = build_inverted_index(df, n_buckets=8)
    idx.repartition("tok_bucket").write.partitionBy("tok_bucket").parquet(path)
    index = spark.read.parquet(path)

    got = {r.doc_id for r in search_index(index, ["ALPHA", "gamma"],
                                          n_buckets=8).collect()}
    assert got == {0, 3}
    assert {r.doc_id for r in
            search_index(index, ["beta"], n_buckets=8).collect()} == {0, 1, 2}
    assert search_index(index, ["nosuchterm"], n_buckets=8).count() == 0
    # postings are distinct per (token, doc)
    assert idx.count() == idx.distinct().count()

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        search_index(index, [])


def test_inverted_index_search_prunes_partitions(spark, tmp_path):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        build_inverted_index,
        search_index,
        term_buckets,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"tok{i} common filler") for i in range(40)]
    )
    path = str(tmp_path / "idx")
    build_inverted_index(df, n_buckets=16).repartition(
        "tok_bucket"
    ).write.partitionBy("tok_bucket").parquet(path)
    index = spark.read.parquet(path)
    res = search_index(index, ["tok7", "common"], n_buckets=16)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tok_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "bucket IN-list did not become a partition filter"
    assert {r.doc_id for r in res.collect()} == {7}
    # writer/search bucket agreement: the driver-side bucket of a term
    # equals the bucket its postings were indexed under
    [b] = term_buckets(spark, ["tok7"], 16)
    assert index.filter("token = 'tok7'").collect()[0].tok_bucket == b


def test_es_priority_weighted_sampling_properties(spark):
    """Efraimidis-Spirakis: heavier items must be sampled more often
    across salts, and the draw must be layout-independent."""
    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sampling import (
        es_priority_key,
    )

    rows = [(i, 1000 if i < 10 else 10) for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def sample_ids(salt, frame):
        keyed = frame.select(
            "doc_id", es_priority_key(F.col("doc_id"), F.col("w"), salt).alias("k")
        )
        return [r.doc_id for r in keyed.orderBy(F.col("k").desc(), "doc_id").limit(10).collect()]

    heavy_hits = sum(
        sum(1 for i in sample_ids(f"s{t}", df) if i < 10) for t in range(8)
    )
    # 10 heavy items carry 100x the weight of each of 100 light items:
    # heavy share of each 10-item sample should dominate
    assert heavy_hits >= 8 * 5

    # determinism: same salt, different layout -> identical sample
    assert sample_ids("fixed", df) == sample_ids("fixed", df.repartition(13))
