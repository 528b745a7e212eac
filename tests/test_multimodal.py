"""Multimodal plumbing: Arrow-batched decode/feature stubs + frame planning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, b"\x00\x01\x02\x03" * 100),
        (2, b"\xff" * 10),
        (3, b""),
        (4, None),
        (5, bytes(range(256))),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary").cache()


def test_decode_media(media_df):
    got = {r["media_id"]: r for r in
           multimodal.decode_media(media_df, "media_id", "content").collect()}
    assert got[1]["n_bytes"] == 400
    assert got[1]["checksum"] == (0 + 1 + 2 + 3) * 100 % 997
    assert got[2]["checksum"] == (255 * 10) % 997
    assert got[3]["n_bytes"] == 0 and got[4]["n_bytes"] == 0
    assert all(16 <= r["fake_width"] < 80 for r in got.values())


def test_decode_deterministic_across_partitionings(media_df):
    a = sorted(map(tuple, multimodal.decode_media(media_df, "media_id", "content").collect()))
    b = sorted(map(tuple, multimodal.decode_media(media_df.repartition(4), "media_id", "content").collect()))
    assert a == b


def test_extract_features_shape(media_df):
    rows = multimodal.extract_features(media_df, "media_id", "content").collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["features"]) == multimodal.FEATURE_DIM
    by_id = {r["media_id"]: list(r["features"]) for r in rows}
    assert by_id[3] == [0.0] * multimodal.FEATURE_DIM
    assert by_id[1] != by_id[2]


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"payload")


def test_frame_offsets(spark):
    df = spark.createDataFrame(
        [(1, 10000), (2, 100), (3, 1_000_000)], "media_id long, n_bytes long"
    )
    got = {r["media_id"]: r["frame_offsets"] for r in
           multimodal.frame_offsets(df, "media_id", "n_bytes").collect()}
    assert got[1] == [0, 4096]
    assert got[2] == []
    assert len(got[3]) == 16  # capped
    assert got[3][1] - got[3][0] == 4096


def test_extract_frames_slicing(spark):
    """Frame extraction: full 8-byte windows only, capped at max_frames,
    empty array (not NULL) for short/NULL payloads, bytes land intact."""
    from anomalydetection_spark.operators.multimodal import extract_frames

    rows = [
        (1, bytes(range(20))),   # 20 bytes → 2 full 8-byte frames
        (2, b"abc"),             # short → no frames
        (3, None),               # NULL → no frames
        (4, bytes(200)),         # 25 windows → capped at 16
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r["frames"] for r in
           extract_frames(df, "doc_id", "content", frame_size=8, max_frames=16).collect()}
    assert [bytes(f) for f in got[1]] == [bytes(range(8)), bytes(range(8, 16))]
    assert got[2] == [] and got[3] == []
    assert len(got[4]) == 16 and all(len(bytes(f)) == 8 for f in got[4])


def test_resize_media_deterministic_and_sized(spark):
    """Resize plumbing: output is exactly target_w*target_h bytes,
    deterministic across partitionings, zeros for NULL/empty payloads."""
    from anomalydetection_spark.operators.multimodal import resize_media

    rows = [(1, bytes(range(100))), (2, b""), (3, None), (4, bytes(range(255, 0, -1)))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in resize_media(df, "doc_id", "content", 8, 8).collect()}
    for i in (1, 2, 3, 4):
        assert len(bytes(out[i]["resized"])) == 64
        assert (out[i]["width"], out[i]["height"]) == (8, 8)
    assert bytes(out[2]["resized"]) == bytes(64)
    assert bytes(out[3]["resized"]) == bytes(64)
    # partitioning-independent
    out2 = {r["doc_id"]: bytes(r["resized"])
            for r in resize_media(df.repartition(3), "doc_id", "content", 8, 8).collect()}
    assert {k: bytes(v["resized"]) for k, v in out.items()} == out2


def test_decoder_loader_contract_load_once(spark, media_df, tmp_path):
    """The codec swap point (decode_media ``decoder_loader=``): a fake
    "real" codec injected through the loader is initialized ONCE per
    python worker process even across multiple jobs/tasks (process-level
    _DECODER_CACHE), and produces rows identical to the default stub when
    it wraps the same decode."""
    import glob
    import os
    import uuid

    journal = str(tmp_path / "codec_journal")
    os.makedirs(journal, exist_ok=True)

    def counting_codec_loader():
        # "initialize the codec": journal one load event per process
        with open(f"{journal}/load-{os.getpid()}-{uuid.uuid4().hex}", "w") as f:
            f.write("1")
        return multimodal._decode_stub  # the fake real codec

    counting_codec_loader.__qualname__ = f"codec_loader_{uuid.uuid4().hex}"

    # many more tasks (16 partitions × 2 jobs = 32) than python workers
    # (≤ cores on local[4]): load-once-per-process means far fewer loads
    # than tasks, deterministically
    many = media_df.repartition(16).cache()
    many.count()
    a = sorted(map(tuple, multimodal.decode_media(many, "media_id", "content", decoder_loader=counting_codec_loader).collect()))
    b = sorted(map(tuple, multimodal.decode_media(many, "media_id", "content", decoder_loader=counting_codec_loader).collect()))
    want = sorted(map(tuple, multimodal.decode_media(many, "media_id", "content").collect()))
    assert a == b == want

    loads = glob.glob(f"{journal}/load-*")
    load_pids = {os.path.basename(p).split("-")[1] for p in loads}
    # one load per process that participated — never one per task
    assert len(loads) == len(load_pids)
    assert len(loads) < 32


# ---------------------------------------------------------------------------
# media near-dup (dHash banding over byte histograms)
# ---------------------------------------------------------------------------


def _pattern_payload(seed: int, n: int = 1024, tweak: int = 0) -> bytes:
    """Doc-specific lumpy byte pattern; ``tweak`` perturbs the tail."""
    out = bytearray()
    for t in range(n):
        v = (seed * 131 + 7 * t * t + (seed % 13) * t) % 251
        if tweak and t >= n - 32:
            v = (v + tweak) % 251
        out.append(v)
    return bytes(out)


def test_byte_histograms_vs_numpy(spark):
    import numpy as np

    from anomalydetection_spark.operators.multimodal import byte_histograms

    rows = [(1, _pattern_payload(1)), (2, _pattern_payload(2)), (3, b""), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in byte_histograms(df, "media_id", "content").collect()}
    for mid in (1, 2):
        data = np.frombuffer(_pattern_payload(mid), dtype=np.uint8)
        assert got[mid]["n_bytes"] == 1024
        assert list(got[mid]["hist"]) == list(np.bincount(data % 16, minlength=16))
    assert got[3]["n_bytes"] == 0 and sum(got[3]["hist"]) == 0
    assert got[4]["n_bytes"] == 0


def test_media_near_dup_finds_perturbed_copy(spark):
    from anomalydetection_spark.operators.multimodal import media_near_dup

    rows = [(i, _pattern_payload(i)) for i in range(20)]
    rows.append((1000, _pattern_payload(7, tweak=3)))  # near-dup of 7
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = media_near_dup(df, "media_id", "content", max_l1_ppm=30_000, bands=4)
    pairs = {(r["id_a"], r["id_b"]): r["l1_ppm"] for r in out.collect()}
    assert (7, 1000) in pairs
    # the injected pair is the closest pair in the output
    assert pairs[(7, 1000)] == min(pairs.values())
    # exact copies score 0
    df2 = spark.createDataFrame(
        [(1, _pattern_payload(3)), (2, _pattern_payload(3))],
        "media_id long, content binary",
    )
    out2 = media_near_dup(df2, "media_id", "content", max_l1_ppm=30_000, max_bucket=10)
    got2 = [(r["id_a"], r["id_b"], r["l1_ppm"]) for r in out2.collect()]
    assert got2 == [(1, 2, 0)]


def test_media_near_dup_cap_skips_degenerate_buckets(spark):
    """A corpus of identical payloads shares one signature per band; with
    bucket size above max_bucket every band is non-discriminative and the
    cap must yield ZERO candidates instead of all-pairs."""
    from anomalydetection_spark.operators.multimodal import media_near_dup

    rows = [(i, _pattern_payload(42)) for i in range(30)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = media_near_dup(df, "media_id", "content", max_l1_ppm=2_000_000, max_bucket=20)
    assert out.count() == 0
    # raising the cap re-admits the bucket: all pairs, distance 0
    out2 = media_near_dup(df, "media_id", "content", max_l1_ppm=2_000_000, max_bucket=64)
    assert out2.count() == 30 * 29 // 2
    assert out2.agg({"l1_ppm": "max"}).collect()[0][0] == 0


def test_frame_near_dup_shared_frames(spark):
    """Payloads sharing two aligned frames pair up with n_shared=2;
    payloads with only unique frames never pair; a frame present in more
    payloads than max_df is boilerplate and produces no candidates."""
    from anomalydetection_spark.operators.multimodal import frame_near_dup

    FR = 32
    uniq = lambda i, j: bytes([(i * 31 + j * 7 + t) % 251 for t in range(FR)])  # noqa: E731
    shared = bytes(range(FR))
    boiler = bytes([7] * FR)
    rows = []
    # docs 0,1: two shared frames after two unique ones → pair (n_shared=2)
    for i in (0, 1):
        rows.append((i, uniq(i, 0) + uniq(i, 1) + shared + shared[::-1]))
    # docs 2..9: boilerplate frame in every payload + unique rest
    for i in range(2, 10):
        rows.append((i, boiler + uniq(i, 0) + uniq(i, 1) + uniq(i, 2)))
    df = spark.createDataFrame(rows, "media_id long, content binary")

    out = frame_near_dup(
        df, "media_id", "content", frame_size=FR, max_frames=16,
        min_shared=2, max_df=4,
    )
    got = [(r["id_a"], r["id_b"], r["n_shared"]) for r in out.collect()]
    assert got == [(0, 1, 2)]

    # raising the cap admits the boilerplate frame, but min_shared=2 still
    # keeps single-shared-frame pairs out
    out2 = frame_near_dup(
        df, "media_id", "content", frame_size=FR, max_frames=16,
        min_shared=2, max_df=64,
    )
    assert [(r["id_a"], r["id_b"]) for r in out2.collect()] == [(0, 1)]
    # ...and min_shared=1 surfaces the boilerplate clique
    out3 = frame_near_dup(
        df, "media_id", "content", frame_size=FR, max_frames=16,
        min_shared=1, max_df=64,
    )
    assert out3.count() == 1 + 8 * 7 // 2


def test_near_dup_broadcasts_hot_set_not_kept_set(spark):
    """The frequency cap must broadcast the HOT relation (buckets/hashes
    ABOVE the cap — bounded by construction) as the build side of a
    LeftAnti join, never the kept set (~all distinct signatures, corpus-
    sized at 100 TB). Round-3 verdict weak #2."""
    from anomalydetection_spark.operators.multimodal import (
        frame_near_dup,
        media_near_dup,
    )

    rows = [
        (i, bytes([(i * 13 + t) % 251 for t in range(4096)])) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")

    for out, hot_col in (
        (media_near_dup(df, "media_id", "content"), "_bsz"),
        (frame_near_dup(df, "media_id", "content"), "_df"),
    ):
        plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            out._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin LeftAnti BuildRight" in plan
        # the broadcast build side carries the ABOVE-cap filter
        assert any(
            hot_col in line and "> 64" in line
            for line in plan.splitlines()
            if line.startswith("Condition")
        )
