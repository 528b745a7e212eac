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
