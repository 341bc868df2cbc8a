"""Multimodal plumbing tests: schema, batch shape, determinism of the
Pandas-UDF pipelines (the codec itself is a documented stub)."""

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(b"\x01\x02\x03\x04" * 40), (4, 4, 0, 0)),
        (2, "audio", bytearray(b"\xff\x00" * 100), (0, 0, 16000, 1000)),
        (3, "video", bytearray(bytes(range(256))), (0, 0, 0, 5000)),
        (4, "video", bytearray(b""), (0, 0, 0, 0)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_schema_and_determinism(media):
    out = mm.decode_media(media)
    assert dict(out.dtypes) == {
        "media_id": "bigint", "kind": "string", "n_bytes": "bigint",
        "width": "int", "height": "int", "checksum": "bigint",
    }
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 160
    assert rows[4]["n_bytes"] == 0
    # deterministic across runs
    again = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert {k: v.asDict() for k, v in rows.items()} == {
        k: v.asDict() for k, v in again.items()
    }


def test_decode_real_codec_gate(media):
    mm.USE_REAL_CODECS = True
    try:
        with pytest.raises(Exception) as ei:
            mm.decode_media(media).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
    finally:
        mm.USE_REAL_CODECS = False


def test_features_shape(media):
    out = mm.extract_features(media).collect()
    for r in out:
        assert len(r["features"]) == mm.FEATURE_DIM
        total = sum(r["features"])
        if r["media_id"] != 4:
            assert total == pytest.approx(1.0, abs=1e-3)  # L1-normalized


def test_frame_sampling_one_to_many(media):
    frames = mm.sample_frames(media, every_n_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # only video rows; id=3 has 256 bytes → offsets 0,64,128,192
    assert set(by_id) == {3}
    assert [f["byte_offset"] for f in sorted(by_id[3], key=lambda x: x["frame_idx"])] == [
        0, 64, 128, 192,
    ]


def test_resize_stride_and_composition(media):
    out = {r["media_id"]: r for r in mm.resize_media(media, stride=4).collect()}
    # id=1: 160 bytes of \x01\x02\x03\x04 repeated → every 4th byte is \x01.
    assert bytes(out[1]["payload"]) == b"\x01" * 40
    # id=3: bytes 0..255 → stride 4 keeps 0,4,8,...,252 (64 bytes).
    assert bytes(out[3]["payload"]) == bytes(range(0, 256, 4))
    # id=4: empty in → empty out (row preserved, not dropped).
    assert bytes(out[4]["payload"]) == b""
    # Composition: the resized binary column feeds decode_media as-is.
    dec = {
        r["media_id"]: r
        for r in mm.decode_media(mm.resize_media(media, stride=4)).collect()
    }
    assert dec[1]["n_bytes"] == 40 and dec[1]["checksum"] == 40
    assert dec[3]["checksum"] == sum(range(0, 256, 4))
    assert dec[4]["n_bytes"] == 0 and dec[4]["checksum"] == 0


def test_documents_as_media_pipeline(spark, sf_dir):
    media = mm.documents_as_media(spark, sf_dir)
    assert dict(media.dtypes)["payload"] == "binary"
    stats = mm.m_decode_stats(spark, sf_dir).collect()
    assert {r["kind"] for r in stats} == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in stats)


def test_cdc_chunking_survives_insertion(spark):
    """The CDC property the fixed grid lacks: prepending bytes to a
    payload re-chunks only the head neighborhood — downstream chunk
    hashes (and so cross-blob dedup) survive, while the 64-byte grid
    loses every chunk after the shift."""
    import random

    rng = random.Random(11)
    base = bytes(rng.randrange(256) for _ in range(4000))
    shifted = b"XYZ" + base
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(shifted))],
        "media_id long, payload binary",
    )
    chunks = (
        df.withColumn("ends", F.expr(mm._CDC_ENDS))
        .select("media_id", F.explode(F.expr(mm._CDC_HASHES)).alias("h"))
        .collect()
    )
    a = {r.h for r in chunks if r.media_id == 1}
    b = {r.h for r in chunks if r.media_id == 2}
    # the two blobs share the vast majority of their chunks
    shared = len(a & b)
    assert shared >= 0.7 * len(a), (shared, len(a), len(b))

    # the fixed grid on the same pair shares (essentially) nothing
    C = 64
    grid = df.select(
        "media_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, CAST(ceil(length(payload) / {C}.0) AS INT)),"
                f" i -> md5(substr(payload, (i - 1) * {C} + 1, {C})))"
            )
        ).alias("h"),
    ).collect()
    ga = {r.h for r in grid if r.media_id == 1}
    gb = {r.h for r in grid if r.media_id == 2}
    assert len(ga & gb) <= 0.05 * len(ga)


def test_cdc_boundaries_deterministic_and_cover(spark):
    """Chunks tile the payload exactly: the rebuilt lengths sum to the
    payload length, every chunk is non-empty, and a 1-byte payload
    (the sequence(1, 0) descending-guard edge) yields one chunk."""
    df = spark.createDataFrame(
        [(1, bytearray(b"a")), (2, bytearray(b"hello world " * 50))],
        "media_id long, payload binary",
    )
    ends = df.select(
        "media_id",
        F.expr(mm._CDC_ENDS).alias("ends"),
        F.length("payload").alias("L"),
    ).collect()
    for r in ends:
        assert r.ends[-1] == r.L
        assert all(0 < e <= r.L for e in r.ends)
        assert sorted(set(r.ends)) == list(r.ends)
    one = [r for r in ends if r.media_id == 1][0]
    assert one.ends == [1]


def test_scene_dedup_crafted_videos_and_df_fence(spark, monkeypatch):
    """m_scene_dedup on crafted videos, pinning both the pair logic
    and the df-cap skew fence: videos 1 and 2 are frame-identical
    two-shot videos (frames P P Q Q — ham(P, Q) = 64 forces the
    boundary), so BOTH their shots must pair at hamming 0 and the
    scene_dup majority flag must fire; 70 single-frame videos all
    share the boilerplate frame S, so every (band, chunk) bucket S
    occupies has df = 70..72 > cap and the fence must drop ALL their
    pairs (the test_skew_fence hot-key discipline on the shot
    modality) — including the S-adjacent buckets P and Q also land
    in, which is why the 1-2 row survives through its PRIVATE
    buckets only."""
    P = chr(200) * 32 + chr(10) * 32   # bits: 32 ones then 32 zeros
    Q = chr(10) * 32 + chr(200) * 32   # the mirror: ham(P, Q) = 64
    S = chr(200) * 8 + chr(10) * 56    # boilerplate: 8 ones, 56 zeros
    rows = [(1, P + P + Q + Q), (2, P + P + Q + Q)]
    rows += [(100 + i, S) for i in range(70)]
    vid = spark.createDataFrame(
        [(m, t, len(t)) for m, t in rows],
        "media_id long, text string, n int",
    )
    monkeypatch.setattr(mm, "_shot_videos", lambda *_: vid)
    got = mm.m_scene_dedup(spark, "unused").collect()
    assert len(got) == 1, got
    r = got[0]
    assert (r.ida, r.idb) == (1, 2)
    assert (r.shots_a, r.shots_b) == (2, 2)
    assert (r.n_pairs, r.n_dup_a, r.n_dup_b) == (2, 2, 2)
    assert r.min_ham == 0
    assert r.scene_dup == 1


def test_scene_keepers_one_per_cluster(spark, monkeypatch):
    """The keeper law on the crafted corpus: exactly one keep per
    cluster, the keeper is the component minimum, and pairless
    videos are their own singleton keepers — videos 1/2 are
    frame-identical (one scene-dup pair), the 70 boilerplate
    singles are fenced out of pairing entirely, so every video
    except 2 survives."""
    P = chr(200) * 32 + chr(10) * 32
    Q = chr(10) * 32 + chr(200) * 32
    S = chr(200) * 8 + chr(10) * 56
    rows = [(1, P + P + Q + Q), (2, P + P + Q + Q)]
    rows += [(100 + i, S) for i in range(70)]
    vid = spark.createDataFrame(
        [(m, t, len(t)) for m, t in rows],
        "media_id long, text string, n int",
    )
    monkeypatch.setattr(mm, "_shot_videos", lambda *_: vid)
    got = {r.media_id: r for r in mm.m_scene_keepers(spark, "unused").collect()}
    assert len(got) == 72
    assert (got[1].cluster_id, got[1].keep, got[1].cluster_size) == (1, 1, 2)
    assert (got[2].cluster_id, got[2].keep, got[2].cluster_size) == (1, 0, 2)
    singles = [r for m, r in got.items() if m >= 100]
    assert all(r.keep == 1 and r.cluster_size == 1
               and r.cluster_id == r.media_id for r in singles)
    # the global law: one keeper per cluster
    clusters = {r.cluster_id for r in got.values()}
    assert sum(r.keep for r in got.values()) == len(clusters)
