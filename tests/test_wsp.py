""".wsp compat source tests: byte-layout round-trip through the
binaryFile + mapInPandas reader (SURVEY.md §2A #13, §7.8)."""

import os
import struct

import pytest

from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.sources.wsp import (
    METADATA_SIZE,
    ARCHIVE_SIZE,
    POINT_SIZE,
    create_wsp,
    read_wsp,
    read_wsp_headers,
    wsp_update_many,
)

NOW = 1_700_000_000 - (1_700_000_000 % 60)


@pytest.fixture
def wsp_tree(tmp_path):
    root = str(tmp_path / "whisper")
    os.makedirs(os.path.join(root, "servers", "web1"), exist_ok=True)
    cfg = SeriesConfig.from_defs("60s:1h,300s:6h", "sum", 0.5)
    p1 = os.path.join(root, "servers", "web1", "cpu.wsp")
    p2 = os.path.join(root, "mem.wsp")
    create_wsp(p1, cfg)
    create_wsp(p2, cfg)
    wsp_update_many(p1, [(NOW - 120, 1.5), (NOW - 60, 2.5), (NOW - 61, 9.9)], NOW)
    wsp_update_many(p2, [(NOW - 300, 7.0)], NOW)
    return root, cfg


def test_file_layout_exact(wsp_tree):
    root, cfg = wsp_tree
    p = os.path.join(root, "mem.wsp")
    size = os.path.getsize(p)
    expected = (
        METADATA_SIZE
        + ARCHIVE_SIZE * 2
        + (cfg.retentions[0].points + cfg.retentions[1].points) * POINT_SIZE
    )
    assert size == expected
    with open(p, "rb") as f:
        agg, max_ret, xff, n_arch = struct.unpack(">LLfL", f.read(16))
    assert (agg, max_ret, n_arch) == (2, 6 * 3600, 2)  # Sum=2
    assert xff == pytest.approx(0.5)


def test_read_wsp_points(spark, wsp_tree):
    root, _ = wsp_tree
    df = read_wsp(spark, root, root=root).cache()
    rows = {
        (r["metric"], r["interval"]): (r["value"], r["archive_id"])
        for r in df.collect()
    }
    # LWW within the NOW-120 slot: 9.9 (ts NOW-61 → slot NOW-120) overwrote 1.5.
    assert rows[("servers.web1.cpu", NOW - 120)] == (9.9, 0)
    assert rows[("servers.web1.cpu", NOW - 60)] == (2.5, 0)
    assert rows[("mem", NOW - 300)][0] == 7.0
    # zero-interval (never-written) slots excluded
    assert df.count() == 3


def test_read_wsp_headers(spark, wsp_tree):
    root, _ = wsp_tree
    hdr = {r["metric"]: r for r in read_wsp_headers(spark, root, root=root).collect()}
    assert hdr["mem"]["aggregation_method"] == "sum"
    assert hdr["mem"]["max_retention"] == 6 * 3600
    assert hdr["mem"]["n_archives"] == 2
    assert hdr["servers.web1.cpu"]["x_files_factor"] == pytest.approx(0.5)


def test_wsp_to_engine_roundtrip(spark, wsp_tree):
    """Ingest .wsp points into the Spark engine and fetch."""
    from pyspark.sql import functions as F

    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig

    root, cfg = wsp_tree
    pts = (
        read_wsp(spark, root, root=root)
        .where(F.col("archive_id") == 0)
        .select(
            "metric",
            F.col("interval").alias("ts"),
            "value",
            F.col("interval").alias("write_seq"),
        )
    )
    eng = WhisperEngine(spark, cfg)
    eng.update_many(pts, NOW)
    res = eng.fetch(NOW - 300, NOW, NOW, metrics=["servers.web1.cpu"])
    vals = [r["value"] for r in res.frame.orderBy("interval").collect()]
    assert vals == [None, None, 9.9, 2.5, None]


def test_wsp_ring_wraparound(spark, tmp_path):
    """Writing more intervals than the archive holds laps the ring: only
    the newest `points` slots survive (automatic expiry by overwrite)."""
    import os

    from go_whisper_spark.model import SeriesConfig
    from go_whisper_spark.sources.wsp import create_wsp, read_wsp, wsp_update_many

    root = str(tmp_path / "w")
    os.makedirs(root, exist_ok=True)
    # archive 0: 60s x 5 slots (300s of history), coarse level to satisfy
    # validation
    cfg = SeriesConfig.from_defs("60s:5,300s:1h", "sum", 0.5)
    p = os.path.join(root, "lap.wsp")
    create_wsp(p, cfg)
    # 8 sequential minutes -> 3 slots overwritten by the second lap
    pts = [(NOW - (7 - i) * 60, float(i)) for i in range(8)]
    wsp_update_many(p, pts, NOW)
    rows = {
        r["interval"]: r["value"]
        for r in read_wsp(spark, p, root=root).where("archive_id = 0").collect()
    }
    assert len(rows) == 5
    # newest five intervals survive with their values
    for i in range(3, 8):
        assert rows[NOW - (7 - i) * 60] == float(i)


def test_export_wsp_distributed(spark, tmp_path):
    """The distributed sink writes byte-identical files to what the
    driver-side writers produce: export a two-metric, two-archive frame
    through applyInPandas, then compare every file byte-for-byte
    against a driver-side reference build."""
    from pyspark.sql import functions as F

    from go_whisper_spark.sources.wsp import (
        export_wsp,
        wsp_write_archive,
    )

    cfg = SeriesConfig.from_defs("60s:1h,300s:6h", "average", 0.5)
    a0 = [(m, 0, NOW - k * 60, float(10 * i + k))
          for i, m in enumerate(("alpha", "beta")) for k in range(10)]
    a1 = [(m, 1, NOW - NOW % 300 - k * 300, float(100 * i + k))
          for i, m in enumerate(("alpha", "beta")) for k in range(4)]
    df = spark.createDataFrame(
        a0 + a1, "metric string, archive_id int, interval long, value double"
    )

    out = str(tmp_path / "export")
    res = {r["metric"]: r for r in export_wsp(df, out, cfg, NOW).collect()}
    assert set(res) == {"alpha", "beta"}
    assert all(r["n_points"] == 14 for r in res.values())

    ref = str(tmp_path / "ref")
    os.makedirs(ref)
    for i, m in enumerate(("alpha", "beta")):
        p = os.path.join(ref, f"{m}.wsp")
        create_wsp(p, cfg)
        wsp_update_many(
            p, [(NOW - k * 60, float(10 * i + k)) for k in range(10)], NOW
        )
        wsp_write_archive(
            p, 1,
            [(NOW - NOW % 300 - k * 300, float(100 * i + k)) for k in range(4)],
        )
    for m in ("alpha", "beta"):
        got = open(os.path.join(out, f"{m}.wsp"), "rb").read()
        want = open(os.path.join(ref, f"{m}.wsp"), "rb").read()
        assert got == want, f"{m}: exported bytes differ"


# ---- hypothesis: ring-writer model check ----------------------------------

import struct as _struct

from hypothesis import given, settings, strategies as st

from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.sources.wsp import (
    ARCHIVE_FMT,
    ARCHIVE_SIZE,
    METADATA_FMT,
    METADATA_SIZE,
    POINT_SIZE,
    create_wsp,
    wsp_update_many,
)

_NOW = 1_700_000_000


@settings(max_examples=50, deadline=None)
@given(
    spp=st.integers(1, 600),
    npts=st.integers(4, 50),
    raw=st.lists(
        st.tuples(
            st.integers(-2, 2),            # ts offset in ring-lengths (scaled below)
            st.floats(allow_nan=False, allow_infinity=False,
                      min_value=-1e6, max_value=1e6),
        ),
        max_size=60,
    ),
)
def test_wsp_ring_writer_matches_model(tmp_path_factory, spp, npts, raw):
    """Byte-level model check of the ring writer: for ANY single-archive
    config and ANY point batch (including future and expired
    timestamps), the file's data region must equal a pure-Python
    simulation of whisper's documented semantics — bounds rejection
    (ts > now or now − ts ≥ maxRetention), floor alignment, base-interval
    anchoring, modulo slot addressing, and in-order LWW overwrite."""
    max_ret = spp * npts
    cfg = SeriesConfig.from_defs(f"{spp}s:{max_ret}s", "average", 0.0)
    path = str(tmp_path_factory.mktemp("wsp") / "m.wsp")
    create_wsp(path, cfg)

    # scale offsets into timestamps around NOW: cover in-window, expired,
    # and future points
    pts = [(_NOW + (o * max_ret) // 2, v) for o, v in raw]
    wsp_update_many(path, pts, _NOW)

    # model: replicate the documented write loop
    slots = {}
    base = 0
    for ts, value in sorted(pts, key=lambda p: p[0]):
        if ts > _NOW or _NOW - ts >= max_ret:
            continue
        interval = ts - ts % spp
        if base == 0:
            base = interval
        slots[((interval - base) // spp) % npts] = (interval, value)

    with open(path, "rb") as f:
        head = f.read(METADATA_SIZE)
        _, got_max_ret, _, n_arch = _struct.unpack(METADATA_FMT, head)
        assert (got_max_ret, n_arch) == (max_ret, 1)
        off, got_spp, got_npts = _struct.unpack(ARCHIVE_FMT, f.read(ARCHIVE_SIZE))
        assert (got_spp, got_npts) == (spp, npts)
        f.seek(off)
        data = f.read(npts * POINT_SIZE)

    for i in range(npts):
        interval, value = _struct.unpack_from(">Ld", data, i * POINT_SIZE)
        want = slots.get(i, (0, 0.0))
        assert (interval, value) == want, f"slot {i}: {(interval, value)} != {want}"
