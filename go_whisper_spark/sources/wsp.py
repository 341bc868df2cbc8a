"""Whisper ``.wsp`` binary-format compatibility source (and test writer).

Parses the publicly specified Whisper on-disk layout (graphite docs,
"The Whisper Database"; [ref: whisper.go (pack/unpack function group,
const MetadataSize=16, ArchiveInfoSize=12, PointSize=12)]):

- header: ``>LLfL``  = (aggregationType, maxRetention, xFilesFactor,
  archiveCount), 16 bytes, big-endian
- per archive: ``>LLL`` = (offset, secondsPerPoint, points), 12 bytes
- data: per archive, ``points`` × 12-byte ``(interval u32, value f64)``
  ring slots; interval==0 marks a never-written slot

Spark integration: ``spark.read.format("binaryFile")`` distributes the
file payloads; a ``mapInPandas`` stage parses each file with
numpy ``frombuffer`` (vectorized big-endian struct reads — no per-point
Python loop).  Metric identity = file path relative to the root, with
``/`` → ``.`` (the Graphite convention).

Scale: files parallelize across executors via binaryFile partitioning;
parsing is O(file size) columnar; downstream everything is the normal
points schema.  The writer exists for tests and migration fixtures —
it implements Create + finest-archive Update (ring addressing, LWW
overwrite) without the propagation cascade (the Spark engine owns
rollups once data is ingested).
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from go_whisper_spark.model import AggregationMethod, SeriesConfig

METADATA_FMT = ">LLfL"
ARCHIVE_FMT = ">LLL"
POINT_DTYPE = np.dtype([("interval", ">u4"), ("value", ">f8")])
METADATA_SIZE = struct.calcsize(METADATA_FMT)   # 16
ARCHIVE_SIZE = struct.calcsize(ARCHIVE_FMT)     # 12
POINT_SIZE = POINT_DTYPE.itemsize               # 12

POINTS_SCHEMA = (
    "metric string, archive_id int, seconds_per_point long, "
    "interval long, value double"
)
HEADER_SCHEMA = (
    "metric string, aggregation_method string, max_retention long, "
    "x_files_factor double, n_archives int"
)


def _binary_files(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan of a whisper tree: a directory recurses into all
    ``*.wsp`` below it (Hadoop globs don't expand ``**``); an explicit
    glob/file path is passed through."""
    reader = spark.read.format("binaryFile").option("pathGlobFilter", "*.wsp")
    if os.path.isdir(path):
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def _metric_from_path(path: str, root: str) -> str:
    p = path
    if p.startswith("file:"):
        p = p[len("file:"):]
    rel = os.path.relpath(p, root) if root else os.path.basename(p)
    if rel.endswith(".wsp"):
        rel = rel[: -len(".wsp")]
    return rel.replace(os.sep, ".")


def _parse_header(content: bytes):
    agg, max_ret, xff, n_arch = struct.unpack_from(METADATA_FMT, content, 0)
    archives = []
    for i in range(n_arch):
        off, spp, pts = struct.unpack_from(
            ARCHIVE_FMT, content, METADATA_SIZE + i * ARCHIVE_SIZE
        )
        archives.append((off, spp, pts))
    return agg, max_ret, xff, archives


def read_wsp(spark: SparkSession, path_glob: str, root: str = "") -> DataFrame:
    """All written points of every archive of every ``.wsp`` file under
    ``path_glob`` as ``(metric, archive_id, seconds_per_point, interval,
    value)`` — interval==0 (never-written) slots are excluded.
    [ref: whisper.go (func (*Whisper) Fetch — interval validity check)]
    """
    bf = _binary_files(spark, path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("metric", "archive_id", "seconds_per_point", "interval", "value")}
            for path, content in zip(pdf["path"], pdf["content"]):
                metric = _metric_from_path(str(path), root)
                data = bytes(content)
                _, _, _, archives = _parse_header(data)
                for aid, (off, spp, pts) in enumerate(archives):
                    arr = np.frombuffer(data, dtype=POINT_DTYPE, count=pts, offset=off)
                    mask = arr["interval"] != 0
                    ivals = arr["interval"][mask].astype(np.int64)
                    vals = arr["value"][mask].astype(np.float64)
                    out["metric"].extend([metric] * len(ivals))
                    out["archive_id"].extend([aid] * len(ivals))
                    out["seconds_per_point"].extend([spp] * len(ivals))
                    out["interval"].extend(ivals.tolist())
                    out["value"].extend(vals.tolist())
            yield pd.DataFrame(out)

    return bf.select("path", "content").mapInPandas(parse, schema=POINTS_SCHEMA)


def read_wsp_headers(spark: SparkSession, path_glob: str, root: str = "") -> DataFrame:
    """The catalog view: one row per file with its whisper metadata.
    [ref: whisper.go (func Open — header unpack)]"""
    bf = _binary_files(spark, path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                agg, max_ret, xff, archives = _parse_header(bytes(content))
                rows.append(
                    (
                        _metric_from_path(str(path), root),
                        AggregationMethod(agg).name.lower(),
                        int(max_ret),
                        float(xff),
                        len(archives),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["metric", "aggregation_method", "max_retention",
                         "x_files_factor", "n_archives"],
            )

    return bf.select("path", "content").mapInPandas(parse, schema=HEADER_SCHEMA)


# ---------------------------------------------------------------- writer
def create_wsp(path: str, config: SeriesConfig) -> None:
    """Byte-compatible Create: header + archive table + zeroed rings.
    [ref: whisper.go (func Create)]"""
    archives = config.retentions
    header_size = METADATA_SIZE + ARCHIVE_SIZE * len(archives)
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                METADATA_FMT,
                int(config.aggregation_method),
                config.max_retention,
                config.x_files_factor,
                len(archives),
            )
        )
        offset = header_size
        for r in archives:
            f.write(struct.pack(ARCHIVE_FMT, offset, r.seconds_per_point, r.points))
            offset += r.points * POINT_SIZE
        f.write(b"\x00" * (offset - header_size))


def wsp_write_archive(
    path: str, archive_id: int, points: Iterable[Tuple[int, float]]
) -> None:
    """Ring writes of consolidated values into archive ``archive_id`` —
    the byte-level form of whisper's propagation into lower archives
    [ref: whisper.go (func (*Whisper) propagate — lower-archive
    WriteAt)].  Intervals must already be aligned to the archive's
    ``seconds_per_point``; there is no bounds check because propagate
    consolidates only already-accepted updates.  The caller must write
    at most ``points`` distinct intervals spanning ≤ the archive's
    retention, or ring slots would alias (same constraint the real ring
    enforces by overwriting)."""
    with open(path, "r+b") as f:
        _, _, _, n_arch = struct.unpack(METADATA_FMT, f.read(METADATA_SIZE))
        table = f.read(ARCHIVE_SIZE * n_arch)
        off, spp, pts = struct.unpack_from(
            ARCHIVE_FMT, table, archive_id * ARCHIVE_SIZE
        )
        f.seek(off)
        base_interval = struct.unpack_from(">L", f.read(POINT_SIZE), 0)[0]
        for interval, value in sorted(points):
            interval = int(interval)
            if base_interval == 0:
                base_interval = interval
            slot = ((interval - base_interval) // spp) % pts
            f.seek(off + slot * POINT_SIZE)
            f.write(struct.pack(">Ld", interval, value))


def export_wsp(
    archives, out_dir: str, config: SeriesConfig, now: int
):
    """Distributed ``.wsp`` export sink: one byte-compatible whisper
    file per metric, written inside the Arrow workers — the migration
    path back from the Spark archive store to a whisper file tree (the
    write-side counterpart of ``read_wsp``).

    ``archives``: DataFrame ``(metric, archive_id int, interval long,
    value double)`` — archive 0 rows go through the bounds-checked LWW
    writer (``wsp_update_many``), lower archives through the propagate
    ring writer (``wsp_write_archive``).  One ``applyInPandas`` group
    per metric = one file per task; at 100 TB the shuffle key is the
    metric (whisper's one-file-per-metric layout IS the partitioning),
    and file writes scale with executors.  Returns ``(metric, path,
    n_points)``.

    ``out_dir`` must be a filesystem every executor can reach
    (local[N]/NFS/fuse mount); for object stores, point it at a local
    scratch and upload per group.
    [ref: whisper.go (func Create; func (*Whisper) UpdateMany;
    propagate — lower-archive WriteAt)]
    """
    # Rebuild the config inside the worker from primitives (keeps the
    # closure pickle-stable across Spark/cloudpickle versions).
    defs = ",".join(
        f"{r.seconds_per_point}s:{r.seconds_per_point * r.points}s"
        for r in config.retentions
    )
    method = config.aggregation_method.name.lower()
    xff = config.x_files_factor
    os.makedirs(out_dir, exist_ok=True)

    def _write(key, pdf):
        metric = key[0]
        # path-traversal guard: the metric IS the filename (ValueError,
        # not assert — must survive `python -O` inside executor tasks)
        if os.sep in metric or metric != os.path.basename(metric):
            raise ValueError(f"metric is not a safe filename: {metric!r}")
        cfg = SeriesConfig.from_defs(defs, method, xff)
        path = os.path.join(out_dir, f"{metric}.wsp")
        create_wsp(path, cfg)
        a0 = pdf[pdf["archive_id"] == 0]
        wsp_update_many(
            path, list(zip(a0["interval"].astype(int), a0["value"])), now
        )
        for aid in sorted(int(a) for a in set(pdf["archive_id"]) if a != 0):
            sub = pdf[pdf["archive_id"] == aid]
            wsp_write_archive(
                path, aid, list(zip(sub["interval"].astype(int), sub["value"]))
            )
        return pd.DataFrame(
            [{"metric": metric, "path": path, "n_points": len(pdf)}]
        )

    return archives.groupBy("metric").applyInPandas(
        _write, schema="metric string, path string, n_points long"
    )


def wsp_update_many(
    path: str, points: Iterable[Tuple[int, float]], now: int
) -> None:
    """Finest-archive ring writes with LWW overwrite (test/migration
    fixture writer; rollups belong to the Spark engine).
    [ref: whisper.go (func (*Whisper) Update — slot addressing)]"""
    with open(path, "r+b") as f:
        data = f.read(METADATA_SIZE)
        agg, max_ret, xff, n_arch = struct.unpack(METADATA_FMT, data)
        off, spp, pts = struct.unpack(
            ARCHIVE_FMT, f.read(ARCHIVE_SIZE * n_arch)[:ARCHIVE_SIZE]
        )
        f.seek(off)
        base_interval = struct.unpack_from(">L", f.read(POINT_SIZE), 0)[0]
        for ts, value in sorted(points, key=lambda p: p[0]):
            if ts > now or now - ts >= max_ret:
                continue
            interval = ts - ts % spp
            if base_interval == 0:
                base_interval = interval
            slot = ((interval - base_interval) // spp) % pts
            f.seek(off + slot * POINT_SIZE)
            f.write(struct.pack(">Ld", interval, value))
