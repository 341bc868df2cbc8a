"""Streaming ADC scorer: online ANN scoring of arriving query vectors
against a persisted PQ-IVF index.

The batch half of this shape is ``s_pq_search`` (route → ADC → rerank
over a static query set); this is its ingest-time half: query vectors
arrive as a STREAM, the PQ-IVF index (cell assignment + 12-bit
codeword reconstructions) and the 8-row centroid table are the
artifacts a production vector store persists once per index build,
and each arriving vector is routed to its top-``n_probe`` cells and
ADC-scored against the probed cells' codes — the online half of a
"score each incoming example against the corpus" serving path.

What this module pins beyond ``st_lsh_prefilter`` (the other
stateless kernel-in-stream module): the routing argmax runs INSIDE
the Arrow kernel against the closure-captured centroid table (8 rows
— the one piece of index state small enough to ship in the task
closure at any corpus size), because per-key rank windows and
aggregates are not available to an append-mode stream; the
corpus-sized index piece joins as a stream-static broadcast probe,
exactly like the prefilter's band index.  Per-query TOP-1 selection
is a downstream batch aggregate, kept OUT of the stream so the query
needs no state store and no watermark — arrival order provably can't
matter, which the 3-pass replay verifies by construction.

Exactness: the kernel computes sims with sequential per-dimension
accumulation (``_seq_dot`` order — bit-identical to the oracle's
``list_sum`` fold and to the expression chain) and ``np.round``
(half-even vs half-up differs only at exact .5e-6 boundaries — the
same verified non-event as every other embedding kernel); ties break
by centroid id ascending, matching ``_ivf_assign``.

Scale: per-micro-batch cost is one narrow Arrow pass + a broadcast
probe + a narrow ADC expression — no shuffle on the stream side; the
index grows with the corpus (12-bit codes + one cell id per vector)
and takes the same dimension-table knobs as any stream-static join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUTED_SCHEMA = "qid long, qn double, qv array<double>, pcell long"


def routed_stream(stream_vecs: DataFrame, cent_rows, n_probe: int = 2) -> DataFrame:
    """stream (vec_id, embedding) → ``n_probe`` routed rows per vector.

    ``cent_rows``: the collected 8-row centroid table [(cid, cv,
    cnorm), …] — control-plane, tiny by construction of the coarse
    quantizer.  Routing = rounded cosine DESC, cid ASC, exactly the
    batch router's key.
    """
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    cn = np.array([r["cnorm"] for r in cent_rows], dtype=np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["embedding"].values).astype(np.float64)
            n = V.shape[0]
            qn = np.zeros(n)
            for j in range(V.shape[1]):
                qn += V[:, j] * V[:, j]
            qn = np.sqrt(qn)
            sims = np.zeros((n, len(cids)))
            for k in range(len(cids)):
                acc = np.zeros(n)
                for j in range(V.shape[1]):
                    acc += V[:, j] * C[k, j]
                sims[:, k] = np.round(acc / (qn * cn[k]), 6)
            qids, qns, qvs, cells = [], [], [], []
            for r in range(n):
                order = np.lexsort((cids, -sims[r]))
                for k in order[:n_probe]:
                    qids.append(int(pdf["vec_id"].iloc[r]))
                    qns.append(float(qn[r]))
                    qvs.append(V[r])
                    cells.append(int(cids[k]))
            yield pd.DataFrame(
                {"qid": qids, "qn": qns, "qv": qvs, "pcell": cells}
            )

    return stream_vecs.mapInPandas(fn, schema=ROUTED_SCHEMA)


def adc_candidates(
    stream_vecs: DataFrame, cent_rows, index: DataFrame, n_probe: int = 2
) -> DataFrame:
    """stream → (qid, vec_id, adc_sim) candidate rows: route in-kernel,
    probe the broadcast index on the cell id, score asymmetrically
    against the codeword reconstruction.  Self-matches excluded, as in
    the batch path."""
    from go_whisper_spark.operators.llm_ops import _dot_expr

    routed = routed_stream(stream_vecs, cent_rows, n_probe)
    return (
        routed.join(
            F.broadcast(index),
            (F.col("pcell") == F.col("cell")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            "vec_id",
            F.round(
                _dot_expr("qv", "rv") / (F.col("qn") * F.col("rnorm")), 6
            ).alias("adc_sim"),
        )
    )
