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

from pyspark.sql import DataFrame


def adc_candidates(
    stream_vecs: DataFrame, cent_rows, index: DataFrame, n_probe: int = 2
) -> DataFrame:
    """stream → (qid, vec_id, adc_sim) candidate rows: route in-kernel,
    probe the broadcast index on the cell id, score asymmetrically
    against the codeword reconstruction in a second kernel.
    Self-matches excluded.  Batch and stream run LITERALLY the same
    code: ``pq_route_frame`` / ``pq_adc_score`` are the kernels
    ``s_pq_search`` composes, applied here to an unbounded input —
    which is why the streaming result needs no oracle of its own
    beyond the shared ADC CTEs."""
    from go_whisper_spark.operators.llm_ops import pq_adc_score, pq_route_frame

    return pq_adc_score(pq_route_frame(stream_vecs, cent_rows, n_probe), index)
