"""Streaming LSH prefilter: ingest-time near-dedup against a static
corpus signature index.

The batch half of this shape is ``d_incremental`` (shard vs corpus);
this is its ingest-time half: documents arrive as a STREAM, the
corpus's LSH band signatures are a precomputed static index (the
table a production pipeline persists once per corpus snapshot), and
each arriving doc is flagged if ANY of its band signatures hits the
index — the standard candidate-generation gate, applied before a doc
is ever admitted to expensive downstream stages.

What this module pins that no other streaming module does: an
Arrow-batched ``mapInPandas`` kernel (tokenize → shingle → MinHash →
band, ``doc_features_frame``) running INSIDE a Structured Streaming
query.  The kernel is stateless per batch, so the stream stays
append-mode with no watermark and no state store; the static index
joins broadcast (stream-static equi-join, hash-probe per micro-batch).

Scale: per-micro-batch cost is one narrow Arrow pass + a broadcast
probe — no shuffle on the stream side at any corpus size; the index
grows with the CORPUS's distinct band signatures (bytes per corpus
doc, broadcast- or shuffle-joinable as it grows, same knobs as any
dimension).  False positives of banding (bucket collision without
true similarity) are the documented LSH trade — the downstream exact
verifier (`d_lsh_pairs`' jaccard stage) stays the arbiter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_whisper_spark.operators.llm_ops import doc_features_frame

HIT_SCHEMA = "doc_id long, band_idx int, band_sig string, hit int"


def corpus_band_index(corpus_docs: DataFrame) -> DataFrame:
    """Distinct (band_idx, band_sig) over the corpus — the static
    signature index.  Batch-side, computed once per corpus snapshot."""
    feats = doc_features_frame(corpus_docs.select("doc_id", "text"))
    return (
        feats.select(F.posexplode("bands").alias("band_idx", "band_sig"))
        .distinct()
    )


def streaming_lsh_prefilter(stream_docs: DataFrame, index: DataFrame) -> DataFrame:
    """stream (doc_id, text) → (doc_id, band_idx, band_sig, hit) rows.

    One row per band of each arriving doc (docs with no shingles —
    under 3 tokens — emit no rows, matching the batch explode); hit=1
    iff the band signature exists in the static index.  Per-doc
    drop/keep is a downstream aggregate — kept OUT of the stream so
    the query needs no state.
    """
    feats = doc_features_frame(stream_docs.select("doc_id", "text"))
    bands = feats.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_sig")
    )
    idx = index.withColumn("hit", F.lit(1))
    return (
        bands.join(F.broadcast(idx), ["band_idx", "band_sig"], "left")
        .select(
            "doc_id",
            "band_idx",
            "band_sig",
            F.coalesce("hit", F.lit(0)).alias("hit"),
        )
    )
