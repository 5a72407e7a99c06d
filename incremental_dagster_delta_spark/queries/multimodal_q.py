"""Multimodal qids: oracle checks for the binary-column plumbing.

The payloads are the documents' ASCII text bytes (deterministic synth in
``multimodal.synth_media``), so byte-level hashes computed in the
``mapInPandas`` path equal string-level hashes the SQL oracle can
compute — the oracle pins the Arrow plumbing end-to-end, not just row
counts.
"""

from __future__ import annotations

from incremental_dagster_delta_spark.multimodal import extract_features, sample_frames, synth_media
from incremental_dagster_delta_spark.queries.registry import query, t


@query(
    "q_multimodal_features",
    tags=("multimodal", "llm"),
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(length(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(64 + length(text) % 256 AS BIGINT) AS width,
           CAST(64 + (length(text) // 256) % 256 AS BIGINT) AS height
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Binary payload → decoded feature row via Arrow-batched
    mapInPandas (deterministic fake decoder; see multimodal._fake_decode)."""
    return extract_features(synth_media(t(spark, sf_dir, "documents")))


@query(
    "q_frame_sample",
    tags=("multimodal", "llm"),
    oracle="""
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(length(substring(text, (i - 1) * 128 + 1, 128)) AS BIGINT) AS frame_bytes,
           md5(substring(text, (i - 1) * 128 + 1, 128)) AS frame_md5
    FROM documents,
         UNNEST(range(1, CAST(ceil(length(text) / 128.0) AS BIGINT) + 1)) AS tt(i)
    """,
)
def q_frame_sample(spark, sf_dir):
    """Fixed-stride frame sampling of binary payloads (128-byte frames),
    one row per frame, hashed per frame inside the Arrow batch."""
    return sample_frames(synth_media(t(spark, sf_dir, "documents")))


@query("q_media_resize", tags=("multimodal", "llm"), oracle=None)
def q_media_resize(spark, sf_dir):
    """Image resize over the media table (raw-RGB24 contract, pure-numpy
    nearest-neighbor kernel inside one narrow mapInPandas stage — see
    multimodal.resize_images). Rows-only: the resampled bytes depend on
    the numpy kernel, which the SQL oracle cannot reproduce; kernel
    outputs are pinned against hand-computed values in
    tests/test_multimodal.py instead."""
    from incremental_dagster_delta_spark.multimodal import resize_images, synth_media
    from incremental_dagster_delta_spark.queries.registry import t as _t

    media = synth_media(_t(spark, sf_dir, "documents"))
    return resize_images(media, 16, 12).select("media_id", "width", "height", "sha256")
