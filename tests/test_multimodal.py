"""Multimodal plumbing tests: binary schema, Arrow batch shapes, frame
reassembly, and the gated real-codec path."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType, StructType

from incremental_dagster_delta_spark.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)
from incremental_dagster_delta_spark.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(load_table(spark, sf_dir, "documents").limit(50)).persist()


def test_media_schema_is_binary(media):
    schema: StructType = media.schema
    assert isinstance(schema["payload"].dataType, BinaryType)
    assert isinstance(schema["media_id"].dataType, LongType)
    assert isinstance(schema["kind"].dataType, StringType)
    meta = schema["meta"].dataType
    assert {f.name for f in meta.fields} == {"container", "declared_size"}


def test_features_match_local_hash(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    for row in media.collect():
        payload = bytes(row["payload"])
        f = feats[row["media_id"]]
        assert f["n_bytes"] == len(payload)
        assert f["sha256"] == hashlib.sha256(payload).hexdigest()
        assert f["width"] == 64 + len(payload) % 256


def test_frames_reassemble_payload(media):
    frames = sample_frames(media, frame_bytes=64).collect()
    by_media: dict[int, list] = {}
    for fr in frames:
        by_media.setdefault(fr["media_id"], []).append(fr)
    for row in media.collect():
        payload = bytes(row["payload"])
        chunks = sorted(by_media[row["media_id"]], key=lambda r: r["frame_idx"])
        # frame sizes sum to the payload and indexes are dense from 1
        assert [c["frame_idx"] for c in chunks] == list(range(1, len(chunks) + 1))
        assert sum(c["frame_bytes"] for c in chunks) == len(payload)
        # each frame hash matches the corresponding byte slice
        for i, c in enumerate(chunks):
            assert c["frame_md5"] == hashlib.md5(payload[i * 64 : (i + 1) * 64]).hexdigest()


def test_resize_shapes_and_determinism(media):
    """resize_images emits exactly width*height*3 raw RGB bytes per image
    row, matching the shared single-payload kernel byte-for-byte."""
    from incremental_dagster_delta_spark.multimodal import resize_image_bytes

    out = resize_images(media, 8, 6).collect()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.where(F.col("kind") == "image").collect()}
    assert len(out) == len(src) > 0
    for r in out:
        assert (r["width"], r["height"]) == (8, 6)
        payload = bytes(r["payload"])
        assert len(payload) == 8 * 6 * 3
        assert payload == resize_image_bytes(src[r["media_id"]], 8, 6)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()


def test_resize_kernels_known_values():
    """Pin the numpy kernels against hand-computed expectations."""
    import numpy as np

    from incremental_dagster_delta_spark.multimodal import _resize_bilinear, _resize_nearest

    # 2x2 -> 4x4 nearest: each source pixel becomes a 2x2 block
    img = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    up = _resize_nearest(img, 4, 4)[:, :, 0]
    assert up.tolist() == [[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30], [20, 20, 30, 30]]
    # 4x4 -> 2x2 nearest picks rows/cols 0 and 2
    big = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    down = _resize_nearest(big, 2, 2)[:, :, 0]
    assert down.tolist() == [[0, 2], [8, 10]]
    # bilinear identity resize is a no-op
    assert (_resize_bilinear(big, 4, 4) == big).all()
    # 2x1 -> 3x1 bilinear with half-pixel centers: y coords 0, 1/6... ->
    # samples at clip((i+0.5)*2/3-0.5) = [0, 0.5, 1] -> values 0, 15, 30
    col = np.array([[[0]], [[30]]], dtype=np.uint8)
    tri = _resize_bilinear(col, 3, 1)[:, 0, 0]
    assert tri.tolist() == [0, 15, 30]


def test_resize_bad_method_rejected(media):
    with pytest.raises(ValueError):
        resize_images(media, 8, 8, method="bicubic")


def test_features_distributed_plan(media):
    """The mapInPandas stage must not shuffle: one narrow stage over the
    scan."""
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_arrow_path_matches_pandas_path(spark, sf_dir):
    """mapInArrow and mapInPandas feature extraction are bit-identical
    — the Arrow path just skips the pandas materialization of the
    payload column."""
    from incremental_dagster_delta_spark.multimodal import (
        extract_features,
        extract_features_arrow,
        synth_media,
    )
    from incremental_dagster_delta_spark.tables import load_table

    media = synth_media(load_table(spark, sf_dir, "documents"))
    a = sorted(map(tuple, extract_features(media).collect()))
    b = sorted(map(tuple, extract_features_arrow(media).collect()))
    assert a == b and len(a) > 0


# --- audio frame features ----------------------------------------------------


def _audio_python_reference(payload: bytes, frame: int):
    """Loop-and-int reference, independent of the numpy kernel."""
    import struct

    n = len(payload) // 2 * 2
    samples = [struct.unpack_from("<h", payload, i)[0] for i in range(0, n, 2)]
    out = []
    for f0 in range(0, len(samples), frame):
        v = samples[f0 : f0 + frame]
        zc = sum(1 for i in range(1, len(v)) if v[i - 1] * v[i] < 0)
        out.append(
            (f0 // frame + 1, len(v), sum(x * x for x in v), zc, max(abs(x) for x in v))
        )
    return out


def test_audio_kernel_matches_python_reference():
    """Random payloads incl. odd byte counts and a trailing partial
    frame; int16 extremes included so the |int16 min| edge is covered."""
    import random

    from incremental_dagster_delta_spark.multimodal import audio_frame_features_bytes

    rng = random.Random(20260815)
    cases = [
        b"",  # no samples -> no frames
        b"\x01",  # single odd byte dropped -> no frames
        (-32768).to_bytes(2, "little", signed=True) * 10,  # int16 min peak
    ]
    for _ in range(20):
        n = rng.randrange(0, 900)
        cases.append(bytes(rng.randrange(256) for _ in range(n)))
    for payload in cases:
        for frame in (7, 64, 256):
            assert audio_frame_features_bytes(payload, frame) == _audio_python_reference(
                payload, frame
            ), (len(payload), frame)


def test_audio_corpus_plumbing(media, spark):
    """The corpus-shaped run (synth_media audio rows as fake PCM) must
    produce one row per frame with the kernel's exact values — the same
    end-to-end pin the image path gets from test_features_match_local_hash."""
    from incremental_dagster_delta_spark.multimodal import (
        audio_features,
        audio_frame_features_bytes,
    )

    rows = audio_features(media, frame_samples=64).collect()
    local = {}
    for r in media.where(F.col("kind") == "audio").select("media_id", "payload").collect():
        for idx, n, ss, zc, pk in audio_frame_features_bytes(bytes(r["payload"]), 64):
            local[(r["media_id"], idx)] = (n, ss, zc, pk)
    assert len(rows) == len(local) > 0
    for r in rows:
        assert local[(r["media_id"], r["frame_idx"])] == (
            r["n_samples"],
            r["sum_sq"],
            r["zero_crossings"],
            r["peak"],
        )


def test_frame_sample_empty_payload_yields_no_frames(spark):
    """Empty payload -> zero frames (matching the oracle's empty range);
    NULL payload rows are skipped rather than crashing the Arrow task."""
    media = spark.createDataFrame(
        [(1, "image", b"", None), (2, "image", None, None), (3, "image", b"ab", None)],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )
    rows = sample_frames(media).collect()
    assert {r["media_id"] for r in rows} == {3}
    assert rows[0]["frame_bytes"] == 2


def test_audio_features_null_and_empty_payload(spark):
    """audio_features mirrors sample_frames' NULL discipline: a NULL
    payload yields zero frames instead of killing the Arrow task
    (ADVICE r9 low, fixed r11); an empty payload yields zero frames; a
    sub-sample payload (1 byte, dropped as an odd trailing byte) also
    yields zero frames."""
    from incremental_dagster_delta_spark.multimodal import audio_features

    media = spark.createDataFrame(
        [
            (1, "audio", None, None),
            (2, "audio", b"", None),
            (3, "audio", b"\x01", None),
            (4, "audio", b"\x01\x00\xff\xff\x02\x00\xfe\xff", None),
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )
    rows = audio_features(media, frame_samples=4).collect()
    assert {r["media_id"] for r in rows} == {4}
    (r,) = rows
    # samples 1, -1, 2, -2: energy 1+1+4+4, three strict sign flips, peak 2
    assert (r["n_samples"], r["sum_sq"], r["zero_crossings"], r["peak"]) == (4, 10, 3, 2)


def test_dhash_kernel_properties():
    """dHash invariants on raw payloads: deterministic, 64-bit signed
    range, exact-duplicate payloads collide, a one-grid-cell patch edit
    moves ≤ 2 bits (the two gradients that touch the cell), and the
    empty payload (all-zero image → no strict gradient anywhere) is 0."""
    from incremental_dagster_delta_spark.multimodal import dhash_bytes
    from incremental_dagster_delta_spark.queries.multimodal_q import (
        _dhash_patch,
        _dhash_texture,
    )

    base = _dhash_texture(21504, 3)
    h = dhash_bytes(base)
    assert h == dhash_bytes(bytes(base))
    assert -(1 << 63) <= h < (1 << 63)
    edited = dhash_bytes(_dhash_patch(base, 7160, 24, 120))
    assert bin((h ^ edited) & ((1 << 64) - 1)).count("1") <= 2
    assert dhash_bytes(b"") == 0


def test_dhash_corpus_plumbing_and_planted_recall(spark, media):
    """Corpus-shaped run: synth_media image rows plus PLANTED
    near-duplicate images (patch edits of real rows) through
    dhash_features → hamming_pairs. Every planted near-duplicate must
    be recalled as a pair with its source (the pigeonhole guarantee is
    exact for Hamming ≤ budget, so recall of planted pairs is 1.0, not
    probabilistic), and the per-row fingerprints must equal the local
    kernel exactly."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.multimodal import dhash_bytes, dhash_features
    from incremental_dagster_delta_spark.queries.dedup import hamming_pairs
    from incremental_dagster_delta_spark.tables import literal_df

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload").collect()
    assert len(imgs) > 5
    # plant: byte-0 patch (identity edit? no - +128 on the first 12 bytes)
    planted_rows = []
    expected_pairs = set()
    local = {}
    for r in imgs:
        payload = bytes(r["payload"])
        local[r["media_id"]] = dhash_bytes(payload)
    for r in imgs[:5]:
        src = bytes(r["payload"])
        edit = bytes([(src[0] + 128) % 256]) + src[1:] if len(src) > 1 else src
        pid = 100000 + r["media_id"]
        planted_rows.append((pid, "image", edit, None))
        if bin((local[r["media_id"]] ^ dhash_bytes(edit)) & ((1 << 64) - 1)).count("1") <= 4:
            expected_pairs.add((r["media_id"], pid))
        local[pid] = dhash_bytes(edit)
    planted = literal_df(
        spark,
        planted_rows,
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )
    allmedia = media.select("media_id", "kind", "payload", "meta").unionByName(planted)
    fps = dhash_features(allmedia)
    got_fp = {r["media_id"]: r["dhash"] for r in fps.collect()}
    assert got_fp == local  # Spark stage == local kernel, bit-exact
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in hamming_pairs(
            fps.select(F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash"))
        ).collect()
    }
    assert expected_pairs, "at least some planted edits must land within budget"
    assert expected_pairs <= pairs  # planted recall = 1.0 within budget


def test_shot_boundaries_planted_cut(spark):
    """Planted shot cut: two near-identical 4-byte frames followed by a
    radically different one — the detector must flag exactly the planted
    cut, compute the SAD the hand calculation gives, keep NULL/empty
    payloads from crashing the stage, and handle a short trailing frame
    over the aligned prefix only."""
    from incremental_dagster_delta_spark.multimodal import shot_boundaries

    #                 frame1          frame2          frame3        tail(2B)
    p = bytes([10, 20, 30, 40] + [11, 20, 30, 41] + [200, 0, 255, 100] + [201, 1])
    media = spark.createDataFrame(
        [(1, "video", p, None), (2, "video", None, None), (3, "video", b"", None)],
        "media_id long, kind string, payload binary, "
        "meta struct<container: string, declared_size: long>",
    )
    rows = {
        r["frame_idx"]: r
        for r in shot_boundaries(media, frame_bytes=4, threshold=40).collect()
    }
    assert set(rows) == {2, 3, 4} and all(r["media_id"] == 1 for r in rows.values())
    # frame2 vs frame1: |11-10|+0+0+|41-40| = 2 over 4 bytes -> no cut
    assert (rows[2]["sad"], rows[2]["n_aligned"], rows[2]["is_boundary"]) == (2, 4, False)
    # frame3 vs frame2: 189+20+225+59 = 493 > 40*4 -> planted cut
    assert (rows[3]["sad"], rows[3]["n_aligned"], rows[3]["is_boundary"]) == (493, 4, True)
    # tail vs frame3: aligned prefix 2 bytes, |201-200|+|1-0| = 2 -> no cut
    assert (rows[4]["sad"], rows[4]["n_aligned"], rows[4]["is_boundary"]) == (2, 2, False)


def test_hamming_probe_equals_filtered_symmetric_pairs(spark):
    """The asymmetric batch×corpus probe must return exactly the
    cross-side subset of the symmetric pair join over the union
    fingerprint table — same candidates, same Hamming values, and
    never a corpus×corpus or batch×batch pair."""
    from pyspark.sql import functions as F

    from incremental_dagster_delta_spark.queries.dedup import hamming_pairs, hamming_probe
    from incremental_dagster_delta_spark.tables import literal_df

    corpus = [(0, 0x0123456789ABCDEF), (1, 0x0123456789ABCDEE), (2, -0x7FF8123456789ABC)]
    batch = [(100, 0x0123456789ABCDCF), (101, 0x7EDCBA9876543210)]
    cdf = literal_df(spark, corpus, "doc_id long, simhash long")
    bdf = literal_df(spark, batch, "doc_id long, simhash long")

    got = {
        (r["batch_id"], r["corpus_id"]): r["hamming"]
        for r in hamming_probe(cdf, bdf).collect()
    }
    sym = {
        (r["doc_b"], r["doc_a"]): r["hamming"]
        for r in hamming_pairs(cdf.unionByName(bdf)).collect()
        if r["doc_b"] >= 100 and r["doc_a"] < 100
    }
    assert got == sym and got  # non-vacuous: at least one planted hit
    assert all(b >= 100 and c < 100 for b, c in got)


def test_feature_transforms_skip_null_payloads(spark):
    """r15 review: extract_features / extract_features_arrow /
    resize_images must skip NULL payloads like every sibling transform
    (the module-wide 'no frames, not a crash' discipline), not die on
    bytes(None)."""
    from incremental_dagster_delta_spark.multimodal import (
        extract_features,
        extract_features_arrow,
        resize_images,
    )

    rows = [(1, "image", bytearray(b"\x01\x02" * 300)), (2, "image", None)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    assert [r["media_id"] for r in extract_features(media).collect()] == [1]
    assert [r["media_id"] for r in extract_features_arrow(media).collect()] == [1]
    assert [r["media_id"] for r in resize_images(media, 4, 4).collect()] == [1]
