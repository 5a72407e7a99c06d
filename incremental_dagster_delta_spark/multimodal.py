"""Multimodal column plumbing: opaque binary payloads + typed metadata
(SURVEY.md build brief — image/audio/video as ``binary`` columns).

Design for 100 TB media lakes:

- media are rows of ``(media_id, kind, payload BINARY, meta STRUCT)``;
  payloads never round-trip through Python row-at-a-time — every
  transform is ``mapInPandas`` (Arrow record batches, whole partitions
  streamed through pandas in chunks);
- decode / resize / frame-sample are *per-row independent*, so the plan
  is a single narrow stage: no shuffle, perfectly parallel, and Spark's
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds memory per
  batch regardless of payload size;
- real codecs (PIL / torchaudio / pyav) are not installed in this
  container: ``decode`` falls back to a deterministic fake decoder
  (documented below) and ``resize_images`` interprets payloads as raw
  RGB24 buffers, resampling them with pure-numpy nearest/bilinear
  kernels (PIL is used for decoding only if importable). The Spark-side
  plumbing — schemas, Arrow batching, UDF signatures — and the resize
  math are real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

try:  # real image codec, absent in this container
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

FRAME_BYTES = 128

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, width long, height long"
)
FRAMES_SCHEMA = "media_id long, frame_idx long, frame_bytes long, frame_md5 string"


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from ``documents``: the UTF-8 text bytes
    stand in for an encoded payload. (doc_id, kind, payload, meta)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("container"),
            F.col("n_chars").cast("long").alias("declared_size"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image/audio decoder.

    A real deployment replaces this with PIL/libav; the formulas below
    only exist so tests and oracles can pin the plumbing end-to-end:
    width = 64 + n_bytes mod 256, height = 64 + (n_bytes div 256) mod 256.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": 64 + n % 256,
        "height": 64 + (n // 256) % 256,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Per-media decoded features via Arrow-batched ``mapInPandas``."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if p is None:  # NULL payload: no features, not a crash
                    continue
                f = _fake_decode(bytes(p))
                rows.append((int(mid), kind, f["n_bytes"], f["sha256"], f["width"], f["height"]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "sha256", "width", "height"],
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``extract_features`` on the ``mapInArrow`` path: RecordBatch in,
    RecordBatch out, no pandas materialization. For wide binary payloads
    this skips the Arrow→pandas object-per-row copy that mapInPandas
    pays on the input side — at media-lake scale the payload column IS
    the data volume, so the copy is the cost. Output is bit-identical to
    ``extract_features`` (pinned by test)."""

    def run(batches):
        import pyarrow as pa

        for b in batches:
            payloads = b.column(b.schema.get_field_index("payload"))
            # NULL payloads: no features, not a crash (the module-wide
            # discipline) — filter the batch before decoding
            keep = pa.compute.is_valid(payloads)
            b = b.filter(keep)
            payloads = b.column(b.schema.get_field_index("payload"))
            feats = [_fake_decode(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": b.column(b.schema.get_field_index("media_id")),
                    "kind": b.column(b.schema.get_field_index("kind")),
                    "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
                    "sha256": pa.array([f["sha256"] for f in feats], pa.string()),
                    "width": pa.array([f["width"] for f in feats], pa.int64()),
                    "height": pa.array([f["height"] for f in feats], pa.int64()),
                }
            )

    return media.mapInArrow(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Fixed-stride frame sampling: split each payload into
    ``frame_bytes`` chunks (the video-frame / audio-window shape), one
    output row per frame. Explosion happens inside the Arrow batch — no
    Spark-side explode of binary blobs."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                # empty payload -> zero frames, matching the oracle's
                # range(1, ceil(0/128)+1) = empty (the engine used to emit
                # one empty frame here — a latent hash divergence on
                # empty-text documents)
                for i in range(0, len(data), frame_bytes):
                    chunk = data[i : i + frame_bytes]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i // frame_bytes + 1)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "media_id long, frame_idx long, n_samples long, sum_sq long, zero_crossings long, peak long"
)


def audio_frame_features_bytes(payload: bytes, frame_samples: int = 256) -> list[tuple]:
    """Single-payload PCM frame features, shared by the Spark path and
    tests. Interprets the payload as little-endian int16 PCM (an odd
    trailing byte is dropped), windows it into ``frame_samples`` chunks
    (trailing partial frame kept), and computes per frame: energy
    (Σ s², exact in int64), strict zero crossings (s[i-1]·s[i] < 0 —
    a sample AT zero crosses on neither side), and peak |s|. All-integer
    outputs, so a SQL oracle can replay the DSP exactly. frame_idx is
    1-based, matching :func:`sample_frames`' byte-frame indexing."""
    import numpy as np

    buf = np.frombuffer(payload[: len(payload) // 2 * 2], dtype="<i2").astype(np.int64)
    out = []
    for f in range(0, len(buf), frame_samples):
        v = buf[f : f + frame_samples]
        out.append(
            (
                f // frame_samples + 1,
                int(v.size),
                int(np.sum(v * v)),
                int(np.sum(v[:-1] * v[1:] < 0)),
                int(np.max(np.abs(v))),
            )
        )
    return out


def audio_features(media: DataFrame, frame_samples: int = 256) -> DataFrame:
    """Framed audio features (energy / zero-crossing rate / peak) via the
    same single narrow Arrow-batched ``mapInPandas`` stage as the other
    media transforms: per-row independent, no shuffle. A real deployment
    swaps the int16-PCM interpretation for a codec (libav/torchaudio);
    the framing, numpy kernels, schema, and batch shape are the real
    thing either way — and because every feature is integer arithmetic,
    the kernel is SQL-replayable and the qid is hash-checked rather than
    rows-only."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "media_id", "frame_idx", "n_samples", "sum_sq", "zero_crossings", "peak"
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # NULL payload: no frames, not a crash
                    continue
                for idx, n, ss, zc, pk in audio_frame_features_bytes(
                    bytes(payload), frame_samples
                ):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["n_samples"].append(n)
                    out["sum_sq"].append(ss)
                    out["zero_crossings"].append(zc)
                    out["peak"].append(pk)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").mapInPandas(run, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = "media_id long, width long, height long, payload binary, sha256 string"


def _resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resample of an (H, W, C) uint8 array via integer
    index maps — two fancy-index gathers, no Python pixel loop."""
    import numpy as np

    in_h, in_w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * in_h) // out_h, in_h - 1)
    cols = np.minimum((np.arange(out_w) * in_w) // out_w, in_w - 1)
    return img[rows][:, cols]


def _resize_bilinear(img, out_h: int, out_w: int):
    """Bilinear resample (half-pixel centers, edges clamped) in float64,
    rounded back to uint8 — all vectorized numpy."""
    import numpy as np

    in_h, in_w = img.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * in_h / out_h - 0.5, 0, in_h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * in_w / out_w - 0.5, 0, in_w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def _decode_raw_rgb(payload: bytes) -> "tuple":
    """Container-safe 'decoder': interpret the payload as a raw RGB24
    buffer whose dimensions come from :func:`_fake_decode` (the same
    deterministic metadata the feature path reports), zero-padded or
    truncated to exactly width·height·3 bytes. A real deployment swaps
    this for PIL/libav; everything downstream (batching, kernels,
    schemas) is unchanged."""
    import numpy as np

    meta = _fake_decode(payload)
    h, w = meta["height"], meta["width"]
    buf = np.frombuffer(payload, dtype=np.uint8)
    need = h * w * 3
    if buf.size < need:
        buf = np.concatenate([buf, np.zeros(need - buf.size, dtype=np.uint8)])
    return buf[:need].reshape(h, w, 3), h, w


def resize_image_bytes(payload: bytes, width: int, height: int, method: str = "nearest") -> bytes:
    """Single-payload decode → resize → re-encode (raw RGB24 out). Shared
    by the Spark path and tests so both pin identical bytes."""
    img = None
    if HAS_PIL:  # pragma: no cover - codec absent in this container
        import io

        import numpy as np
        from PIL import Image

        try:
            img = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception:
            # Not a decodable container (this repo's synthetic payloads
            # never are) — fall back to the raw-RGB24 contract so the
            # pinned oracle digests hold whether or not Pillow happens
            # to be installed.
            img = None
    if img is None:
        img, _, _ = _decode_raw_rgb(payload)
    kernel = _resize_bilinear if method == "bilinear" else _resize_nearest
    return kernel(img, height, width).tobytes()


DHASH_SCHEMA = "media_id long, dhash long"
DHASH_GRID_W = 9  # 9x8 luma grid -> 8 horizontal gradients x 8 rows = 64 bits
DHASH_GRID_H = 8


def dhash_bytes(payload: bytes) -> int:
    """64-bit perceptual difference hash (dHash) over the raw-RGB24
    contract, shared by the Spark path, tests, and the pinned oracle.

    All-integer: decode via :func:`_decode_raw_rgb`, integer luma
    (299·R + 587·G + 114·B — comparisons between lumas are
    scale-invariant, so the conventional /1000 is skipped and no
    division or rounding exists anywhere), nearest-downscale the luma
    plane to 9×8 with the same integer index maps as
    :func:`_resize_nearest`, then bit (r·8 + c) = 1 iff
    luma[r, c] < luma[r, c+1] (strict — equal lumas give 0
    deterministically). Returned as a SIGNED 64-bit value matching
    Spark's ``long``. A real deployment swaps the decode for PIL/libav;
    the grid, luma, and gradient stages are the real thing."""
    import numpy as np

    img, _, _ = _decode_raw_rgb(payload)
    luma = (
        299 * img[:, :, 0].astype(np.int64)
        + 587 * img[:, :, 1].astype(np.int64)
        + 114 * img[:, :, 2].astype(np.int64)
    )
    grid = _resize_nearest(luma, DHASH_GRID_H, DHASH_GRID_W)
    bits = grid[:, :-1] < grid[:, 1:]  # 8x8 horizontal gradients
    v = 0
    for k, b in enumerate(bits.flatten()):
        if b:
            v |= 1 << k
    return v - (1 << 64) if v >= 1 << 63 else v


def dhash_features(media: DataFrame) -> DataFrame:
    """(media_id, dhash) for every image row — the same single narrow
    Arrow-batched ``mapInPandas`` stage as the other media transforms:
    per-row independent, no shuffle, NULL payloads skipped (the
    sample_frames/audio_features discipline). Feed the result (renamed
    to the (doc_id, simhash) contract) into ``dedup.hamming_pairs`` for
    near-duplicate-image candidate pairs without an all-pairs product."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, hs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                ids.append(int(mid))
                hs.append(dhash_bytes(bytes(payload)))
            yield pd.DataFrame({"media_id": ids, "dhash": hs})

    return media.where(F.col("kind") == "image").mapInPandas(run, schema=DHASH_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, method: str = "nearest") -> DataFrame:
    """Decode → resize → re-encode each image payload, Arrow-batched.

    Pure-numpy nearest/bilinear kernels (no PIL dependency; PIL is used
    for decoding only if importable). Same single narrow ``mapInPandas``
    stage as the other media transforms: per-row independent, no shuffle,
    memory bounded by the Arrow batch size — at media-lake scale the
    resize cost is embarrassingly parallel.
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:  # NULL payload: nothing to resize, not a crash
                    continue
                r = resize_image_bytes(bytes(p), width, height, method)
                rows.append(
                    (int(mid), width, height, r, hashlib.sha256(r).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload", "sha256"]
            )

    return media.where(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


# --------------------------------------------------------------------------
# Shot-boundary detection (frame differencing)
# --------------------------------------------------------------------------

SHOT_MAD_THRESHOLD = 40  # per-byte mean absolute difference cut
SHOTS_SCHEMA = "media_id long, frame_idx long, sad long, n_aligned long, is_boundary boolean"


def shot_boundaries(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, threshold: int = SHOT_MAD_THRESHOLD
) -> DataFrame:
    """Content-based shot-boundary detection over the fixed-stride frame
    contract (``sample_frames``' chunking): a frame starts a new shot
    when its sum of per-byte absolute differences from the previous
    frame exceeds ``threshold`` per aligned byte — the classic
    frame-differencing detector video pipelines run before per-shot
    sampling, here over the raw-frame contract (a real codec decode
    slots in front without touching the plumbing).

    Per-row independent (each payload carries its own frame sequence),
    so the stage is map-only at any corpus scale: no shuffle, no
    cross-row state. The diff is vectorized numpy inside the Arrow
    batch; all-integer outputs (sad, n_aligned over the aligned prefix
    of consecutive frames) keep it engine-portable and hash-checkable.
    One row per frame with a predecessor; payloads with fewer than two
    frames emit nothing. NULL payloads are skipped (the audio_features
    r11 guard)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "sad": [], "n_aligned": [], "is_boundary": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(1, n_frames):
                    prev = data[(idx - 1) * frame_bytes : idx * frame_bytes]
                    cur = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    n = min(len(prev), len(cur))
                    sad = int(
                        np.abs(prev[:n].astype(np.int16) - cur[:n].astype(np.int16)).sum()
                    )
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx + 1)  # 1-based, matches sample_frames
                    out["sad"].append(sad)
                    out["n_aligned"].append(n)
                    out["is_boundary"].append(sad > threshold * n)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=SHOTS_SCHEMA)
