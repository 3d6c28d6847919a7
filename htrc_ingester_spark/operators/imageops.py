"""Distributed image decode / validate / feature ops (mapInPandas).

The BASELINE.json input_hint fixes the per-row invariant: decoded-pixel
allclose (PSNR ≥ 40 dB for lossy formats) + caption equality + phash.
This module is the Spark-side plumbing for that contract:

- ``decode_validate``   — batch decode of the ``bytes`` column, shape
  check vs declared (w, h), PSNR vs the deterministic expected pixels,
  caption-template equality, phash recompute vs declared; failures go
  to an error-channel column, never dropped silently (the reference's
  per-page byteCount/checksum discipline, HectorManager.java:451-489,
  verify/Verifier.java:288-333).
- ``phash_column``      — 64-bit DCT perceptual hash per row.
- ``resize_features``   — decode → fixed-size grayscale thumbnail +
  channel stats (the feature-extract step of a multimodal pipeline).
- ``decode_audio`` / ``sample_video_frames`` — clearly-marked STUBS
  (``NotImplementedError``): the container has no codec libs; the
  Spark-side schema/batching contract is real and tested, the codec
  call is one function swap on a real cluster.

All Python work is Arrow-batched ``mapInPandas`` — one Python
invocation per ~64k-row batch, vectorized numpy inside (codec.py);
per-row Python never touches Spark's row loop. ``bytes`` stays in the
partition it was read in — no shuffle of image content (bounded-shuffle
rule); only the skeleton of the validation result moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec

VALIDATE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("shape_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("psnr_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("phash_ok", T.BooleanType()),
        T.StructField("phash", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)

PSNR_MIN_DB = 40.0


def _expected_pixels(image_id: str, w: int, h: int, seed_ns: int) -> np.ndarray:
    """The deterministic ground-truth pixels for a fixture row:
    a per-image PRNG stream keyed by (seed_ns, image_id)."""
    rng = np.random.default_rng(seed_ns ^ codec.hash_surrogate_ns(image_id))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def decode_validate(df: DataFrame, seed_ns: int = 43) -> DataFrame:
    """Per-row decode + full invariant check. Input columns:
    (image_id, bytes, w, h, fmt, caption, phash, lon, lat)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in VALIDATE_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                err = None
                shape_ok = psnr_ok = caption_ok = phash_ok = False
                psnr = float("nan")
                ph = 0
                try:
                    pix = codec.decode_image(bytes(r.bytes))
                    shape_ok = pix.shape == (int(r.h), int(r.w), 3)
                    want = _expected_pixels(str(r.image_id), int(r.w), int(r.h), seed_ns)
                    psnr = codec.psnr_db(pix, want) if shape_ok else 0.0
                    psnr_ok = (psnr == float("inf")) if r.fmt == "png" else (psnr >= PSNR_MIN_DB)
                    lat, lon = float(r.lat), float(r.lon)
                    caption_ok = r.caption == f"caption for {r.image_id} at {lat:.4f},{lon:.4f}"
                    ph = codec.phash64(pix)
                    phash_ok = int(ph) == int(r.phash)
                except NotImplementedError as e:  # stubbed formats
                    err = f"stub: {e}"
                except Exception as e:  # torn bytes → error channel
                    err = repr(e)
                out["image_id"].append(str(r.image_id))
                out["fmt"].append(str(r.fmt))
                out["shape_ok"].append(shape_ok)
                out["psnr_db"].append(float(min(psnr, 1e9)))
                out["psnr_ok"].append(psnr_ok)
                out["caption_ok"].append(caption_ok)
                out["phash_ok"].append(phash_ok)
                out["phash"].append(int(ph))
                out["error"].append(err)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, VALIDATE_SCHEMA)


def phash_column(df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """(id, phash) from encoded bytes — the ingest-side hash compute."""
    schema = T.StructType(
        [T.StructField(id_col, T.StringType()), T.StructField("phash", T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, phs = [], []
            for r in pdf.itertuples(index=False):
                ids.append(str(getattr(r, id_col)))
                phs.append(codec.phash64(codec.decode_image(bytes(getattr(r, bytes_col)))))
            yield pd.DataFrame({id_col: ids, "phash": phs})

    return df.select(id_col, bytes_col).mapInPandas(batches, schema)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("std_rgb", T.ArrayType(T.DoubleType())),
    ]
)


def resize_features(df: DataFrame, thumb_size: int = 8) -> DataFrame:
    """Decode → ``thumb_size``² grayscale thumbnail + channel stats —
    the feature-extraction stage of a multimodal training pipeline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"image_id": [], "thumb": [], "mean_rgb": [], "std_rgb": []}
            for r in pdf.itertuples(index=False):
                pix = codec.decode_image(bytes(r.bytes))
                g = codec._resize_gray(pix, thumb_size)
                rows["image_id"].append(str(r.image_id))
                rows["thumb"].append([float(x) for x in g.ravel()])
                rows["mean_rgb"].append([float(pix[..., c].mean()) for c in range(3)])
                rows["std_rgb"].append([float(pix[..., c].std()) for c in range(3)])
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes").mapInPandas(batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Multimodal stubs — schema/batch contract real, codec stubbed
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(df: DataFrame) -> DataFrame:
    """STUB: audio decode (no audio libs in this container). The
    mapInPandas signature, schema, and batching are the real contract;
    swap the body for soundfile/ffmpeg on a real cluster."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "decode_audio: audio codec not available in this container (stub)"
        )
        yield  # pragma: no cover

    return df.mapInPandas(batches, AUDIO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling (no video libs in this container)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "sample_video_frames: video codec not available in this container (stub)"
        )
        yield  # pragma: no cover

    return df.mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Distributed deterministic fixture generator (for bench/correctness):
# pixels + encoding happen INSIDE the executors, keyed by image_id —
# no driver-side encode loop, no RNG coupling to partitioning.
# ---------------------------------------------------------------------------

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def generate_images(skeleton: DataFrame, seed_ns: int = 43) -> DataFrame:
    """skeleton(image_id, lon, lat) → full images rows with encoded
    bytes + phash, generated deterministically per image_id on the
    executors (the distributed analog of data.images_pdf)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in IMAGES_SCHEMA.fields}
            for r in pdf.itertuples(index=False):
                iid = str(r.image_id)
                hs = codec.hash_surrogate_ns(iid)
                w = 16 + (hs % 49)
                h = 16 + ((hs >> 8) % 49)
                fmt = "png" if (hs >> 16) % 2 == 0 else "jpeg"
                pix = _expected_pixels(iid, w, h, seed_ns)
                data = codec.encode_image(pix, fmt)
                # declared phash is of the STORED content (decode of
                # what was written) — for lossy fmt the quantized
                # pixels, exactly like the reference declares checksums
                # of the bytes it stores, not of a pre-encode stage
                stored_pix = codec.decode_image(data)
                lat, lon = float(r.lat), float(r.lon)
                rows["image_id"].append(iid)
                rows["bytes"].append(data)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append(fmt)
                rows["caption"].append(f"caption for {iid} at {lat:.4f},{lon:.4f}")
                rows["phash"].append(codec.phash64(stored_pix))
                rows["lon"].append(lon)
                rows["lat"].append(lat)
            yield pd.DataFrame(rows)

    return skeleton.mapInPandas(batches, IMAGES_SCHEMA)
