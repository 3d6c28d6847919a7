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
invocation per batch. Inside a batch, inherently per-row steps (zlib
decode of variable-size frames, the per-image keyed PRNG) run in a
tight numpy-filling loop; every fixed-size step (the 32×32 DCT phash,
threshold checks, output assembly) is vectorized across the batch
(``codec.phash64_batch``). Measured floor: ~143 µs/row single-process,
of which the contract-mandated expected-pixel PRNG is ~45 µs; the
32-worker host ceiling is ~3x the single-process rate (memory/steal
contention, see BENCH.md). ``bytes`` stays in the partition it was
read in — no shuffle of image content (bounded-shuffle rule); only the
skeleton of the validation result moves.
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
    (image_id, bytes, w, h, fmt, caption, phash, lon, lat).

    Batch structure: the parts that are inherently per-row (zlib decode,
    the per-image keyed PRNG for expected pixels, PSNR over
    variable-size frames) run in a tight loop that only fills numpy
    arrays; everything fixed-size — the 32×32 DCT phash, threshold
    checks, output assembly — is vectorized across the whole Arrow
    batch (``codec.phash64_batch``).

    The declared phash crosses the Arrow→pandas boundary as a STRING
    (``__phash_str``): a nullable int64 column with any null in the
    batch materializes as float64 in pandas, and a 64-bit phash does
    not survive the 53-bit mantissa round-trip — good rows would then
    fail the ``ph == declared`` check."""
    df = df.withColumn("__phash_str", F.col("phash").cast("string"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            ids = pdf["image_id"].astype(str).to_numpy()
            fmts = pdf["fmt"].astype(str).to_numpy()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            lons = pdf["lon"].to_numpy(dtype=np.float64)
            lats = pdf["lat"].to_numpy(dtype=np.float64)
            caps = pdf["caption"].to_numpy()
            decl_ph_str = pdf["__phash_str"]
            blobs = pdf["bytes"].to_numpy()

            shape_ok = np.zeros(n, dtype=bool)
            psnr = np.full(n, np.nan)
            caption_ok = np.zeros(n, dtype=bool)
            decoded = np.zeros(n, dtype=bool)
            errors: list[str | None] = [None] * n
            grays = np.zeros((n, codec._PHASH_SIZE, codec._PHASH_SIZE))
            # null metadata routes to the error channel like any other
            # bad row (the vectorized astype would otherwise fold NaN
            # into INT64_MIN / format into the caption silently)
            meta_null = (
                pdf[["__phash_str", "w", "h", "lon", "lat"]]
                .isna()
                .any(axis=1)
                .to_numpy()
            )
            for i in range(n):
                if meta_null[i]:
                    errors[i] = "null metadata (phash/w/h/lon/lat)"
                    continue
                try:
                    pix = codec.decode_image(bytes(blobs[i]))
                    decoded[i] = True
                    shape_ok[i] = pix.shape == (int(hs[i]), int(ws[i]), 3)
                    if shape_ok[i]:
                        want = _expected_pixels(ids[i], int(ws[i]), int(hs[i]), seed_ns)
                        psnr[i] = codec.psnr_db(pix, want)
                    else:
                        psnr[i] = 0.0
                    caption_ok[i] = (
                        caps[i] == f"caption for {ids[i]} at {lats[i]:.4f},{lons[i]:.4f}"
                    )
                    grays[i] = codec._resize_gray(pix)
                except NotImplementedError as e:  # stubbed formats
                    errors[i] = f"stub: {e}"
                except Exception as e:  # torn bytes → error channel
                    errors[i] = repr(e)

            ph = np.zeros(n, dtype=np.int64)
            if decoded.any():
                ph[decoded] = codec.phash64_batch(grays[decoded])
            # lossless: string → int64, no float64 intermediary
            decl_safe = decl_ph_str.fillna("0").astype(np.int64).to_numpy()
            phash_ok = decoded & ~meta_null & (ph == decl_safe)
            psnr_ok = np.where(
                fmts == "png", np.isinf(psnr), psnr >= PSNR_MIN_DB
            ) & decoded
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "fmt": fmts,
                    "shape_ok": shape_ok,
                    "psnr_db": np.minimum(np.nan_to_num(psnr, nan=np.nan, posinf=1e9), 1e9),
                    "psnr_ok": psnr_ok,
                    "caption_ok": caption_ok,
                    "phash_ok": phash_ok,
                    "phash": ph,
                    "error": errors,
                }
            )

    return df.mapInPandas(batches, VALIDATE_SCHEMA)


def phash_column(df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """(id, phash) from encoded bytes — the ingest-side hash compute."""
    schema = T.StructType(
        [T.StructField(id_col, T.StringType()), T.StructField("phash", T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            blobs = pdf[bytes_col].to_numpy()
            grays = np.zeros((n, codec._PHASH_SIZE, codec._PHASH_SIZE))
            for i in range(n):
                grays[i] = codec._resize_gray(codec.decode_image(bytes(blobs[i])))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str).to_numpy(),
                    "phash": codec.phash64_batch(grays),
                }
            )

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
            blobs = pdf["bytes"].to_numpy()
            thumbs, means, stds = [], [], []
            for i in range(len(pdf)):
                pix = codec.decode_image(bytes(blobs[i]))
                thumbs.append(codec._resize_gray(pix, thumb_size).ravel())
                flat = pix.reshape(-1, 3).astype(np.float64)
                means.append(flat.mean(axis=0))
                stds.append(flat.std(axis=0))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].astype(str).to_numpy(),
                    "thumb": thumbs,
                    "mean_rgb": means,
                    "std_rgb": stds,
                }
            )

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
