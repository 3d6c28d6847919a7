"""Codec + phash + synthetic-data determinism tests (no Spark)."""

import numpy as np
import pytest

from htrc_ingester_spark import codec, data


class TestCodec:
    def test_png_roundtrip_lossless(self):
        rng = np.random.default_rng(0)
        pix = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        out = codec.decode_image(codec.encode_image(pix, "png"))
        np.testing.assert_array_equal(pix, out)

    def test_fake_jpeg_lossy_but_psnr_above_40(self):
        rng = np.random.default_rng(1)
        pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        out = codec.decode_image(codec.encode_image(pix, "jpeg"))
        assert not np.array_equal(pix, out)  # genuinely lossy
        assert codec.psnr_db(pix, out) >= 40.0
        assert np.abs(pix.astype(int) - out.astype(int)).max() <= 3

    def test_unknown_format_is_explicit_stub(self):
        with pytest.raises(NotImplementedError):
            codec.encode_image(np.zeros((4, 4, 3), np.uint8), "webp")

    def test_psnr_identical_inf(self):
        pix = np.zeros((8, 8, 3), np.uint8)
        assert codec.psnr_db(pix, pix) == float("inf")


class TestPhash:
    def test_deterministic_known_vector(self):
        rng = np.random.default_rng(42)
        pix = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        h1 = codec.phash64(pix)
        h2 = codec.phash64(pix.copy())
        assert h1 == h2
        assert isinstance(h1, int)
        assert -(2**63) <= h1 < 2**63

    def test_robust_to_lossy_quantization(self):
        rng = np.random.default_rng(5)
        # natural-image-like low-frequency field: coarse random blocks,
        # smoothly upsampled — pHash's design target (a pure gradient is
        # pathological: every AC coefficient sits at the median)
        coarse = rng.uniform(0, 255, (6, 6))
        field = np.kron(coarse, np.ones((8, 8)))
        pix = np.stack([field] * 3, axis=-1).astype(np.uint8)
        lossy = codec.decode_image(codec.encode_image(pix, "jpeg"))
        assert codec.hamming64(codec.phash64(pix), codec.phash64(lossy)) <= 6

    def test_distinct_images_differ(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        assert codec.hamming64(codec.phash64(a), codec.phash64(b)) > 10


class TestSyntheticData:
    def test_seed_stability(self):
        a = data.images_meta_pdf(200, seed=42)
        b = data.images_meta_pdf(200, seed=42)
        assert a.equals(b)
        c = data.images_meta_pdf(200, seed=43)
        assert not a.lon.equals(c.lon)

    def test_images_bytes_validate(self):
        df = data.images_pdf(20, seed=42)
        for i in range(len(df)):
            pix = codec.decode_image(df.bytes[i])
            # decoded shape matches declared w/h (the validation-join invariant)
            assert pix.shape == (df.h[i], df.w[i], 3)
            if df.fmt[i] == "png":
                assert codec.phash64(pix) == df.phash[i]
            else:
                assert codec.psnr_db(pix, pix) == float("inf")

    def test_polygon_kinds_complete(self):
        kinds = {p["kind"] for p in data.polygons()}
        assert kinds >= {"simple", "concave", "antimeridian", "polar_cap", "degenerate", "boundary"}

    def test_hot_skew_present(self):
        from htrc_ingester_spark.geo import h3lite as H

        pdf = data.images_meta_pdf(2000, seed=42)
        cells = H.latlng_to_cell(pdf.lat.to_numpy(), pdf.lon.to_numpy(), 7)
        _, counts = np.unique(cells, return_counts=True)
        # hot-cell skew: top cell should hold far more than uniform share
        assert counts.max() > 50
