"""Image pipeline + salting tests: the input_hint per-row invariant
(decode-pixel PSNR ≥ 40 dB, caption equality, phash) and the
salting-changes-nothing contract."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from htrc_ingester_spark.operators import imageops as IO
from htrc_ingester_spark.operators import salting as S


@pytest.fixture(scope="module")
def images(spark):
    skel = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"img{i:06d}" for i in range(60)],
                "lon": [(-180.0 + i * 6.001) % 360 - 180 for i in range(60)],
                "lat": [(-90.0 + i * 2.97) % 180 - 90 for i in range(60)],
            }
        )
    )
    return IO.generate_images(skel).cache()


class TestDecodeValidate:
    def test_all_generated_rows_pass_every_check(self, images):
        out = IO.decode_validate(images).toPandas()
        assert len(out) == 60
        assert out.shape_ok.all() and out.psnr_ok.all()
        assert out.caption_ok.all() and out.phash_ok.all()
        assert out.error.isna().all()
        # lossless PNGs decode exactly; fake-lossy JPEGs in [40, 60) dB
        png = out[out.fmt == "png"]
        jpg = out[out.fmt == "jpeg"]
        assert len(png) and len(jpg)
        assert (png.psnr_db >= 1e8).all()  # inf clamped to 1e9
        assert ((jpg.psnr_db >= 40) & (jpg.psnr_db < 60)).all()

    def test_tampered_phash_caught_not_dropped(self, images):
        bad = images.withColumn(
            "phash",
            F.when(F.col("image_id") == "img000007", F.col("phash") + 1).otherwise(
                F.col("phash")
            ),
        )
        out = IO.decode_validate(bad).toPandas()
        assert len(out) == 60  # error channel, no silent drop
        assert not out[out.image_id == "img000007"].phash_ok.iloc[0]
        assert out[out.image_id != "img000007"].phash_ok.all()

    def test_null_phash_row_does_not_corrupt_batch(self, images):
        # regression (ADVICE r2): one null phash in an Arrow batch used
        # to materialize the declared-phash column as float64, and good
        # rows' 64-bit phashes failed the check after the 53-bit
        # mantissa round-trip. One partition = one batch.
        bad = images.coalesce(1).withColumn(
            "phash",
            F.when(F.col("image_id") == "img000001", F.lit(None)).otherwise(
                F.col("phash")
            ),
        )
        out = IO.decode_validate(bad).toPandas()
        assert len(out) == 60
        nulled = out[out.image_id == "img000001"].iloc[0]
        assert nulled.error is not None and not nulled.phash_ok
        rest = out[out.image_id != "img000001"]
        assert rest.phash_ok.all() and rest.error.isna().all()
        # the regression only bites when a phash exceeds the mantissa
        assert (rest.phash.abs() > 2**53).any()

    def test_torn_bytes_routed_to_error_channel(self, images):
        torn = images.withColumn(
            "bytes",
            F.when(
                F.col("image_id") == "img000003", F.expr("substring(bytes, 1, 10)")
            ).otherwise(F.col("bytes")),
        )
        out = IO.decode_validate(torn).toPandas()
        row = out[out.image_id == "img000003"].iloc[0]
        assert row.error is not None and not row.phash_ok
        assert out[out.image_id != "img000003"].phash_ok.all()

    def test_wrong_caption_fails_equality(self, images):
        bad = images.withColumn(
            "caption",
            F.when(F.col("image_id") == "img000005", F.lit("wrong")).otherwise(
                F.col("caption")
            ),
        )
        out = IO.decode_validate(bad).toPandas()
        assert not out[out.image_id == "img000005"].caption_ok.iloc[0]


class TestGenerateDeterminism:
    def test_identical_across_partitionings(self, spark, images):
        skel = spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [f"img{i:06d}" for i in range(60)],
                    "lon": [(-180.0 + i * 6.001) % 360 - 180 for i in range(60)],
                    "lat": [(-90.0 + i * 2.97) % 180 - 90 for i in range(60)],
                }
            )
        ).repartition(7, "lat")
        again = (
            IO.generate_images(skel)
            .select("image_id", "phash", F.md5("bytes").alias("bmd5"))
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        first = (
            images.select("image_id", "phash", F.md5("bytes").alias("bmd5"))
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(first, again)

    def test_known_phash_vector_pinned(self, images):
        # known-vector discipline (TestUtil.java:64-112): a fixed seed
        # must produce this exact phash forever
        row = images.where("image_id = 'img000000'").select("phash").first()
        expected = IO.codec.phash64(
            IO._expected_pixels(
                "img000000",
                16 + IO.codec.hash_surrogate_ns("img000000") % 49,
                16 + (IO.codec.hash_surrogate_ns("img000000") >> 8) % 49,
                43,
            )
        )
        assert row.phash == expected


class TestResizeFeatures:
    def test_shapes_and_ranges(self, images):
        out = IO.resize_features(images, thumb_size=8).toPandas()
        assert len(out) == 60
        assert all(len(t) == 64 for t in out.thumb)
        assert all(len(m) == 3 and all(0 <= x <= 255 for x in m) for m in out.mean_rgb)


class TestMultimodalStubs:
    def test_audio_stub_raises_clearly(self, spark, images):
        df = images.selectExpr("image_id as media_id", "bytes")
        with pytest.raises(Exception, match="decode_audio.*stub"):
            IO.decode_audio(df).collect()

    def test_video_stub_raises_clearly(self, spark, images):
        df = images.selectExpr("image_id as media_id", "bytes")
        with pytest.raises(Exception, match="sample_video_frames.*stub"):
            IO.sample_video_frames(df).collect()


class TestSalting:
    def test_salted_collect_equals_plain(self, spark):
        # skewed key: 3 hot keys with 500 rows, 50 cold keys with 2
        rows = [(f"hot{i % 3}", str(j * 3 + i)) for i in range(3) for j in range(500)]
        rows += [(f"cold{i}", str(10_000 + i)) for i in range(50)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
        got = (
            S.salted_collect_sorted(df, "k", "v", salt_src="v", rows_per_task=100)
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = (
            df.groupBy("k")
            .agg(F.array_sort(F.collect_list("v")).alias("values"))
            .toPandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.k.tolist() == want.k.tolist()
        for a, b in zip(got["values"], want["values"]):
            assert list(a) == list(b)

    def test_salt_plan_splits_hot_only(self, spark):
        rows = [("hot", str(i)) for i in range(1000)] + [("cold", "x")]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
        plan = S.salt_plan(S.key_histogram(df, "k"), "k", rows_per_task=100).toPandas()
        plan = plan.set_index("k").n_salt.to_dict()
        assert plan["hot"] == 10 and plan["cold"] == 1

    def test_salted_repartition_preserves_rows_and_caps_partition_size(self, spark):
        rows = [("hot", str(i)) for i in range(2000)] + [(f"c{i}", str(i)) for i in range(100)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))
        out = S.salted_repartition(df, "k", salt_src="v", rows_per_task=250, num_partitions=16)
        assert out.count() == 2100
        sizes = out.groupBy(F.spark_partition_id().alias("p")).count().toPandas()
        # the hot key (2000 rows) must be spread: no partition holds it all
        assert sizes["count"].max() < 2000
