"""The reference's ENTIRE phase-2 ingest pipeline end to end
(IngestService §3.1): pairtree zips on disk → binaryFile scan → zip
member explode (S6) → METS parse (S5) → filename join (J2) →
byte/checksum validation (J5) → page table + page counts (A1) →
manifested resumable write (S11) — with tamper and orphan cases."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from htrc_ingester_spark import manifest as MF
from htrc_ingester_spark.sources import filesystem as FS
from htrc_ingester_spark.sources import mets as M
from htrc_ingester_spark.sources import zipsource as Z

VOLUMES = [("uc2.ark:/13960/ta", 5), ("uc2.ark:/13960/tb", 3), ("uc2.ark:/13960/tc", 7)]


@pytest.fixture(scope="module")
def tree(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pairtree"))
    rows = [
        (vid, Z.make_volume_zip(vid, n, tamper_page=4 if vid.endswith("tc") else None))
        for vid, n in VOLUMES
    ]
    FS.write_pairtree(spark.createDataFrame(rows, "volume_id string, content binary"), root)
    mets_rows = [(vid, M.synthesize_mets(vid, n, real_content=True)) for vid, n in VOLUMES]
    mets_df = spark.createDataFrame(pd.DataFrame(mets_rows, columns=["volume_id", "mets_xml"]))
    return root, mets_df


def _pipeline(spark, tree):
    root, mets_df = tree
    ids = spark.createDataFrame([(v,) for v, _ in VOLUMES], "volume_id string")
    found, missing = FS.read_pairtree(spark, root, ids)
    zip_pages = Z.explode_zip_pages(found)
    mets_pages, _orphan_fptrs = M.pages_table(M.parse_mets(mets_df))
    joined, unmatched = Z.join_mets_pages(zip_pages, mets_pages)
    ok, bad = Z.validate_pages(joined)
    return missing, zip_pages, joined, unmatched, ok, bad


def test_full_ingest_validates_untampered_volumes(spark, tree):
    missing, zip_pages, joined, unmatched, ok, bad = _pipeline(spark, tree)
    assert missing.count() == 0
    assert zip_pages.where("error is not null").count() == 0
    assert joined.count() == 15  # 5 + 3 + 7 pages
    assert unmatched.count() == 0
    okp = ok.toPandas()
    # ta and tb fully valid; tc has exactly one tampered page
    assert len(okp) == 14
    badp = bad.toPandas()
    assert len(badp) == 1
    assert badp.volume_id.iloc[0] == "uc2.ark:/13960/tc" and badp["order"].iloc[0] == 4
    # the tamper flipped content, not length → byte_count matches,
    # checksum does not (the reference's checksum-not-just-size case)
    assert badp.byte_count.iloc[0] == badp["size"].iloc[0]
    assert badp.md5.iloc[0] != badp.checksum.iloc[0]


def test_page_counts_and_sequences(spark, tree):
    _, _, joined, _, ok, _ = _pipeline(spark, tree)
    pc = M.page_count(joined).toPandas().set_index("volume_id").page_count.to_dict()
    assert pc == {"uc2.ark:/13960/ta": 5, "uc2.ark:/13960/tb": 3, "uc2.ark:/13960/tc": 7}
    seqs = joined.where("volume_id = 'uc2.ark:/13960/tb'").toPandas().sequence
    assert sorted(seqs) == [f"{i:08d}" for i in range(1, 4)]


def test_char_count_equals_byte_count_for_ascii(spark, tree):
    _, zip_pages, _, _, _, _ = _pipeline(spark, tree)
    zp = zip_pages.toPandas()
    assert (zp.char_count == zp.byte_count).all()  # pure-ASCII fixture
    assert not zp.lossy_decode.any()


def test_torn_zip_goes_to_error_channel(spark, tree):
    root, _ = tree
    torn = spark.createDataFrame(
        [("vol.bad", b"PK\x03\x04 this is not a real zip")],
        "volume_id string, content binary",
    )
    out = Z.explode_zip_pages(torn).toPandas()
    assert len(out) == 1 and out.error.iloc[0] is not None


def test_validated_pages_to_manifested_store_and_resume(spark, tree, tmp_path):
    _, _, _, _, ok, _ = _pipeline(spark, tree)
    out = str(tmp_path / "pages")
    pages = ok.select(
        "volume_id", "filename", "sequence", "byte_count", "md5",
        F.pmod(F.xxhash64("volume_id"), F.lit(4)).alias("bucket"),
    )
    stats = MF.write_resumable(
        spark, pages, out, "bucket", commit_seq=1,
        phash_col=None, tile_col=None, id_col="filename",
    )
    assert stats["written"] >= 1 and stats["skipped"] == 0
    assert MF.verify_manifests(spark, out, "bucket", phash_col=None, tile_col=None,
                               id_col="filename").count() == 0
    again = MF.write_resumable(
        spark, pages, out, "bucket", commit_seq=2,
        phash_col=None, tile_col=None, id_col="filename",
    )
    assert again["written"] == 0  # full resume skip


def test_extract_failed_ids_feeds_point_repair(spark):
    """ExtractVIDFromErrorLogs parity: the error channel column yields
    exactly the distinct ids needing re-ingest."""
    import pandas as pd

    from htrc_ingester_spark import ingest as I

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "volume_id": ["a", "b", "b", "c"],
                "error": [None, "torn bytes", "bad checksum", None],
            }
        )
    )
    got = sorted(r.volume_id for r in I.extract_failed_ids(df).collect())
    assert got == ["b"]


def test_repair_roundtrip_pipeline_entry(spark):
    """VERDICT r2 #7: tamper → detect → extract → repair → verify-green
    as ONE pipeline — the catalog entry run end-to-end at sf0.001."""
    from htrc_ingester_spark.plans import catalog

    df = (
        catalog.queries()["ingest_repair_roundtrip"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("stage")["n"]
    )
    assert df["written_partitions"] == 8
    assert df["detected_failures"] == 1  # exactly the tampered bucket
    assert df["repaired_partitions"] == 1
    assert df["repair_verify_failures"] == 0
    assert df["post_repair_failures"] == 0
    assert df["rows_final"] > 0
