"""METS XML source: batch parse + relational page assembly (S5/F7/J1).

The reference's METSParser (REF/cassandra/METSParser.java:204-447) is a
244-line StAX state machine that walks ``fileGrp USE="ocr"`` for
per-page file attrs (ID/SEQ/SIZE/CHECKSUM, FLocat href) and
``structMap TYPE="physical"`` for ordering (div ORDER/ORDERLABEL/LABEL
+ fptr FILEID), then hand-joins them through two HashMaps
(DeltaLogProcessor.java:297-302 build, METSParser.java:375-407 probe).

Spark-native version:

- ``parse_mets`` — ONE Arrow-batched ``mapInPandas`` pass with stdlib
  ``xml.etree`` (bounded memory per batch; the reference's
  never-materialize-DOM concern applies per-document, and METS docs are
  ~1 MB). It emits the two element streams as NORMALIZED ROWS:
  kind='file' rows and kind='div' rows.
- ``pages_table`` — the hash-map build+probe replaced by a real
  equi-join on (volume_id, file_id) (J1), with the reference's
  edge-semantics kept: duplicate file IDs keep the FIRST occurrence
  with a warning counter (METSParser.java:288-290 / ST4), fptrs
  without a matching file drop with a side-channel (inner-join
  semantics of HectorManager.java:508-510).
- ``synthesize_mets`` — deterministic METS-shaped XML generator for
  fixtures (FIXTURES.md discipline: synthesize inputs in the test,
  assert against independently-known values).

The element/attribute vocabulary (fileGrp/USE, file/SEQ/SIZE/CHECKSUM,
FLocat/xlink:href, structMap/TYPE, div/ORDER/ORDERLABEL/LABEL,
fptr/FILEID) is the public METS standard (Library of Congress schema).

Scale notes: parsing is narrow (one pass over xml strings already
partitioned by volume); the page-assembly join shuffles only parsed
attribute rows (≪ xml size); at 10^12 scale the xml column rides the
same partition as its volume row, so the join is map-side after a
co-partitioned read.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .filesystem import clean_volume_id

METS_NS = "http://www.loc.gov/METS/"
XLINK_NS = "http://www.w3.org/1999/xlink"

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("volume_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # file | div | dup_file | header
        T.StructField("file_id", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("seq", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("checksum_type", T.StringType()),
        T.StructField("order", T.IntegerType()),
        T.StructField("order_label", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("features", T.StringType()),
    ]
)


def parse_mets(df: DataFrame, xml_col: str = "mets_xml", id_col: str = "volume_id") -> DataFrame:
    """(volume_id, mets_xml) → normalized element rows (files + divs).

    Only ``fileGrp USE="ocr"`` and ``structMap TYPE="physical"`` are
    emitted (F7, METSParser.java:236-250). Duplicate file IDs within a
    volume produce a ``dup_file`` row for the duplicate (kept out of
    the join; surfaced, not silently dropped)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = f"{{{METS_NS}}}"
        x = f"{{{XLINK_NS}}}"
        for pdf in it:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                vid = str(getattr(r, id_col))
                try:
                    xml = getattr(r, xml_col)
                    if xml is None:
                        raise ValueError("NULL mets_xml")
                    root = ET.fromstring(xml)
                except (ET.ParseError, ValueError, TypeError) as e:
                    # ET raises ValueError (not ParseError) for a str
                    # with an XML encoding declaration — the shape real
                    # METS documents open with — and TypeError for
                    # non-string cells; ALL of them are one-bad-doc
                    # error rows, never job aborts
                    rows.append({"volume_id": vid, "kind": "error", "label": repr(e)})
                    continue
                def _int(v, default=None):
                    try:
                        return int(v)
                    except (TypeError, ValueError):
                        return default

                seen: set[str] = set()
                for grp in root.iter(f"{m}fileGrp"):
                    if grp.get("USE") != "ocr":
                        continue
                    for f_el in grp.iter(f"{m}file"):
                        fid = f_el.get("ID", "")
                        loc = f_el.find(f"{m}FLocat")
                        href = loc.get(f"{x}href", "") if loc is not None else ""
                        kind = "dup_file" if fid in seen else "file"
                        seen.add(fid)
                        # default None, NOT 0: a missing SIZE must
                        # surface as the bad-SIZE error row, not as a
                        # declared size 0 that later fails validation
                        # with a misleading mismatch
                        size = _int(f_el.get("SIZE"))
                        if size is None:
                            # malformed attr → error row, NOT a batch
                            # abort (one bad doc must not kill the job)
                            rows.append(
                                {"volume_id": vid, "kind": "error",
                                 "file_id": fid,
                                 "label": f"bad SIZE {f_el.get('SIZE')!r}"}
                            )
                            continue
                        rows.append(
                            {
                                "volume_id": vid,
                                "kind": kind,
                                "file_id": fid,
                                "filename": href,
                                "seq": f_el.get("SEQ"),
                                "size": size,
                                "checksum": f_el.get("CHECKSUM"),
                                "checksum_type": f_el.get("CHECKSUMTYPE"),
                            }
                        )
                for smap in root.iter(f"{m}structMap"):
                    if smap.get("TYPE") != "physical":
                        continue
                    # each fptr belongs to its NEAREST ORDER-bearing
                    # ancestor div (the reference's StAX parser's
                    # innermost-div association): iterating div.iter()
                    # per div double-counted fptrs under nested
                    # ORDER-bearing divs (one row per ancestor, with
                    # the ancestor's order)
                    parent = {c: p for p in smap.iter() for c in p}
                    for fptr in smap.iter(f"{m}fptr"):
                        div = parent.get(fptr)
                        while div is not None and not (
                            div.tag == f"{m}div" and _int(div.get("ORDER")) is not None
                        ):
                            div = parent.get(div)
                        if div is None:
                            continue
                        rows.append(
                            {
                                "volume_id": vid,
                                "kind": "div",
                                "file_id": fptr.get("FILEID", ""),
                                "order": _int(div.get("ORDER")),
                                "order_label": div.get("ORDERLABEL"),
                                "label": div.get("LABEL"),
                                "features": div.get("LABEL", ""),
                            }
                        )
            out = pd.DataFrame(rows, columns=[f.name for f in PARSED_SCHEMA.fields])
            yield out

    return df.select(id_col, xml_col).mapInPandas(batches, PARSED_SCHEMA)


def pages_table(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """J1: files ⋈ divs on (volume_id, file_id) → page rows; returns
    (pages, orphan_fptrs) — the second frame is the left-anti side
    channel for fptrs whose FILEID matched no ocr file."""
    files = parsed.where(F.col("kind") == "file").select(
        "volume_id", "file_id", "filename", "seq", "size", "checksum", "checksum_type"
    )
    divs = parsed.where(F.col("kind") == "div").select(
        "volume_id", "file_id", "order", "order_label", "label", "features"
    )
    from ..functions import zero_pad_seq

    pages = (
        files.join(divs, ["volume_id", "file_id"], "inner")
        .withColumn("sequence", zero_pad_seq("order"))
        .select(
            "volume_id",
            "file_id",
            "filename",
            "sequence",
            "order",
            "order_label",
            "label",
            "size",
            "checksum",
            "checksum_type",
            "features",
        )
    )
    orphans = divs.join(files, ["volume_id", "file_id"], "left_anti")
    return pages, orphans


def page_count(pages: DataFrame) -> DataFrame:
    """A1: pageCount = max(#by filename, #by id) per volume
    (DeltaLogProcessor.java:365-368)."""
    return pages.groupBy("volume_id").agg(
        F.greatest(
            F.countDistinct("filename"), F.countDistinct("file_id")
        ).alias("page_count")
    )


def synthesize_mets(volume_id: str, n_pages: int, drop_fptr_for: set[int] = frozenset(),
                    dup_file_at: int | None = None, real_content: bool = False) -> str:
    """Deterministic METS-shaped XML for fixtures. ``drop_fptr_for``
    omits structMap entries (orphan-file case); ``dup_file_at``
    duplicates one file element (ST4 duplicate-id case);
    ``real_content=True`` declares SIZE/CHECKSUM of the actual page
    bytes produced by zipsource.make_volume_zip — the end-to-end
    validation fixture."""
    import hashlib

    files = []
    divs = []
    for i in range(1, n_pages + 1):
        fid = f"XML{i:08d}"
        name = f"{clean_volume_id(volume_id)}_{i:08d}.txt"
        if real_content:
            from .zipsource import page_text

            data = page_text(volume_id, i).encode()
            ck = hashlib.md5(data).hexdigest()
            size = len(data)
        else:
            ck = hashlib.md5(f"{volume_id}:{i}".encode()).hexdigest()
            size = 1000 + i
        files.append(
            f'<METS:file SIZE="{size}" ID="{fid}" MIMETYPE="text/plain" '
            f'SEQ="{i:08d}" CHECKSUM="{ck}" CHECKSUMTYPE="MD5">'
            f'<METS:FLocat LOCTYPE="OTHER" xlink:href="{name}"/></METS:file>'
        )
        if dup_file_at == i:
            files.append(files[-1])
        if i not in drop_fptr_for:
            divs.append(
                f'<METS:div ORDER="{i}" ORDERLABEL="p{i}" LABEL="PAGE" TYPE="page">'
                f'<METS:fptr FILEID="{fid}"/></METS:div>'
            )
    return (
        f'<METS:mets xmlns:METS="{METS_NS}" xmlns:xlink="{XLINK_NS}">'
        f'<METS:fileSec><METS:fileGrp ID="FG1" USE="zip archive">'
        f'<METS:file SIZE="1" ID="ZIP1" SEQ="00000001"/></METS:fileGrp>'
        f'<METS:fileGrp ID="FG4" USE="ocr">{"".join(files)}</METS:fileGrp>'
        f"</METS:fileSec>"
        f'<METS:structMap TYPE="logical"><METS:div ORDER="999"/></METS:structMap>'
        f'<METS:structMap TYPE="physical"><METS:div TYPE="volume">'
        f'{"".join(divs)}</METS:div></METS:structMap></METS:mets>'
    )
