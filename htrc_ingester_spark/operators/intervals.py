"""Interval overlap join — the 1-D temporal analog of bbox_join
(incident windows × user sessions, ad flights × impressions, sensor
outages × trajectory legs).

Semantics: half-open overlap ``a.s < b.e AND b.s < a.e`` on bigint
MICROSECOND epochs (``unix_micros`` / ``epoch_us`` agree exactly —
never float seconds, which drift between engines). Zero-length
intervals therefore overlap nothing — document points as [t, t+1).

Plan: each interval explodes to the fixed-width time bins it covers
(one ``sequence`` per row, map-side); ONE (bin) equi-join pairs
co-binned intervals; the exact predicate filters; and the
REFERENCE-BIN rule — emit only from the bin containing
``greatest(a.s, b.s)``, i.e. the overlap's left edge — makes each
qualifying pair appear exactly once with NO distinct (same discipline
as bbox_join's reference point and segments' reference cell).

Scale: shuffle = one equi-join keyed by time bin; fan-out per row =
``duration/bin_us + 1``. Pick ``bin_us`` near the typical interval
length (auto: the max of both sides' p50 durations would do; here the
caller passes it — the radius_res knob discipline). Hot bins (flash
events) are the AQE skew-join case. Long-tail intervals (one row
covering months) fan out wide — split them upstream, the same contract
as antimeridian-crossing segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _binned(df: DataFrame, bin_us: int, prefix: str) -> DataFrame:
    return df.select(
        F.col("id").alias(f"{prefix}id"),
        F.col("s").alias(f"{prefix}s"),
        F.col("e").alias(f"{prefix}e"),
        F.explode(
            F.expr(f"sequence(s div {bin_us}, (e - 1) div {bin_us})")
        ).alias("bin"),
    )


def interval_join(a: DataFrame, b: DataFrame, bin_us: int) -> DataFrame:
    """a, b: (id, s, e) with bigint microsecond epochs, s < e.
    Returns (a_id, b_id, overlap_us) for every overlapping pair,
    exactly once, overlap_us > 0."""
    aa = _binned(a, bin_us, "a_")
    bb = _binned(b, bin_us, "b_")
    ref = F.expr(f"greatest(a_s, b_s) div {bin_us}")
    return (
        aa.join(bb, "bin")
        .where((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .where(F.col("bin") == ref)  # reference bin: no distinct needed
        .select(
            "a_id",
            "b_id",
            (
                F.least(F.col("a_e"), F.col("b_e"))
                - F.greatest(F.col("a_s"), F.col("b_s"))
            ).alias("overlap_us"),
        )
    )
