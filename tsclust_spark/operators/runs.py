"""Plateau-run detection (stuck-sensor QC) per series.

A sensor that sticks emits the same reading for many consecutive
samples — invisible to every distributional gate in this repo
(z-score, MAD, PSI, CUSUM all see a perfectly in-range value) but a
classic data-quality failure in tier pipelines.  This operator finds,
per key, the LONGEST run of consecutive points whose value is
constant after quantization to ``decimals`` places (quantization
turns "exactly equal doubles" — rare in analog data — into "flat to
measurement precision").

Engine shape: the textbook gaps-and-islands rewrite — the difference
of two ``row_number`` windows (one ordered within the key, one within
(key, quantized value)) is constant exactly along a run — then one
hash aggregate per island and a top-1 window per key.  Entirely
Catalyst expressions: zero Python, window sorts + two Exchanges on
the key, all whole-stage-codegen.  Scales as any grouped window: keys
parallelize, and nothing is ever ordered globally.

Determinism: ties in run length break on earliest ``run_start`` then
smallest ``run_value``; the tiebreak column (``event_id`` here) makes
the row order total under duplicate timestamps, the ADVICE-r3 EWMA
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plateau_runs(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    decimals: int = 0,
) -> DataFrame:
    """``(key, run_value, run_len, run_start, run_end)`` — the longest
    quantized-constant run per key.

    ``run_value`` is the quantized plateau level; ``run_start`` /
    ``run_end`` are the first/last ``ts`` of the run.  Every key with
    at least one non-NULL value yields exactly one row (a run of
    length 1 is still a run).
    """
    q = F.round(F.col(value_col), decimals)
    wk = Window.partitionBy("key").orderBy(ts_col, tiebreak_col)
    wv = Window.partitionBy("key", "run_value").orderBy(
        ts_col, tiebreak_col
    )
    islands = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(tiebreak_col),
            q.alias("run_value"),
        )
        .withColumn(
            "grp",
            F.row_number().over(wk) - F.row_number().over(wv),
        )
        .groupBy("key", "run_value", "grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min(ts_col).alias("run_start"),
            F.max(ts_col).alias("run_end"),
        )
    )
    pick = Window.partitionBy("key").orderBy(
        F.col("run_len").desc(),
        F.col("run_start").asc(),
        F.col("run_value").asc(),
    )
    return (
        islands.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("key", "run_value", "run_len", "run_start", "run_end")
    )


def monotone_runs(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Longest strictly-monotone run per key and direction:
    ``(key, direction, run_len, run_start, run_end)`` with
    ``direction`` in {'up', 'down'}, ``run_len`` counted in POINTS
    (a run of k consecutive increases spans k+1 points).

    The ramp complement of :func:`plateau_runs`: a sensor that only
    ever integrates (a leak, a stuck accumulator) shows an
    implausibly long strict ramp long before any distribution gate
    trips.  Keys with no move in a direction emit no row for it — in
    particular a fully-FLAT key (every adjacent pair equal) emits no
    rows at all: flats are plateau_runs' domain, and the two
    operators partition the adjacent-pair space between them.

    Engine shape: one ``lag`` for the step sign, then the same
    gaps-and-islands two-``row_number`` rewrite as plateau_runs (the
    second row_number partitions by (key, sign), so island ids are
    constant exactly along a same-sign run), one aggregate per
    island, one top-1 window per (key, direction).  Entirely
    Catalyst expressions, zero Python; sign is exact integer logic,
    so island membership is engine-invariant.  A run of L increases
    is L STEP rows; run_len = L + 1 and run_start is the ts of the
    step's predecessor (min over the run of the lagged ts).
    """
    wk = Window.partitionBy("key").orderBy(ts_col, tiebreak_col)
    steps = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(value_col),
        )
        .withColumn("prev_v", F.lag(value_col).over(wk))
        .withColumn("prev_ts", F.lag(ts_col).over(wk))
        .withColumn(
            "sgn",
            F.when(F.col(value_col) > F.col("prev_v"), F.lit(1))
            .when(F.col(value_col) < F.col("prev_v"), F.lit(-1))
            .otherwise(F.lit(0)),
        )
        .filter(F.col("prev_v").isNotNull())
    )
    ws = Window.partitionBy("key", "sgn").orderBy(ts_col, tiebreak_col)
    islands = (
        steps.withColumn(
            "grp", F.row_number().over(
                Window.partitionBy("key").orderBy(ts_col, tiebreak_col)
            ) - F.row_number().over(ws),
        )
        .filter(F.col("sgn") != 0)
        .groupBy("key", "sgn", "grp")
        .agg(
            (F.count(F.lit(1)) + F.lit(1)).alias("run_len"),
            F.min("prev_ts").alias("run_start"),
            F.max(ts_col).alias("run_end"),
        )
    )
    pick = Window.partitionBy("key", "sgn").orderBy(
        F.col("run_len").desc(),
        F.col("run_start").asc(),
    )
    return (
        islands.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            F.when(F.col("sgn") == 1, F.lit("up"))
            .otherwise(F.lit("down"))
            .alias("direction"),
            F.col("run_len").cast("long").alias("run_len"),
            "run_start",
            "run_end",
        )
    )
