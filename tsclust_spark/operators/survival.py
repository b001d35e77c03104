"""Kaplan-Meier survival estimation over user lifetimes.

Kaplan & Meier (JASA 53:457, 1958 — public literature): the
nonparametric survival curve under right-censoring,

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

where at each distinct event time ``t_i``, ``d_i`` users churned and
``n_i`` were still at risk.  Censoring is what distinguishes this
from a histogram of lifetimes: users still active at the dataset's
edge haven't churned — they leave the risk set WITHOUT counting as
deaths, which a naive "days active" histogram gets wrong for every
recent cohort.  The survival complement of cohort_retention: the
retention triangle averages cohorts at fixed offsets, KM pools
everyone into one properly-censored curve.

Lifetime and churn here are defined from the event log itself:
``duration`` = days from a user's first to last activity; a user is a
CHURN EVENT if their last activity is at least ``churn_gap_days``
before the dataset's last day (they had time to return and didn't),
else right-CENSORED (the window ended first).

Engine shape: one (user) aggregate for first/last day, one 1-row
dataset-max broadcast, one (duration) aggregate for the d/c counts,
an ordered cumulative window for the risk set, and the product as
``exp(cumsum(ln(1 - d/n)))`` — products are not a SQL aggregate, the
log-sum rewrite is the standard exact-enough bridge (per-term 1-ulp
log error over <= #distinct-durations terms, far below 6-dp gates).
All Catalyst, zero Python, everything after the first aggregate is
user- or duration-cardinality scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    churn_gap_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(duration_days, n_risk, n_events, n_censored, survival)`` —
    one row per distinct observed duration (event or censoring),
    ascending; ``survival`` is S(duration) AFTER that time's events.

    ``n_risk`` counts users with duration >= this one (standard KM
    convention: censorings at the same time stay at risk for that
    time's events).
    """
    ud = (
        df.select(
            F.col(user_col).alias("user"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .distinct()
    )
    span = ud.groupBy("user").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    data_end = ud.agg(F.max("day").alias("_end"))
    life = (
        span.join(F.broadcast(data_end))
        .select(
            F.datediff("last_day", "first_day")
            .cast("long")
            .alias("duration_days"),
            (
                F.datediff("_end", "last_day") >= churn_gap_days
            ).alias("_event"),
        )
    )
    per_t = life.groupBy("duration_days").agg(
        F.sum(F.col("_event").cast("long")).alias("n_events"),
        F.sum((~F.col("_event")).cast("long")).alias("n_censored"),
    )
    w_risk = Window.orderBy(F.col("duration_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_surv = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = per_t.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_risk),
    )
    # S(t) = exp(sum(ln(1 - d/n))) over event times <= t; times with
    # zero events contribute ln(1) = 0 exactly.  The absorbing case
    # d == n (everyone at risk churns) is handled EXPLICITLY: Spark's
    # log(0) is NULL (silently skipped by the window sum -> survival
    # would wrongly stay positive) while DuckDB's ln(0) is -inf — so
    # both sides carry a "curve hit zero" flag instead of ln(0).
    frac = (
        F.col("n_events").cast("double")
        / F.col("n_risk").cast("double")
    )
    term = F.when(
        F.col("n_events") < F.col("n_risk"), F.log(F.lit(1.0) - frac)
    ).otherwise(F.lit(0.0))
    dead = F.max(
        (F.col("n_events") == F.col("n_risk")).cast("int")
    ).over(w_surv)
    # Nelson-Aalen cumulative hazard rides the same window for free:
    # H(t) = sum_{t_i <= t} d_i / n_i (the additive twin of KM; its
    # exp(-H) is the Fleming-Harrington survival estimate)
    return (
        at_risk.withColumn(
            "survival",
            F.when(dead == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(term).over(w_surv))
            ),
        )
        .withColumn("cum_hazard", F.sum(frac).over(w_surv))
        .select(
            "duration_days",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_censored").cast("long").alias("n_censored"),
            "survival",
            "cum_hazard",
        )
    )


def logrank_test(
    df: DataFrame,
    group_expr=None,
    churn_gap_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966 / Peto & Peto 1972,
    public literature): do two user segments have the SAME survival
    curve?  One row ``(n_g0, n_g1, observed_g1, expected_g1,
    variance_g1, chi2)`` — chi2 ~ chi-square(1) under the null; ~3.84
    is the 5% line.

    ``group_expr`` is a boolean Column over the per-user span frame
    — columns ``user``, ``first_day``, ``last_day`` (plus the
    broadcast ``_start``/``_end`` bounds) — group 1 where true;
    default: users whose FIRST event day is in the first half of the
    dataset (early vs late adopters).  Computed
    from the same censored lifetimes as :func:`kaplan_meier`; at each
    distinct event time t the hypergeometric moments accumulate

        E1 += d_t * n1_t / n_t
        V  += d_t * (n1_t/n_t) * (1 - n1_t/n_t) * (n_t - d_t)/(n_t - 1)

    and ``chi2 = (O1 - E1)^2 / V``.  Everything up to the final
    ratios is exact integer arithmetic over duration-cardinality
    rows; the engine shape is the KM plan with a group dimension.
    """
    ud = (
        df.select(
            F.col(user_col).alias("user"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        )
        .distinct()
    )
    span = ud.groupBy("user").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    ends = ud.agg(
        F.min("day").alias("_start"), F.max("day").alias("_end")
    )
    life = span.join(F.broadcast(ends))
    if group_expr is None:
        # early adopters: first activity in the first half of the span
        mid_days = F.floor(
            F.datediff("_end", "_start") / F.lit(2)
        )
        group_expr = (
            F.datediff("first_day", "_start") <= mid_days
        )
    life = life.select(
        F.datediff("last_day", "first_day")
        .cast("long")
        .alias("t"),
        (F.datediff("_end", "last_day") >= churn_gap_days).alias("_ev"),
        group_expr.alias("_g1"),
    )
    per_t = life.groupBy("t").agg(
        F.sum(F.col("_ev").cast("long")).alias("d"),
        F.sum((F.col("_ev") & F.col("_g1")).cast("long")).alias("d1"),
        F.count(F.lit(1)).alias("leave"),
        F.sum(F.col("_g1").cast("long")).alias("leave1"),
    )
    w_risk = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "t",
        "d",
        "d1",
        F.sum("leave").over(w_risk).alias("n"),
        F.sum("leave1").over(w_risk).alias("n1"),
    ).filter(F.col("d") > 0)
    nn = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    dd = F.col("d").cast("double")
    e1 = dd * n1 / nn
    v = F.when(
        F.col("n") > 1,
        dd * (n1 / nn) * (F.lit(1.0) - n1 / nn)
        * (nn - dd) / (nn - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    agg = risk.agg(
        F.sum("d1").cast("long").alias("observed_g1"),
        F.sum(e1).alias("expected_g1"),
        F.sum(v).alias("variance_g1"),
    )
    sizes = life.agg(
        F.sum((~F.col("_g1")).cast("long")).alias("n_g0"),
        F.sum(F.col("_g1").cast("long")).alias("n_g1"),
    )
    o1 = F.col("observed_g1").cast("double")
    chi2 = F.when(
        F.col("variance_g1") > 0.0,
        (o1 - F.col("expected_g1"))
        * (o1 - F.col("expected_g1"))
        / F.col("variance_g1"),
    )
    return agg.join(F.broadcast(sizes)).select(
        "n_g0",
        "n_g1",
        "observed_g1",
        "expected_g1",
        "variance_g1",
        chi2.alias("chi2"),
    )


def weibull_fit(
    df: DataFrame,
    churn_gap_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Parametric Weibull fit to the churn survival curve via the
    Weibull plot: for S(t) = exp(-(t/scale)^shape),

        ln(-ln S(t)) = shape * ln t - shape * ln scale

    so OLS of y = ln(-ln S) on x = ln t over the Kaplan-Meier curve's
    interior points (0 < S < 1, t > 0) recovers ``shape`` (the
    regression slope) and ``scale`` = exp(-intercept/shape).  One row
    ``(n_points, shape, scale_days, median_lifetime_days)`` —
    shape < 1 means churn hazard FALLS with tenure (survive the first
    week and you're safer; the usual SaaS finding), > 1 means wear-out.

    The parametric summary KM cannot give: two numbers to compare
    across cohorts/products, plus an extrapolated median lifetime
    ``scale * ln(2)^(1/shape)`` that extends beyond the observation
    window.  Engine shape: the KM plan (duration-cardinality rows)
    capped by one five-moment OLS aggregate — the ar1.py algebra.
    """
    km = kaplan_meier(
        df, churn_gap_days=churn_gap_days,
        user_col=user_col, ts_col=ts_col,
    )
    pts = km.filter(
        (F.col("duration_days") > 0)
        & (F.col("survival") > 0.0)
        & (F.col("survival") < 1.0)
    ).select(
        F.log(F.col("duration_days").cast("double")).alias("x"),
        F.log(-F.log("survival")).alias("y"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_points")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    shape = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    intercept = (F.col("sy") - shape * F.col("sx")) / n
    scale = F.exp(-intercept / shape)
    return (
        mom.filter((n >= 3) & (den != 0.0))
        .select(
            n.cast("long").alias("n_points"),
            shape.alias("shape"),
            scale.alias("scale_days"),
            (
                scale * F.pow(F.lit(float(__import__("math").log(2.0))),
                              F.lit(1.0) / shape)
            ).alias("median_lifetime_days"),
        )
    )
