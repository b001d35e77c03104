"""First-order Markov transition matrix over event types.

Which event follows which: per user, consecutive events (ordered by
(ts, tiebreak)) form (from_type, to_type) bigrams; globally
aggregated they estimate the behavior chain P(next | current) — the
standard session-model summary (what follows a view? does error
follow signup more than chance?), and the base object for sequence
entropy, next-event prediction baselines, and anomaly flags on
"impossible" transitions.

Engine shape: one ``lag`` window over the user partition (the same
single Exchange every sessionize/as-of op pays), one (from, to) hash
aggregate (cardinality <= |event types|^2 — metadata scale), one
row-count window per from-type for the probabilities.  Zero Python;
counts are exact integers, the probability the only float.

Determinism: the ``tiebreak_col`` totalizes the order under duplicate
timestamps (ADVICE-r3 rule), so the bigram MULTISET is exact on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(from_type, to_type, n, prob)`` for every observed bigram;
    ``prob = n / sum(n over from_type)`` (rows of the transition
    matrix sum to 1; unobserved transitions emit no row)."""
    w = Window.partitionBy("user").orderBy(ts_col, tiebreak_col)
    bi = (
        df.select(
            F.col(user_col).alias("user"),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).cast("string").alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = bi.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n") / F.sum("n").over(wf)).alias("prob"),
    )


def transition_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-from-type conditional entropy of the next event,
    ``(from_type, n_out, n_next_types, next_entropy)`` — the entropy
    rate decomposition of :func:`event_transitions` (normalized by the
    ln of the observed alphabet size, [0, 1]).

    ~0: the next event is predictable (a rigid flow); ~1: what
    follows this event type is anyone's guess.  The behavioral twin
    of permutation entropy on values.
    """
    t = event_transitions(df, user_col, ts_col, type_col, tiebreak_col)
    # alphabet = distinct to_types observed anywhere (one tiny agg,
    # broadcast into the projection via a windowless cross join)
    alpha = t.agg(
        F.count_distinct("to_type").alias("_alpha")
    )
    agg = t.groupBy("from_type").agg(
        F.sum("n").alias("n_out"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.sum(F.col("n") * F.log("n")).alias("_clogc"),
    )
    h = F.log(F.col("n_out")) - F.col("_clogc") / F.col("n_out")
    return (
        agg.join(F.broadcast(alpha))
        .filter(F.col("_alpha") > 1)
        .select(
            "from_type",
            F.col("n_out").cast("long").alias("n_out"),
            F.col("n_next_types").cast("long").alias("n_next_types"),
            (h / F.log(F.col("_alpha").cast("double"))).alias(
                "next_entropy"
            ),
        )
    )


def common_paths(
    df: DataFrame,
    n: int = 3,
    top_k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Top-k most frequent n-step event-type paths across users:
    ``(path, n_occurrences, rank)`` with ``path`` like
    ``"view>click>purchase"``.

    The n-gram generalization of :func:`event_transitions` — the
    mined "what do users actually do" report.  Paths slide (every
    consecutive n-event window within a user counts, overlapping),
    and never cross users.

    Engine shape: n-1 ``lag`` columns over ONE shared user-partition
    window sort, a concat projection, one path-count aggregate
    (cardinality <= |types|^n — still metadata scale for small n),
    and a rank window for the top-k.  The rank is a total order
    (count desc, path asc), so the cut is deterministic across
    engines and partitionings — an ``orderBy().limit()`` would tie-
    break arbitrarily at the boundary.
    """
    w = Window.partitionBy("user").orderBy(ts_col, tiebreak_col)
    base = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.col(type_col).cast("string").alias("t0"),
    )
    for i in range(1, n):
        base = base.withColumn(f"t{i}", F.lag("t0", i).over(w))
    # t{n-1} .. t0 is oldest-to-newest
    parts = [F.col(f"t{i}") for i in range(n - 1, -1, -1)]
    paths = (
        base.filter(F.col(f"t{n - 1}").isNotNull())
        .select(F.concat_ws(">", *parts).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    rk = Window.orderBy(
        F.col("n_occurrences").desc(), F.col("path").asc()
    )
    return (
        paths.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= top_k)
        .select(
            "path",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def stationary_distribution(
    df: DataFrame,
    n_iter: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Approximate stationary distribution of the event-type Markov
    chain: ``(etype, pi)`` after ``n_iter`` power-iteration steps
    ``pi' = pi P`` from the uniform start over the observed
    FROM-alphabet.

    Where the long-run behavior settles — the chain's own answer to
    "which state do users actually live in", independent of the
    empirical visit counts (which mix in entry/exit effects).  For an
    irreducible aperiodic chain the iteration converges geometrically;
    n_iter is a FIXED plan constant, so the whole computation is
    deterministic and SQL-twinnable (the oracle unrolls the same
    iterations).

    Engine shape: the transition matrix has <= |types|^2 rows
    (metadata scale), so each iteration is one broadcast join + one
    tiny aggregate — n_iter metadata-scale stages appended to the one
    point-scale bigram aggregate.  Mass leaving through absorbing-ish
    states (to-types never seen as from-types) simply leaves the
    vector; pi reports unnormalized mass times renormalized at the
    end so the output always sums to 1 over surviving states.
    """
    P = event_transitions(
        df, user_col, ts_col, type_col, tiebreak_col
    ).select("from_type", "to_type", "prob")
    alpha = P.select(F.col("from_type").alias("etype")).distinct()
    n0 = alpha.count()  # metadata-scale action: |alphabet| rows
    pi = alpha.withColumn("p", F.lit(1.0) / F.lit(float(n0)))
    for _ in range(n_iter):
        pi = (
            pi.join(
                F.broadcast(P),
                pi["etype"] == P["from_type"],
            )
            .groupBy(F.col("to_type").alias("etype"))
            .agg(F.sum(F.col("p") * F.col("prob")).alias("p"))
            # keep only states that can emit again; their mass
            # renormalizes at the end
            .join(F.broadcast(alpha), "etype")
        )
    tot = Window.partitionBy()
    return pi.select(
        "etype",
        (F.col("p") / F.sum("p").over(tot)).alias("pi"),
    )
