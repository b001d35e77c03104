"""Adversarial twin of the driver's correctness gate.

The sf0.01 fixtures are BENIGN: no duplicate (key, ts) rows, no NULL
values, no empty documents, no zero vectors — so a latent Spark-vs-
oracle divergence on those edges passes every round until real data
hits it (three round-3 ADVICE items were exactly this class). This
tool synthesizes a HOSTILE sf dir and runs the same query/oracle twin
over it:

- events: duplicate (user_id, ts) pairs with different values (tests
  every tiebreak rule), NULL values, microsecond-adjacent ties,
  single-event users, constant-value series (zero variance), an empty
  event_type partition.
- documents: empty text, whitespace-only text, single-word docs, a
  unicode doc, exact duplicate texts across sources.
- embeddings: an all-zero vector (norm 0 — division guards), exact
  duplicate vectors, a one-hot vector.

Dimension tables (region/nation/...) copy from sf0.001 unchanged —
their queries' edge surface is the TPC-H shape itself.

Usage: python tools/fuzz_oracle.py [query ...]   (default: the
affected-table queries). Exit 0 iff every run query PASSes.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = os.environ.get("SPARK_GRAFT_FUZZ_BASE", "/root/testdata/sf0.001")
FUZZ_DIR = os.environ.get("SPARK_GRAFT_FUZZ_DIR", "/tmp/fuzz_sf")

T0 = dt.datetime(2024, 1, 1)

# queries whose inputs are events/documents/embeddings — the tables we
# make hostile. TPC-H-only queries keep their benign inputs and are
# covered by the normal gate.
DEFAULT_QUERIES = [
    # events family: ties, NULLs, zero variance, single-point series
    "tier_1m_events", "tier_cascade_1h_events", "tier_firstlast_1h",
    "realtime_cagg_1m", "time_weighted_avg_1h", "counter_delta_1h",
    "tier_histogram_1h", "hist_percentiles_1h", "m4_downsample_64px",
    "gapfill_locf", "gapfill_linear", "ewma_events", "acf_events",
    "rolling_stats_10m", "rolling_median_10m", "zscore_anomalies_1h",
    "mad_anomalies_1h", "mann_kendall_1d", "znorm_events",
    "paa_events", "sax_words_events", "psi_view_vs_purchase",
    "asof_join_events", "asof_interpolate_events", "asof_join_bucketed",
    "session_stats", "session_stats_bucketed",
    "interval_session_assign", "series_corr_pairs",
    "series_spearman_pairs",
    "distinct_event_types", "approx_distinct_bounds",
    "quantile_sketch_bounds", "window_rep_1h", "routed_tier_1h",
    "seasonal_anomalies_hod", "holt_events", "trend_slope_1h",
    "cusum_events", "ccf_view_purchase_1d", "ewvar_events",
    "holt_winters_events",
    "mp_selfcheck",
    # documents family: empty/whitespace/unicode/dup texts
    "dedup_exact", "dedup_minhash_lsh", "dedup_groups_cc",
    "simhash_near_dups", "dedup_ngram_jaccard", "gopher_flags",
    "token_count", "fingerprint", "language_id", "quality_score",
    "tfidf_top3", "top_tokens_per_source", "curate_docs",
    "unigram_surprisal", "token_psi_sources", "bigram_surprisal",
    "ngram_contamination", "zipf_slope_sources", "pmi_collocations",
    "sample_docs_10pct", "cap_docs_per_source", "split_assign",
    "salted_source_stats",
    # embeddings family: zero / duplicate / one-hot vectors
    "cosine_topk", "lsh_topk_identical", "embedding_near_dups",
    "embedding_quantize_int8", "ivf_topk_full_probe",
    "explode_positions", "renest_roundtrip",
    # codec / raw-tier family over embeddings: the zero vector becomes
    # a constant-zero token sequence, the one-hot a near-constant one
    "codec_roundtrip", "fast1m_jvm", "fast1m_arrow",
    "raw_range_scan", "raw_value_scan",
    # queued driver gates (__spark_entry__.queued_queries) get the
    # same hostile treatment before they ever reach the driver
    "ks_view_vs_purchase", "decompose_additive_events",
    "pack_docs_128", "mixture_sample_docs", "chunk_docs_32",
    "span_dedup_docs", "repetition_signals", "redact_pii_docs",
    "seasonal_naive_backtest", "embedding_covariance",
    "theil_sen_trend", "changepoint_amoc", "plateau_runs",
    "ar1_fit", "coverage_report",
    "perm_entropy_events", "spectral_power_events",
    "trimmed_tier_1d", "rolling_corr_view_purchase",
    "decomposition_strength", "monotone_runs_events",
    "interarrival_stats_events", "value_entropy_events",
    "ttr_sources", "vocab_overlap_sources",
    "funnel_view_click_purchase", "rolling_active_users_7d",
    "cohort_retention_weekly", "pq_exact_adc",
    "event_transitions", "transition_entropy", "funnel_latency",
    "common_paths_3", "changepoint_binseg", "piecewise_trend",
    "cms_heavy_hitters", "holt_winters_mul", "hw_forecast_12",
    "holt_damped", "regime_anomalies", "decompose_mul_events",
    "self_drift_ks", "benford_digits", "kaplan_meier_churn",
    "stationary_distribution", "logrank_early_vs_late",
    "dominant_lag", "weibull_fit", "burst_intervals",
]


def _events() -> pa.Table:
    rng = np.random.default_rng(99)
    rows = []
    eid = 0

    def add(ts, user, etype, value, props="{}"):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    # user 1: dense series WITH exact duplicate (ts) pairs carrying
    # DIFFERENT values — every tiebreak rule (order by ts, event_id /
    # struct lexicographic) must agree between engines
    for i in range(200):
        ts = T0 + dt.timedelta(seconds=int(rng.integers(0, 3600 * 48)))
        v = float(np.round(rng.normal(10, 3), 2))
        add(ts, 1, "view", v)
        if i % 7 == 0:
            add(ts, 1, "view", float(np.round(v + 1.5, 2)))  # dup ts, diff value
        if i % 11 == 0:
            add(ts, 1, "view", v)  # dup ts AND dup value
    # user 2: NULL values interleaved (count/avg/NULL-filter semantics)
    for i in range(60):
        ts = T0 + dt.timedelta(seconds=i * 997)
        add(ts, 2, "view", None if i % 3 == 0 else float(i % 13))
    # user 3: constant value (zero variance — znorm/zscore/corr guards)
    for i in range(50):
        add(T0 + dt.timedelta(seconds=i * 701), 3, "purchase", 5.0)
    # user 4: single event (windows of size 1, ACF lag > n)
    add(T0 + dt.timedelta(seconds=42), 4, "purchase", 7.25)
    # user 5: microsecond-adjacent points straddling bucket boundaries
    for i in range(40):
        base = T0 + dt.timedelta(minutes=i, seconds=59)
        add(base + dt.timedelta(microseconds=999_999), 5, "view",
            float(np.round(rng.uniform(0, 20), 2)))
        add(base + dt.timedelta(microseconds=1_000_000), 5, "view",
            float(np.round(rng.uniform(0, 20), 2)))
    # user 6: strictly increasing counter WITH resets to 0
    c = 0.0
    for i in range(80):
        c += float(rng.integers(1, 9))
        if i % 29 == 28:
            c = float(rng.integers(0, 3))  # reset
        add(T0 + dt.timedelta(seconds=i * 499), 6, "view", c)
    # user 7: only purchases (PSI slice with no view rows)
    for i in range(30):
        add(T0 + dt.timedelta(seconds=i * 1201), 7, "purchase",
            float(np.round(rng.uniform(0, 30), 2)))
    # user 8: ten days of overlapping daily view+purchase series — CCF
    # gets real pairs, and the purchase side is CONSTANT for the first
    # stretch (exercises the zero-variance NULL-ccf guard cross-engine)
    for d in range(10):
        for j in range(2):
            add(T0 + dt.timedelta(days=d, hours=6 + 8 * j), 8, "view",
                float(np.round(rng.normal(10, 2), 2)))
            add(T0 + dt.timedelta(days=d, hours=7 + 8 * j), 8, "purchase",
                5.0 if d < 5 else float(np.round(rng.normal(20, 4), 2)))

    cols = list(zip(*rows))
    return pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )


def _documents() -> pa.Table:
    rng = np.random.default_rng(7)
    vocab = ("the fast key order sort table scan merge part window small "
             "hash join batch stream spark dup index cache page").split()
    docs = []

    def add(text, lang, source):
        docs.append((len(docs), text, lang, source, len(text)))

    for i in range(60):
        n = int(rng.integers(5, 60))
        add(" ".join(rng.choice(vocab, n)), ["en", "es", "de"][i % 3],
            f"src{i % 4}")
    add("", "en", "src0")                      # empty text
    add("   \t  \n ", "en", "src1")            # whitespace-only
    add("word", "en", "src2")                  # single word
    add("naïve café über straße 東京 データ", "de", "src3")  # unicode
    dup = "the fast key order sort merge join"
    add(dup, "en", "src0")                     # exact duplicates across
    add(dup, "es", "src1")                     # sources (dedup targets)
    add(dup, "en", "src2")
    # PII-shaped strings (redact_pii targets): embedded email/IP/SSN,
    # adjacent matches, a boundary-hugging IP, an @ that is NOT email
    add("mail a.b-c%d@ex-ample.co.uk twice a.b-c%d@ex-ample.co.uk", "en",
        "src0")
    add("hosts 10.0.0.1 192.168.255.254and 1.2.3.4", "en", "src1")
    add("ssn 123-45-6789, fake 12-345-678, id 000-00-0000", "en", "src2")
    add("not@pii not @ all x@y.z 999.999.999.999", "en", "src3")
    # heavy span repetition (repetition_signals target)
    add(" ".join(["spark shuffle"] * 15), "en", "src0")
    cols = list(zip(*docs))
    return pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )


def _embeddings(dim: int = 64) -> pa.Table:
    rng = np.random.default_rng(13)
    vecs = [rng.normal(0, 0.15, dim).astype(np.float32) for _ in range(40)]
    vecs.append(np.zeros(dim, np.float32))          # zero vector (norm 0)
    vecs.append(vecs[0].copy())                      # exact duplicate
    onehot = np.zeros(dim, np.float32)
    onehot[3] = 1.0
    vecs.append(onehot)                              # one-hot
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([int(i % 6) for i in range(len(vecs))],
                              pa.int32()),
        }
    )


def build_fuzz_dir() -> str:
    os.makedirs(FUZZ_DIR, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        src = os.path.join(SRC_SF, f"{t}.parquet")
        dst = os.path.join(FUZZ_DIR, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    pq.write_table(_events(), os.path.join(FUZZ_DIR, "events.parquet"))
    pq.write_table(_documents(), os.path.join(FUZZ_DIR, "documents.parquet"))
    pq.write_table(_embeddings(), os.path.join(FUZZ_DIR, "embeddings.parquet"))
    return FUZZ_DIR


def main() -> int:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    d = build_fuzz_dir()
    print(f"fuzz dir: {d} ({len(queries)} queries)")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         d, *queries]
    )
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
