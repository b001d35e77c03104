"""n-gram decontamination, bigram surprisal, Zipf fit, rolling median."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_ngram_contamination_planted_overlap(spark):
    from tsclust_spark.operators.contamination import ngram_contamination

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words {shared} trailing words"),  # contaminated
            (2, "totally unrelated text with enough tokens to form grams ok"),
            (3, "short doc"),  # < 8 tokens -> n_ngrams = 0
            (4, f"{shared} {shared}"),  # repeated span, distinct grams once
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark question {shared} benchmark answer")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in ngram_contamination(train, ev, n=8).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] and out[1]["n_hit"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hit"] == 0
    assert out[3]["n_ngrams"] == 0 and not out[3]["contaminated"]
    # doc 4: 16 tokens -> 9 start positions, but the repeated span makes
    # some grams coincide; the shared 8-gram must count once (distinct)
    assert out[4]["contaminated"]
    assert out[4]["n_hit"] >= 1
    assert out[4]["n_ngrams"] <= 9


def test_ngram_contamination_distinct_within_doc(spark):
    from tsclust_spark.operators.contamination import doc_ngrams

    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    grams = [r["ngram"] for r in doc_ngrams(df, 2).collect()]
    assert sorted(grams) == ["a b", "b a"]


def test_bigram_surprisal_hand_computed(spark):
    from tsclust_spark.operators.surprisal import bigram_surprisal

    # corpus bigrams: doc1: (a b), (b a), (a b); doc2: (a c)
    # heads: a -> 3 starts (ab x2, ac x1); b -> 1 start (ba)
    # p(b|a) = 2/3, p(a|b) = 1/1, p(c|a) = 1/3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in bigram_surprisal(df).collect()}
    assert 3 not in rows  # < 2 tokens -> no row
    exp1 = -(math.log(2 / 3) + math.log(1.0) + math.log(2 / 3)) / 3
    exp2 = -math.log(1 / 3)
    assert rows[1]["n_bigrams"] == 3
    assert abs(rows[1]["surprisal"] - exp1) < 1e-12
    assert abs(rows[2]["surprisal"] - exp2) < 1e-12


def test_zipf_slope_matches_polyfit(spark):
    from tsclust_spark.operators.zipf import zipf_slope

    # one source, known frequencies: a x8, b x4, c x2, d x1
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([("s1", text)], "source string, text string")
    row = zipf_slope(df, slice_col="source").collect()[0]
    assert row["n_vocab"] == 4 and row["n_tokens"] == 15
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array([8.0, 4.0, 2.0, 1.0]))
    expected = np.polyfit(x, y, 1)[0]
    assert abs(row["zipf_slope"] - expected) < 1e-9


def test_zipf_slope_degenerate_single_term(spark):
    from tsclust_spark.operators.zipf import zipf_slope

    df = spark.createDataFrame([("s1", "only only only")], "source string, text string")
    row = zipf_slope(df, slice_col="source").collect()[0]
    assert row["n_vocab"] == 1 and row["zipf_slope"] is None


def test_rolling_median_window_membership(spark):
    from tsclust_spark.operators.rolling import rolling_median

    # key 1 at t=0, 300, 601s: the 601 frame excludes t=0 (range 600)
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 10.0),
            (1, 2, "2024-01-01 00:05:00", 20.0),
            (1, 3, "2024-01-01 00:10:01", 31.0),
        ],
        "user_id long, event_id long, ts_s string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = {
        r["event_id"]: r.asDict()
        for r in rolling_median(df, window_seconds=600).collect()
    }
    assert out[1]["roll_n"] == 1 and out[1]["roll_median"] == 10.0
    assert out[2]["roll_n"] == 2 and out[2]["roll_median"] == 15.0  # interp
    assert out[3]["roll_n"] == 2 and out[3]["roll_median"] == 25.5


def test_streaming_contaminated_ids_matches_batch(spark, tmp_path):
    """Stream-static decontamination flags exactly the docs the batch
    operator flags, across two micro-batches."""
    import os
    import time

    from pyspark.sql import types as T

    from tsclust_spark.operators.contamination import (
        contaminated_ids_stream,
        ngram_contamination,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark {shared} answer key")], schema
    )
    batch1 = [
        (1, f"intro {shared} trailing words here"),
        (2, "clean document with plenty of its own original tokens"),
    ]
    batch2 = [
        (3, f"{shared} leaked again in a later crawl batch"),
        (4, "another clean later document nothing shared at all"),
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    time.sleep(1.1)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    newest = max(
        (os.path.join(in_dir, f) for f in os.listdir(in_dir)
         if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    os.utime(newest, (now + 5, now + 5))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        contaminated_ids_stream(stream, ev, n=8)
        .writeStream.format("memory")
        .queryName("contam_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT * FROM contam_mem").collect()
    }
    batch_flags = {
        r["doc_id"]
        for r in ngram_contamination(
            spark.createDataFrame(batch1 + batch2, schema), ev, n=8
        ).filter("contaminated").collect()
    }
    assert got == batch_flags == {1, 3}
