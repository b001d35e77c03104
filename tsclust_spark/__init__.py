"""tsclust_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine with tsclust's DTW/clustering numerics.

Reference semantics: imartinezl/tsclust (/root/reference). The reference is a
pre-alpha skeleton; its *declared* capabilities (banded DTW with step
patterns, barycenter averaging, streaming clustering — see
reference tsclust/example.py:5-129 and tsclust/stepattern.py:34-144) are
re-expressed here Spark-first:

- ``tsclust_spark.compat``    — reference-parity Python surface
  (add_one, create_array, Step, StepPattern, canonical patterns).
- ``tsclust_spark.kernels``   — vectorized Arrow/pandas-UDF kernels
  (banded DTW, delta-of-delta codec, Gorilla XOR codec, barycenter).
- ``tsclust_spark.operators`` — DataFrame-level operators (tier rollup
  cascade, gap-fill, salted aggregation, dedup, similarity, text stats).
- ``tsclust_spark.plans``     — checkpoint manifest + incremental merge.
- ``tsclust_spark.sources``   — sequence-table scan/sink helpers.
- ``tsclust_spark.streaming`` — Structured Streaming tier rollup.

Everything is built on the public PySpark DataFrame API; kernels are
Arrow-batched pandas UDFs (no per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"

from tsclust_spark.session import get_spark  # noqa: F401
