"""Vectorized numpy kernels + their Arrow/pandas-UDF Spark wrappers.

Every kernel has a pure-numpy single-process core (the test oracle twin)
and a Spark wrapper that ships it via ``mapInPandas``/``applyInPandas``/
scalar ``pandas_udf`` — Arrow-batched, never per-row Python UDFs
(BASELINE.json:15 mandate).
"""

from tsclust_spark.kernels.dtw import dtw_path_from_metric  # noqa: F401
