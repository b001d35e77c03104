"""Reference ``tsclust.example`` module surface (example.py:4,130-134),
with the documented DTW behavior actually implemented via
:func:`dtw_path_from_metric` (the reference documents it on ``add_one``'s
docstring but never implemented it)."""

from tsclust_spark.compat import add_one, create_array  # noqa: F401
from tsclust_spark.kernels.dtw import dtw_path_from_metric  # noqa: F401
