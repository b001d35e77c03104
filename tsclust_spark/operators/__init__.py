"""DataFrame-level engine operators (SURVEY.md §2.C).

Everything here is pure public DataFrame API — Catalyst plans it, so
predicate pushdown / column pruning / partial aggregation / AQE come for
free. Kernels (pandas UDFs) live in :mod:`tsclust_spark.kernels`.
"""
