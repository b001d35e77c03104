"""Reference ``tsclust.stepattern`` module surface (stepattern.py:34-144),
minus the import-time prints (stepattern.py:140-141) and the shared
mutable-default bug (stepattern.py:79)."""

from tsclust_spark.compat.stepattern import (  # noqa: F401
    Step,
    StepPattern,
    asymmetric,
    rigid,
    symmetric1,
    symmetric2,
)
