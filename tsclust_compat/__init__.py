"""Drop-in import-compatibility shim for the reference package layout.

Code written against ``imartinezl/tsclust`` (``from tsclust import
example``, ``from tsclust.stepattern import symmetric2``) runs against
this engine by aliasing ``tsclust`` to this package::

    import tsclust_compat as tsclust

Mirrors the reference's public names (reference tsclust/__init__.py:1-10)
without its import-time side effects.
"""

from tsclust_spark.compat import create_array  # noqa: F401
from tsclust_compat import example, stepattern  # noqa: F401

__author__ = "tsclust_spark"
__version__ = "0.1.0"


def main() -> None:
    # reference tsclust/__init__.py:8-10 prints a placeholder
    print("tsclust_spark compat shim — see tsclust_spark for the engine")
