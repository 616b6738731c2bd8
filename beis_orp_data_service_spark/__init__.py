"""beis_orp_data_service_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
UKGovernmentBEIS/beis-orp-data-service (the Open Regulation Platform data
service), re-expressed Spark-first:

- the Lambda/Step-Functions streaming pipeline becomes DataFrame
  transformations + Structured Streaming (``streaming/``),
- the TypeDB graph becomes joinable ``documents``/``entities``/``edges``
  DataFrames queried with Spark SQL (``operators/graph.py``),
- the TQL search-string builder becomes a ``Column`` predicate builder
  (``operators/search.py``),
- the MinHash dedup lambdas become MLlib MinHashLSH + SQL-expressible
  shingle/similarity operators (``operators/dedup.py``),
- model-backed enrichments become Arrow-batched pandas UDFs with
  deterministic fakes for testing (``operators/enrichment.py``).

Everything is declared through the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join selection, and AQE at scale.
"""

__version__ = "0.1.0"

# Worker-side self-sufficiency: Arrow kernels are nested functions, but
# several call MODULE-LEVEL helpers (_quantize_np, _lloyd_int, ...).
# cloudpickle serializes module-level functions of an importable package
# BY REFERENCE, so a Python worker would need this package on ITS
# sys.path — true only when the driver process happens to run from the
# repo root. Registering the package for pickle-by-value makes every
# kernel closure self-contained, so queries run under ANY driver cwd /
# PYTHONPATH (the driver harness builds its own vanilla session).
# Registration covers all submodules (cloudpickle matches by package
# prefix); the serialized helpers are a few KB per task closure.
try:  # pragma: no cover - depends on pyspark internals staying public
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - fall back to by-reference pickling
    pass

from beis_orp_data_service_spark.session import get_spark  # noqa: F401
from beis_orp_data_service_spark.catalog import load_tables  # noqa: F401
