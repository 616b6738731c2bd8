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

from beis_orp_data_service_spark.session import get_spark  # noqa: F401
from beis_orp_data_service_spark.catalog import load_tables  # noqa: F401
