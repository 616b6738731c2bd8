"""Declared-query registry: the driver-facing correctness surface.

Every implemented operator from SURVEY.md §2 (the `Decl` column) is
registered here as
  name -> (PySpark callable (spark, sf_dir) -> DataFrame,
           equivalent ANSI SQL for the DuckDB oracle | None)

The PySpark side routes through the engine's operator modules; the SQL
side is an independent re-statement of the semantics so the driver can
hash-compare results at sf=0.01.

Determinism rules applied to BOTH sides:
- money aggregations go through DECIMAL(18,2) so sums are exact (no
  float-summation-order drift between Spark and DuckDB), then cast back
  to DOUBLE;
- every computed column is aliased identically in Spark and SQL;
- any ordered/paged query has a unique tiebreak column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beis_orp_data_service_spark.catalog import load_table
from beis_orp_data_service_spark.operators import search as search_ops


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible: driver does rows-only check


REGISTRY: dict[str, QueryDef] = {}


def declared(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# money-exact aggregation helper: DECIMAL(18,2) keeps the sum exact so it
# hash-matches DuckDB regardless of summation order.
def _dec(c):
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Flagship — the full search pipeline in one plan (SURVEY §3.2 redesign):
# filter -> sort -> page -> left-join enrichment -> project.
# ---------------------------------------------------------------------------


@declared(
    "q_search_flagship",
    """
    WITH f AS (
      SELECT doc_id, source, n_chars
      FROM documents
      WHERE lang = 'en' AND contains(lower(text), 'spark')
    ), p AS (
      SELECT doc_id, source, n_chars
      FROM f ORDER BY n_chars DESC, doc_id DESC LIMIT 10
    ), s AS (
      SELECT source, count(*) AS n_docs_in_source FROM documents GROUP BY source
    )
    SELECT p.doc_id, p.source, p.n_chars,
           coalesce(s.n_docs_in_source, 0) AS n_docs_in_source
    FROM p LEFT JOIN s USING (source)
    """,
)
def q_search_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    filtered = docs.filter(
        (F.col("lang") == "en") & F.lower(F.col("text")).contains("spark")
    ).select("doc_id", "source", "n_chars")
    paged = search_ops.sort_page(
        filtered, order_col="n_chars", ascending=False, page=1, page_size=10,
        tiebreak="doc_id",
    )
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs_in_source"))
    return (
        paged.join(F.broadcast(per_source), "source", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.coalesce("n_docs_in_source", F.lit(0)).alias("n_docs_in_source"),
        )
    )


# ---------------------------------------------------------------------------
# Q1-Q7 — predicate family (reference TQL builder, search_functions.py:9-65)
# ---------------------------------------------------------------------------


@declared(
    "q_point",
    "SELECT doc_id, source, lang, n_chars FROM documents WHERE doc_id = 42",
)
def q_point(spark, sf_dir):
    # Q1 point lookup by id (search_functions.py:14-19)
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") == F.lit(42)).select(
        "doc_id", "source", "lang", "n_chars"
    )


@declared(
    "q_eq",
    "SELECT doc_id, n_chars FROM documents WHERE lang = 'en' AND source = 'src7'",
)
def q_eq(spark, sf_dir):
    # Q2 equality filter (search_functions.py:35-36)
    docs = _t(spark, sf_dir, "documents")
    return docs.filter((F.col("lang") == "en") & (F.col("source") == "src7")).select(
        "doc_id", "n_chars"
    )


@declared(
    "q_and_contains",
    """
    SELECT doc_id, source FROM documents
    WHERE contains(lower(text), ' table ') AND contains(lower(text), ' spark ')
    """,
)
def q_and_contains(spark, sf_dir):
    # Q3 — every search keyword must be present (search_functions.py:39-41)
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return docs.filter(low.contains(" table ") & low.contains(" spark ")).select(
        "doc_id", "source"
    )


@declared(
    "q_or_in",
    """
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
    """,
)
def q_or_in(spark, sf_dir):
    # Q4 OR/regex filter -> isin (search_functions.py:44-47)
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderstatus") == "F")
    ).select("o_orderkey", "o_orderpriority")


@declared(
    "q_range",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def q_range(spark, sf_dir):
    # Q5 date-range filter, either side open (search_functions.py:50-57)
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@declared(
    "q_contains",
    "SELECT p_partkey, p_name FROM part WHERE contains(lower(p_name), 'gear')",
)
def q_contains(spark, sf_dir):
    # Q6 substring filter (search_functions.py:59-61)
    part = _t(spark, sf_dir, "part")
    return part.filter(F.lower(F.col("p_name")).contains("gear")).select(
        "p_partkey", "p_name"
    )


@declared(
    "q_not",
    """
    SELECT event_type, count(*) AS n_events FROM events
    WHERE event_type <> 'error' GROUP BY event_type
    """,
)
def q_not(spark, sf_dir):
    # Q7 negation filter — the not-archive guard on every query
    events = _t(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Q8-Q11 — limit / sort / pagination / two-phase fetch
# ---------------------------------------------------------------------------


@declared(
    "q_sort_page",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 10 OFFSET 20
    """,
)
def q_sort_page(spark, sf_dir):
    # Q8+Q9+Q10 — sort + offset pagination via row_number window
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return search_ops.sort_page(
        orders, order_col="o_orderdate", ascending=False, page=3, page_size=10,
        tiebreak="o_orderkey",
    )


@declared(
    "q_two_phase",
    """
    WITH page AS (
      SELECT doc_id FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
    )
    SELECT d.doc_id, d.source, d.lang, d.n_chars
    FROM documents d JOIN page USING (doc_id)
    """,
)
def q_two_phase(spark, sf_dir):
    # Q11 late materialization: page over narrow (id, sortkey) projection,
    # then join back for full attributes (search_functions.py:90-125).
    docs = _t(spark, sf_dir, "documents")
    ids = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id")
    )
    return ids.join(docs, "doc_id").select("doc_id", "source", "lang", "n_chars")


# ---------------------------------------------------------------------------
# Q12-Q15 — pivot / traversal / group-collect / left-join merge
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@declared(
    "q_pivot",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark, sf_dir):
    # Q12 EAV pivot (helpers.py:50-71): rows (entity, attr, value) -> wide
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .fillna(0, subset=_EVENT_TYPES)
    )


@declared(
    "q_traverse",
    """
    SELECT c.c_custkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey
    """,
)
def q_traverse(spark, sf_dir):
    # Q13 graph traversal as a 3-way join: docs ⋈ edges ⋈ legislation
    # becomes customer ⋈ orders ⋈ lineitem. The dimension side is
    # broadcast — the reference's per-row DynamoDB lookups disappear.
    customer = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    revenue = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("rev")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@declared(
    "q_group_collect",
    """
    SELECT n.n_name,
           array_to_string(list_sort(list(c.c_name))[1:5], ',') AS sample_names,
           count(*) AS n_cust
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_group_collect(spark, sf_dir):
    # Q14 grouped related-docs: per key, a capped, deterministic list
    # (search_functions.py:68-85). Sorted before slicing so the cap is
    # stable; serialized with a separator for engine-agnostic hashing.
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_list("c_name")), 1, 5)
            ).alias("sample_names"),
            F.count("*").alias("n_cust"),
        )
    )


@declared(
    "q_left_join",
    """
    SELECT n.n_name, coalesce(r.n_rich, 0) AS n_rich
    FROM nation n
    LEFT JOIN (
      SELECT c_nationkey, count(*) AS n_rich
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ) r ON r.c_nationkey = n.n_nationkey
    """,
)
def q_left_join(spark, sf_dir):
    # Q15 left-join enrichment merge + fillna->0 (search_functions.py:128-131)
    nation = _t(spark, sf_dir, "nation")
    rich = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_rich"))
    )
    return (
        nation.join(rich, nation.n_nationkey == rich.c_nationkey, "left")
        .select("n_name", F.coalesce("n_rich", F.lit(0)).alias("n_rich"))
    )


# ---------------------------------------------------------------------------
# Q17-Q19 — deepest-path resolve / projection / delete
# ---------------------------------------------------------------------------


@declared(
    "q_deepest",
    """
    SELECT doc_id,
           source || '/' || lang || '/' || CAST(n_chars % 10 AS VARCHAR)
             AS deepest_topic
    FROM documents
    """,
)
def q_deepest(spark, sf_dir):
    # Q17 deepest-topic resolve (search_functions.py:79-81): from the
    # path-expanded topic array, pick max by path depth. The array is
    # built from row attributes (as the reference's topic expansion does),
    # then reduced with array_max over (depth, value) structs.
    docs = _t(spark, sf_dir, "documents")
    topics = F.array(
        F.col("source"),
        F.concat_ws("/", "source", "lang"),
        F.concat_ws("/", "source", "lang", (F.col("n_chars") % 10).cast("string")),
    )
    deepest = F.array_max(
        F.transform(topics, lambda x: F.struct(F.size(F.split(x, "/")).alias("d"), x.alias("v")))
    )["v"]
    return docs.select("doc_id", deepest.alias("deepest_topic"))


@declared(
    "q_project",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_iso, event_type
    FROM events WHERE event_id <= 200
    """,
)
def q_project(spark, sf_dir):
    # Q18 result projection + ISO date formatting (helpers.py:42-43)
    events = _t(spark, sf_dir, "events")
    return events.filter(F.col("event_id") <= 200).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_iso"),
        "event_type",
    )


@declared(
    "q_delete",
    "SELECT doc_id, source FROM documents WHERE doc_id % 7 <> 0",
)
def q_delete(spark, sf_dir):
    # Q19 delete-by-key as an anti-join rewrite (delete_document.py:34-53):
    # survivors = documents ANTI JOIN delete-set.
    docs = _t(spark, sf_dir, "documents")
    delete_set = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(delete_set, "doc_id", "left_anti").select("doc_id", "source")


# ---------------------------------------------------------------------------
# Driver contract adapters
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
