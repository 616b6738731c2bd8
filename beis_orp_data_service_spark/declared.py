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
from beis_orp_data_service_spark.functions import text as X
from beis_orp_data_service_spark.operators import dimension as dim_ops
from beis_orp_data_service_spark.operators import enrichment as enr
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
    return docs.select("doc_id", enr.deepest_topic(topics).alias("deepest_topic"))


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
# L1-L5 — dimension-table maintenance (legislation_table_update pipeline)
# ---------------------------------------------------------------------------


@declared(
    "l_derive",
    """
    SELECT p_partkey, CAST(split_part(p_brand, '#', 2) AS BIGINT) AS brand_no
    FROM part
    """,
)
def l_derive(spark, sf_dir):
    # L1 — derive column by positional split (legislation_table_update.py:68)
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        dim_ops.derive_split_field("p_brand", "#", 1).cast("bigint").alias("brand_no"),
    )


@declared(
    "l_array",
    """
    SELECT c_custkey,
           array_to_string(
             list_filter(
               [c_name,
                CASE WHEN c_acctbal > 5000 THEN c_mktsegment END,
                CASE WHEN c_nationkey < 10 THEN 'n' || CAST(c_nationkey AS VARCHAR) END],
               x -> x IS NOT NULL),
             '|') AS candidates
    FROM customer
    """,
)
def l_array(spark, sf_dir):
    # L2 — array-of-non-null build (legislation_table_update.py:69-73)
    cust = _t(spark, sf_dir, "customer")
    arr = dim_ops.non_null_array(
        F.col("c_name"),
        F.when(F.col("c_acctbal") > 5000, F.col("c_mktsegment")),
        F.when(
            F.col("c_nationkey") < 10,
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")),
        ),
    )
    return cust.select("c_custkey", F.concat_ws("|", arr).alias("candidates"))


@declared(
    "l_join",
    """
    SELECT n.n_name, r.r_name
    FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
    """,
)
def l_join(spark, sf_dir):
    # L3 — broadcast left join onto a small dimension (legislation_table_update.py:75-78)
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return dim_ops.left_join_dim(
        nation, region, nation.n_regionkey == region.r_regionkey
    ).select("n_name", "r_name")


@declared(
    "l_explode",
    """
    WITH e AS (
      SELECT unnest(string_split(p_name, ' ')) AS word, p_partkey, p_brand
      FROM part
    ), m AS (
      SELECT word, min(p_partkey) AS p_partkey FROM e GROUP BY word
    )
    SELECT e.word, e.p_partkey, e.p_brand
    FROM e JOIN m USING (word, p_partkey)
    """,
)
def l_explode(spark, sf_dir):
    # L4 — explode + deterministic dedupe (legislation_table_update.py:80-81)
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.split("p_name", " ").alias("words")
    )
    return dim_ops.explode_dedupe(
        part, "words", out_col="word", keep_min_of="p_partkey"
    ).select("word", "p_partkey", "p_brand")


@declared(
    "l_preprocess",
    """
    WITH f AS (
      SELECT md5(source || '|' || lang) AS group_key, doc_id, source, n_chars
      FROM documents WHERE text IS NOT NULL AND n_chars >= 150
    ), m AS (
      SELECT group_key, min(doc_id) AS doc_id FROM f GROUP BY group_key
    )
    SELECT f.group_key, f.doc_id, f.source, f.n_chars
    FROM f JOIN m USING (group_key, doc_id)
    """,
)
def l_preprocess(spark, sf_dir):
    # L5 — bulk-migration preprocess: filter non-null, dedupe by derived
    # key keeping first (bulk_migration/data_preprocess.py:107-117)
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= 150)
        .select(
            "doc_id",
            "source",
            "n_chars",
            "text",
            F.md5(F.concat_ws("|", "source", "lang")).alias("group_key"),
        )
    )
    return dim_ops.preprocess(
        docs, not_null_col="text", dedupe_key="group_key", order_col="doc_id"
    ).select("group_key", "doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# E5/E7/E8/E9 — extraction/conversion scalar ops
# ---------------------------------------------------------------------------


@declared(
    "clean_text",
    r"""
    SELECT doc_id,
           md5(lower(trim(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[\n\r\t]', ' ', 'g'),
                   '\.{2,}', '.', 'g'),
                 ' a ', ' ', 'g'),
               '  +', ' ', 'g')
           ))) AS clean_hash,
           length(lower(trim(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[\n\r\t]', ' ', 'g'),
                   '\.{2,}', '.', 'g'),
                 ' a ', ' ', 'g'),
               '  +', ' ', 'g')
           ))) AS clean_len
    FROM documents
    """,
)
def clean_text(spark, sf_dir):
    # E5 — the clean_text normalization chain (pdf_to_orpml.py:20-57),
    # pure regexp_replace built-ins: stays in whole-stage codegen.
    docs = _t(spark, sf_dir, "documents")
    cleaned = X.clean_text("text")
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_hash"),
        F.length(cleaned).cast("bigint").alias("clean_len"),
    )


@declared(
    "date_norm",
    """
    SELECT event_id, date_trunc('day', ts) AS day,
           CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day
    FROM events
    """,
)
def date_norm(spark, sf_dir):
    # E7 — date normalization to day grain + components (pdf PDF-date and
    # ISO/UTC formatting, pdf_to_orpml.py:98-106)
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    )


@declared(
    "flatten_remap",
    "SELECT event_id, ts AS event_time, event_type AS kind FROM events",
)
def flatten_remap(spark, sf_dir):
    # E8 — nested-struct flatten + key remap (extract_graph_elems.py:20-30):
    # pack into a struct, then select struct.* with renames.
    events = _t(spark, sf_dir, "events")
    nested = events.select(
        "event_id", F.struct(F.col("ts"), F.col("event_type")).alias("meta")
    )
    return nested.select(
        "event_id",
        F.col("meta.ts").alias("event_time"),
        F.col("meta.event_type").alias("kind"),
    )


@declared(
    "hash_id",
    """
    SELECT doc_id,
           substr(sha256(lower(regexp_replace(
             source || lang || CAST(doc_id AS VARCHAR),
             '[^a-zA-Z0-9]', '', 'g'))), 1, 32) AS node_id
    FROM documents
    """,
)
def hash_id(spark, sf_dir):
    # E9 — deterministic id hash over key fields (functions.py:5-8)
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.hash_id("source", "lang", "doc_id").alias("node_id")
    )


# ---------------------------------------------------------------------------
# N-series — enrichment operators (relational halves)
# ---------------------------------------------------------------------------


@declared(
    "title_rules",
    """
    SELECT doc_id,
           CASE WHEN len(string_split(trim(text), ' ')) > 40 THEN 'generate'
                WHEN n_chars < 150 THEN 'keep-short'
                ELSE 'score' END AS title_rule
    FROM documents
    """,
)
def title_rules(spark, sf_dir):
    # N1 — title-selection heuristic thresholds (title_generation.py:49-94)
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", enr.title_rule("text", "n_chars").alias("title_rule")
    )


@declared(
    "title_window_max",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), w AS (
      SELECT doc_id, t, t[1:5] AS title, least(len(t) - 4, 1000) AS nw
      FROM toks WHERE len(t) >= 10
    ), s AS (
      SELECT doc_id,
             [CAST(len(list_filter(t[i:i+4], x -> list_contains(title, x))) AS INTEGER)
              for i in range(1, nw + 1)] AS scores
      FROM w
    )
    SELECT doc_id,
           list_max(scores) AS best_score,
           CAST(list_position(scores, list_max(scores)) AS BIGINT) AS best_window_idx
    FROM s
    """,
)
def title_window_max(spark, sf_dir):
    # N3 — metadata-title-in-text window scoring (get_title.py:10-87)
    docs = _t(spark, sf_dir, "documents")
    return enr.title_window_max(docs, text_col="text", id_col="doc_id")


@declared(
    "kw_dedupe_max",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS keyword
      FROM documents
    ), scored AS (
      SELECT doc_id, keyword, count(*) AS score FROM words GROUP BY 1, 2
    ), ranked AS (
      SELECT doc_id, keyword, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, keyword)
               AS rank
      FROM scored
    )
    SELECT doc_id, keyword, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def kw_dedupe_max(spark, sf_dir):
    # N6 — keyword dedupe-max + deterministic top-k (keyword_extraction.py:95-101)
    docs = _t(spark, sf_dir, "documents")
    return enr.keyword_dedupe_max(docs, id_col="doc_id", text_col="text", top_k=10)


@declared(
    "date_nearest",
    """
    WITH d AS (
      SELECT user_id, ts,
             abs(epoch_us(ts) // 1000000
                 - epoch_us(TIMESTAMP '2024-01-15') // 1000000) AS dd
      FROM events
    ), r AS (
      SELECT user_id, ts, dd,
             row_number() OVER (PARTITION BY user_id ORDER BY dd, ts) AS rn
      FROM d
    )
    SELECT user_id,
           CASE WHEN dd <= 5 * 86400 THEN ts
                ELSE TIMESTAMP '2024-01-15' END AS chosen_date
    FROM r WHERE rn = 1
    """,
)
def date_nearest(spark, sf_dir):
    # N9 — date closest to metadata date within ±margin, else keep the
    # metadata date (date_generation.py:77-100; margin scaled to the
    # events table's 1-month span)
    events = _t(spark, sf_dir, "events")
    return enr.nearest_date(
        events, key_col="user_id", date_col="ts",
        reference_date="2024-01-15", margin_days=5,
    )


@declared(
    "year_span",
    r"""
    SELECT doc_id, unnest(regexp_extract_all(
      source || '/' || CAST(1990 + doc_id % 30 AS VARCHAR) || '/doc',
      '\b((?:19|20)\d{2})\b', 1)) AS year
    FROM documents
    """,
)
def year_span(spark, sf_dir):
    # N10 — 4-digit year-span detection over a URI-like string
    # (legislative_origin_extraction.py:45-53)
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat_ws(
        "/", "source", (F.lit(1990) + F.col("doc_id") % 30).cast("string"), F.lit("doc")
    )
    return docs.select("doc_id", F.explode(X.year_spans(uri)).alias("year"))


@declared(
    "lo_candidates",
    """
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01')
    """,
)
def lo_candidates(spark, sf_dir):
    # N11 — candidate pruning semi-join (legislative_origin_extraction.py:56-83)
    part = _t(spark, sf_dir, "part")
    keys = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    return enr.candidate_prune(part, keys, "p_partkey").select("p_partkey", "p_name")


_NEEDLES = ["spark", "window", "vector", "customer", "merge"]


@declared(
    "lo_match",
    """
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), sent AS (
      SELECT doc_id, CAST(i AS BIGINT) AS sent_idx,
             array_to_string(t[(i*8+1):(i*8+8)], ' ') AS sentence
      FROM toks, unnest(range(CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(i)
    ), needles AS (
      SELECT unnest(['spark', 'window', 'vector', 'customer', 'merge']) AS needle
    ), m AS (
      SELECT s.doc_id, s.sent_idx, n.needle
      FROM sent s JOIN needles n
        ON contains(' ' || s.sentence || ' ', ' ' || n.needle || ' ')
    ), first AS (
      SELECT doc_id, min(sent_idx) AS first_idx FROM m GROUP BY doc_id
    )
    SELECT m.doc_id, m.sent_idx, m.needle
    FROM m JOIN first ON m.doc_id = first.doc_id AND m.sent_idx = first.first_idx
    """,
)
def lo_match(spark, sf_dir):
    # N12 — phrase match with first-sentence early stop, set-wise
    # (legislative_origin_extraction.py:86-127)
    docs = _t(spark, sf_dir, "documents")
    needles = spark.createDataFrame([(n,) for n in _NEEDLES], "needle string")
    return enr.phrase_match_first_sentence(
        docs, id_col="doc_id", text_col="text", needles=needles
    )


_RULEBOOK = [("spark", 3, "SPARK"), ("vector", 2, "VEC"), ("merge", 1, "MRG")]


@declared(
    "dti_rank",
    """
    WITH rules AS (
      SELECT * FROM (VALUES ('spark', CAST(3 AS BIGINT), 'SPARK'),
                            ('vector', CAST(2 AS BIGINT), 'VEC'),
                            ('merge', CAST(1 AS BIGINT), 'MRG'))
        AS t(phrase, priority, label)
    )
    SELECT d.doc_id,
           max(r.priority) AS dti_priority,
           arg_max(r.label, r.priority) AS document_type
    FROM documents d JOIN rules r
      ON contains(' ' || d.text || ' ', ' ' || r.phrase || ' ')
    GROUP BY d.doc_id
    """,
)
def dti_rank(spark, sf_dir):
    # N14 — rule-based document-type identification: priority-rank
    # resolution (rule_based_dti.py:12-67)
    docs = _t(spark, sf_dir, "documents")
    rulebook = spark.createDataFrame(
        _RULEBOOK, "phrase string, priority bigint, label string"
    )
    return enr.dti_rank(docs, id_col="doc_id", text_col="text", rulebook=rulebook)


@declared(
    "topic_paths",
    """
    SELECT doc_id, unnest([
      source,
      source || '/' || lang,
      source || '/' || lang || '/' || CAST(n_chars % 10 AS VARCHAR)
    ]) AS topic
    FROM documents
    """,
)
def topic_paths(spark, sf_dir):
    # N15 — topic-path prefix expansion (notebook cell 4 get_topic_path)
    docs = _t(spark, sf_dir, "documents")
    path = F.concat_ws("/", "source", "lang", (F.col("n_chars") % 10).cast("string"))
    return docs.select(
        "doc_id", F.explode(enr.topic_path_prefixes(path)).alias("topic")
    )


@declared(
    "reg_id",
    """
    SELECT doc_id,
           CASE WHEN contains(source || '/' || CAST(doc_id AS VARCHAR), 'src1')
                THEN 'special'
                ELSE string_split(source || '/' || CAST(doc_id AS VARCHAR), '/')[1]
           END AS regulator_id
    FROM documents
    """,
)
def reg_id(spark, sf_dir):
    # N16 — regulator-id derivation (notebook cell 4 get_reg_id)
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat_ws("/", "source", F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id", enr.regulator_id(uri, "src1", "special").alias("regulator_id")
    )


# ---------------------------------------------------------------------------
# Driver contract adapters
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
