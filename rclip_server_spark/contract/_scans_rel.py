"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _register, _t, _utc  # noqa: F401

# ===========================================================================
# B1-B3, B13-B15: scans, predicates, string ops
# ===========================================================================

_register(
    "b1_soft_delete_filter",
    # fixtures carry no deleted column; derive one deterministically (NULL ≡
    # live, rclip_server.py:210) and filter with writer.live_rows semantics
    lambda spark, sf: __import__("rclip_server_spark.sources.writer", fromlist=["live_rows"]).live_rows(
        _t(spark, sf, "documents").withColumn(
            "deleted",
            F.when(F.col("doc_id") % 10 == 0, F.lit(True))
            .when(F.col("doc_id") % 10 == 5, F.lit(None).cast("boolean"))
            .otherwise(F.lit(False)),
        )
    ).select("doc_id"),
    """
    SELECT doc_id FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN TRUE
                  WHEN doc_id % 10 = 5 THEN NULL
                  ELSE FALSE END AS deleted
      FROM documents)
    WHERE deleted IS NULL OR deleted = FALSE
    """,
)

_register(
    "b3_lowercase_predicate",
    lambda spark, sf: _t(spark, sf, "documents")
    .where(F.lower(F.col("text")) == F.col("text"))
    .select("doc_id"),
    "SELECT doc_id FROM documents WHERE lower(text) = text",
)

_EXT_CASE_SPARK = None  # built inline below
_URL_EXPR_SQL = (
    "('http://img.example/commons/pic_' || CAST(doc_id AS VARCHAR) || '.' || "
    "(['jpg', 'jpeg', 'png', 'gif', 'svg', 'webm', 'tiff'])[CAST(doc_id % 7 + 1 AS INT)])"
)

def _b13_query(spark: SparkSession, sf: str) -> DataFrame:
    exts = ["jpg", "jpeg", "png", "gif", "svg", "webm", "tiff"]
    url = F.concat(
        F.lit("http://img.example/commons/pic_"),
        F.col("doc_id").cast("string"),
        F.lit("."),
        F.element_at(F.array(*[F.lit(e) for e in exts]), (F.col("doc_id") % 7 + 1).cast("int")),
    )
    df = _t(spark, sf, "documents").select("doc_id", url.alias("url"))
    # B13 allowlist filter (IW:117-130) + B14 thumb-URL rewrite (IW:133-134)
    kept = df.where(F.regexp_extract("url", r"\.(jpg|jpeg|png|gif)$", 1) != "")
    return kept.select(
        "doc_id",
        "url",
        F.concat(
            F.regexp_replace("url", "/commons/", "/commons/thumb/"), F.lit("/600px-thumb")
        ).alias("thumb_url"),
    )

_register(
    "b13_b14_url_ops",
    _b13_query,
    f"""
    SELECT doc_id, url,
           regexp_replace(url, '/commons/', '/commons/thumb/') || '/600px-thumb' AS thumb_url
    FROM (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents)
    WHERE regexp_extract(url, '\\.(jpg|jpeg|png|gif)$', 1) <> ''
    """,
)

_register(
    "b15_regex_predicates",
    lambda spark, sf: _t(spark, sf, "part")
    .where(F.col("p_type").rlike("^(STANDARD|ECONOMY)") & F.col("p_name").rlike("[aeiou]{2}"))
    .select("p_partkey", "p_name", "p_type"),
    """
    SELECT p_partkey, p_name, p_type FROM part
    WHERE regexp_matches(p_type, '^(STANDARD|ECONOMY)')
      AND regexp_matches(p_name, '[aeiou]{2}')
    """,
)

_register(
    "b10_table_counts",
    lambda spark, sf: _t(spark, sf, "lineitem")
    .select(F.lit("lineitem").alias("tbl"))
    .groupBy("tbl")
    .agg(F.count(F.lit(1)).alias("n"))
    .unionByName(
        _t(spark, sf, "orders").select(F.lit("orders").alias("tbl")).groupBy("tbl").agg(F.count(F.lit(1)).alias("n"))
    )
    .unionByName(
        _t(spark, sf, "documents").select(F.lit("documents").alias("tbl")).groupBy("tbl").agg(F.count(F.lit(1)).alias("n"))
    )
    .unionByName(
        _t(spark, sf, "embeddings").select(F.lit("embeddings").alias("tbl")).groupBy("tbl").agg(F.count(F.lit(1)).alias("n"))
    ),
    """
    SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n FROM lineitem
    UNION ALL SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT) FROM documents
    UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT) FROM embeddings
    """,
)

# ===========================================================================
# §F relational substrate over the TPC-H-ish fixtures
# ===========================================================================


def _rel_q1(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents_col(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(cents_col(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                cents_col(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_register(
    "rel_q1_pricing_summary",
    _rel_q1,
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({cents('l_quantity')}) AS BIGINT) AS sum_qty_cents,
           CAST(SUM({cents('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
           CAST(SUM({cents('l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

_register(
    "rel_join_broadcast_agg",
    lambda spark, sf: _t(spark, sf, "orders")
    .join(F.broadcast(_t(spark, sf, "customer")), F.col("o_custkey") == F.col("c_custkey"))
    .groupBy("c_mktsegment")
    .agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents_col(F.col("o_totalprice"))).alias("sum_price_cents"),
    ),
    f"""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS sum_price_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)

_register(
    "rel_join_multiway",
    lambda spark, sf: _t(spark, sf, "customer")
    .join(F.broadcast(_t(spark, sf, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
    .join(F.broadcast(_t(spark, sf, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
    .join(_t(spark, sf, "orders"), F.col("o_custkey") == F.col("c_custkey"))
    .groupBy("r_name")
    .agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents_col(F.col("o_totalprice"))).alias("revenue_cents"),
        F.countDistinct("c_custkey").alias("n_customers"),
    ),
    f"""
    SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS revenue_cents,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY r_name
    """,
)

_register(
    "rel_semi_join",
    lambda spark, sf: _t(spark, sf, "customer")
    .join(_t(spark, sf, "orders"), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    .groupBy("c_nationkey")
    .agg(F.count(F.lit(1)).alias("n_with_orders")),
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_with_orders
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)

_register(
    "rel_anti_join_b8",
    lambda spark, sf: __import__("rclip_server_spark.sources.writer", fromlist=["anti_join_skip"]).anti_join_skip(
        _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey")),
        _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey")),
        "custkey",
    ),
    """
    SELECT c_custkey AS custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)

from pyspark.sql import Window as _W


def _rel_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    w = _W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


_register(
    "rel_window_rank",
    _rel_window_rank,
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
    FROM orders QUALIFY rnk <= 3
    """,
)


def _rel_window_running(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    o = _t(spark, sf, "orders")
    w = (
        _W.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents_col(F.col("o_totalprice"))).over(w).alias("run_cents"),
    )


_register(
    "rel_window_running_sum",
    _rel_window_running,
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM({cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
    FROM orders
    """,
)


def _rel_window_lag(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    o = _t(spark, sf, "orders")
    w = _W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    c = cents_col(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        (c - F.lag(c).over(w)).alias("delta_cents"),
    )


_register(
    "rel_window_lag_delta",
    _rel_window_lag,
    f"""
    SELECT o_custkey, o_orderkey,
           {cents('o_totalprice')} - lag({cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_cents
    FROM orders
    """,
)

_register(
    "rel_rollup",
    lambda spark, sf: _t(spark, sf, "orders")
    .rollup("o_orderstatus", "o_orderpriority")
    .agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents_col(F.col("o_totalprice"))).alias("sum_cents"),
    )
    .select(
        F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
        "n",
        "sum_cents",
    ),
    f"""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM({cents('o_totalprice')}) AS BIGINT) AS sum_cents
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)

_register(
    "rel_cube",
    lambda spark, sf: _t(spark, sf, "lineitem")
    .cube("l_returnflag", "l_linestatus")
    .agg(F.count(F.lit(1)).alias("n"))
    .select(
        F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
        "n",
    ),
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

_register(
    "rel_intersect_nations",
    lambda spark, sf: _t(spark, sf, "customer")
    .select(F.col("c_nationkey").alias("nationkey"))
    .intersect(_t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))),
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)

_register(
    "rel_except_nations",
    lambda spark, sf: _t(spark, sf, "customer")
    .select(F.col("c_nationkey").alias("nationkey"))
    .exceptAll(_t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")))
    .distinct(),
    """
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier)
    """,
)

_register(
    "rel_distinct_count",
    lambda spark, sf: _t(spark, sf, "orders")
    .groupBy("o_orderstatus")
    .agg(F.countDistinct("o_custkey").alias("n_custs")),
    """
    SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders GROUP BY o_orderstatus
    """,
)

_register(
    "rel_percentiles",
    lambda spark, sf: _t(spark, sf, "orders")
    .groupBy("o_orderstatus")
    .agg(F.percentile(F.col("o_totalprice"), F.lit([0.25, 0.5, 0.75])).alias("p"))
    .select(
        "o_orderstatus",
        F.round(F.element_at("p", 1), 4).alias("p25"),
        F.round(F.element_at("p", 2), 4).alias("p50"),
        F.round(F.element_at("p", 3), 4).alias("p75"),
    ),
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)

_register(
    "rel_approx_count_distinct",
    # approximate tier: HLL sketches differ across engines by design → rows-only
    lambda spark, sf: _t(spark, sf, "orders")
    .groupBy("o_orderstatus")
    .agg(F.approx_count_distinct("o_custkey").alias("approx_custs")),
    None,
)

_register(
    "rel_scalar_functions",
    lambda spark, sf: _t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") % 5).cast("long").alias("size_mod5"),
        F.abs(F.round(F.col("p_retailprice") * 100).cast("long") - 100000).alias("price_dist"),
    ),
    """
    SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS BIGINT) AS name_len,
           p_brand || '|' || p_type AS brand_type,
           CAST(p_size % 5 AS BIGINT) AS size_mod5,
           abs(CAST(round(p_retailprice * 100) AS BIGINT) - 100000) AS price_dist
    FROM part
    """,
)


def _rel_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    _utc(spark)
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_micros(F.date_trunc("month", "o_orderdate")).alias("month_start_us"),
    )


_register(
    "rel_date_functions",
    _rel_date_funcs,
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           strftime(o_orderdate, '%Y-%m') AS ym,
           epoch_us(date_trunc('month', o_orderdate)) AS month_start_us
    FROM orders
    """,
)

_register(
    "rel_json_extract",
    lambda spark, sf: _t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    ),
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)



def _rel_salted_join_skew(spark, sf):
    """Hot-key-skew salted join (operators/joins.py:salted_join): the
    big side's user_id is folded so one key carries ~75% of rows, the
    deterministic row-hash salt spreads it across 4 reducer slices,
    and the result multiset equals the plain join's — which is exactly
    what the DuckDB twin computes."""
    from ..operators import joins

    ev = _t(spark, sf, "events")
    big = ev.select(
        "event_id",
        F.when(F.col("event_id") % 4 != 0, F.lit(7))
        .otherwise(F.col("user_id")).alias("user_id"),
        "event_type")
    small = (ev.select("user_id").distinct()
             .where(F.col("user_id") % 50 == 0)
             .withColumn("seg", (F.col("user_id") % 5).cast("long")))
    return joins.salted_join(big, small, on="user_id", n_salts=4,
                             how="left")


_register(
    "rel_salted_join_skew",
    _rel_salted_join_skew,
    """
    WITH big AS (
      SELECT event_id,
             CASE WHEN event_id % 4 <> 0 THEN 7 ELSE user_id END
               AS user_id,
             event_type
      FROM events),
    small AS (
      SELECT DISTINCT user_id, CAST(user_id % 5 AS BIGINT) AS seg
      FROM events WHERE user_id % 50 = 0)
    SELECT big.user_id, big.event_id, big.event_type, small.seg
    FROM big LEFT JOIN small USING (user_id)
    """,
)


def _b16_local_binary_ingest(spark, sf):
    """B16's NETWORK-FREE half (rclip_server.py:440-446 serves local
    files; index_wikimedia.py:136-143 fetches remote ones): ingest a
    generated local binary-file corpus through Spark's distributed
    ``binaryFile`` source → extension allowlist (planning-time
    pathGlobFilter) → anti-join skip → stub embed → MERGE upsert, then
    read the indexed table back. Rows-only: DuckDB cannot run the
    pipeline (the OUTPUT here — basename/size/dim — is deterministic
    and pinned in tests/test_pipelines.py; paths/mtimes are
    machine-local)."""
    import os as _os
    import tempfile as _tempfile

    from .. import pipelines as _P

    d = _tempfile.mkdtemp(prefix="rclip_b16_")
    for i in range(12):
        ext = ("jpg", "png", "gif", "txt")[i % 4]
        with open(_os.path.join(d, f"pic_{i:03d}.{ext}"), "wb") as f:
            f.write(bytes([i % 251]) * (64 + i))
    table = _os.path.join(d, "_images")
    _P.index_local_images(spark, d, table)
    return (
        spark.read.parquet(table)
        .select(
            F.element_at(F.split("filepath", "/"), -1).alias("basename"),
            "size",
            F.size("vector").alias("dim"))
        .orderBy("basename"))


_register(
    "b16_local_binary_ingest",
    _b16_local_binary_ingest,
    None,  # pipeline over generated local files: no SQL twin by design
)
