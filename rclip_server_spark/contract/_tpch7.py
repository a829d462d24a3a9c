"""Auto-split registry module — see contract/__init__.py."""
from __future__ import annotations

from ._base import *  # noqa: F401,F403
from ._base import _register, _t, _utc  # noqa: F401
from ._versioned_rows import _vt_build  # noqa: F401

# ===========================================================================
# TPC-H-style relational breadth, round 7: Q4 / Q19 / Q16 adaptations to the
# fixture schema (no l_commitdate/l_receiptdate/p_container/partsupp — each
# query keeps the ORIGINAL's plan shape: Q4 = EXISTS semi-join counted by
# priority, Q19 = disjunctive multi-bracket join predicate, Q16 = distinct
# suppliers per part-attribute group with a NOT-IN anti-subquery). Shared
# SQL text runs on BOTH engines (spark.sql over registered views vs DuckDB),
# the pure-SQL-surface rule of the sql_ family.
# ===========================================================================

_Q4_BODY = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
"""


def _sql_q4_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4-style order-priority check (EXISTS → left-semi join,
    counted per priority class; the fixture lacks commit/receipt dates so
    'late line item' is l_shipdate > o_orderdate — same semi-join plan)."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q4_BODY)


_register("sql_q4_order_priority", _sql_q4_query, _Q4_BODY)


_Q19_BODY = """
    SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""


def _sql_q19_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-style discounted-revenue over a DISJUNCTIVE bracket
    predicate spanning both join sides — the optimizer stress: the
    common p_partkey equi-join must stay a hash join with the OR-bracket
    as a post-join filter (plus pushable per-side conjuncts), never a
    nested loop."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q19_BODY)


_register("sql_q19_bracket_revenue", _sql_q19_query, _Q19_BODY)


_Q16_BODY = """
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
"""


def _sql_q16_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16-style supplier-variety count: DISTINCT aggregation per
    part attribute group with a NOT-IN anti-subquery (null-aware anti
    join) — lineitem stands in for partsupp as the part↔supplier
    relation, keeping Q16's plan shape (join → anti-join → distinct
    count) on the fixture schema."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q16_BODY)


_register("sql_q16_supplier_variety", _sql_q16_query, _Q16_BODY)


def _vt_compose_builder(spark: SparkSession, sf: str, path: str) -> None:
    from ..sources import matview as MV
    from ..sources import versioned as VT

    tv, av = path + "_toks", path + "_agg"
    docs = _t(spark, sf, "documents").select("doc_id", "text")

    def toks(df):
        return df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok"))

    VT.create(spark, path, docs.where(F.col("doc_id") % 3 != 2))
    MV.create_transform_view(spark, path, tv, key="doc_id",
                             transform=toks, name="toks-v1")
    MV.create_agg_view(spark, tv, av, key="doc_id", group_cols=["tok"])
    # append-only hop through both views
    VT.append(spark, path, docs.where(F.col("doc_id") % 3 == 2))
    MV.refresh_transform_view(spark, tv, toks, "toks-v1", recompute_fraction=None)
    MV.refresh_agg_view(spark, av, recompute_fraction=None)
    # rewrite: every %5 doc's tokens REPLACED (the transform view commits
    # delete_and_append; the agg view must consume that rewrite through
    # the MULTISET diff — the view's key repeats per token row)
    VT.upsert(spark, path,
              docs.where(F.col("doc_id") % 5 == 0).select(
                  "doc_id",
                  F.concat(F.lit("upd t"),
                           (F.col("doc_id") % 4).cast("string"))
                  .alias("text")),
              "doc_id")
    MV.refresh_transform_view(spark, tv, toks, "toks-v1", recompute_fraction=None)
    MV.refresh_agg_view(spark, av, recompute_fraction=None)
    # retraction with per-doc duplicate tokens retracting by multiplicity
    VT.delete_rows(
        spark, path,
        docs.where(F.col("doc_id") % 7 == 0).select("doc_id"), "doc_id")
    MV.refresh_transform_view(spark, tv, toks, "toks-v1", recompute_fraction=None)
    MV.refresh_agg_view(spark, av, recompute_fraction=None)


def _vt_view_composition(spark: SparkSession, sf: str) -> DataFrame:
    """VIEWS COMPOSE: token-count agg view maintained OVER a flatMap
    transform view (one doc → many token rows, key repeating), advanced
    through an append, a text-rewriting upsert, and a delete — three
    incremental hops on each of two view layers, no recompute anywhere.
    The rewrite hop exercises table_changes_multiset (full-row
    multiplicity diff): the keyed diff would over-count replaced tokens.
    Oracle: the composed state equals token counts over the FINAL
    corpus, straight SQL."""
    from ..sources import matview as MV

    path = _vt_build(spark, sf, "compose", _vt_compose_builder)
    return MV.read_agg_view(spark, path + "_agg").select(
        "tok", F.col("cnt").cast("long").alias("cnt"))


_register(
    "vt_view_composition",
    _vt_view_composition,
    """
    WITH final AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'upd t' || CAST(doc_id % 4 AS VARCHAR)
                  ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0),
    toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM final)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
    """,
)


# ===========================================================================
# TPC-H-style relational breadth, round 7 (second batch): Q7 / Q13 / Q17 /
# Q22 adaptations — multi-hop snowflake join with a symmetric nation-pair
# predicate, left-outer count distribution, correlated scalar-subquery
# threshold, and NOT EXISTS anti-join + scalar subquery over a filtered
# domain. Determinism: money and thresholds in integer cents (avg of exact
# ints = exact sum / exact count — double AVG over raw doubles would be
# aggregation-order-dependent); year() cast BIGINT on both engines.
# ===========================================================================

_Q7_BODY = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_cents) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS volume_cents
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


def _sql_q7_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-style volume shipping: the 6-table snowflake join with a
    SYMMETRIC nation-pair predicate (two nation dims aliased from one
    table) — the join-reordering stress; both nation sides broadcast."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q7_BODY)


_register("sql_q7_nation_volume", _sql_q7_query, _Q7_BODY)


_Q13_BODY = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
"""


def _sql_q13_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER join
    with an extra join-side predicate (customers with ZERO matching
    orders must appear at c_count = 0 — an inner join silently drops
    them), then a second aggregation over the first's output."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q13_BODY)


_register("sql_q13_order_count_distribution", _sql_q13_query, _Q13_BODY)


_Q17_BODY = """
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * avg(CAST(l2.l_quantity AS BIGINT))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


def _sql_q17_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: CORRELATED scalar
    subquery computing a per-part average threshold (planned as an
    aggregate + self-join, never a per-row re-scan). Quantities cast to
    BIGINT inside the AVG so the threshold is exact-integer-sum /
    exact-count — deterministic across engines and aggregation orders,
    where a raw double AVG would not be."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q17_BODY)


_register("sql_q17_small_quantity_revenue", _sql_q17_query, _Q17_BODY)


_Q22_BODY = """
    SELECT c_nationkey AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c
    WHERE c_nationkey IN (1, 3, 5, 7, 9)
      AND CAST(round(c_acctbal * 100) AS BIGINT) > (
        SELECT avg(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        FROM customer c2
        WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 3, 5, 7, 9))
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 420000)
    GROUP BY c_nationkey
"""


def _sql_q22_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22-style global-sales-opportunity: uncorrelated scalar
    subquery (above-average balance over a filtered domain, in exact
    cents) + NOT EXISTS anti-join against orders (customers with no
    LARGE order — every fixture customer has some order, so the plain
    no-orders predicate would be vacuously empty), grouped by the
    nation-key stand-in for the phone country code (the fixture has no
    c_phone)."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q22_BODY)


_register("sql_q22_idle_customers", _sql_q22_query, _Q22_BODY)


def _vt_distinct_builder(spark: SparkSession, sf: str, path: str) -> None:
    from ..sources import matview as MV
    from ..sources import versioned as VT

    v1, v2 = path + "_pairs", path + "_distinct"
    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.length("text").alias("n"))
    VT.create(spark, path, docs.where(F.col("doc_id") % 3 != 2))
    # level 1: one row per LIVE (lang, n) pair
    MV.create_agg_view(spark, path, v1, key="doc_id",
                       group_cols=["lang", "n"])
    # level 2: count the level-1 ROWS per lang == COUNT(DISTINCT n).
    # (key is vestigial for agg views since the multiset diff — it only
    # needs to name an existing column)
    MV.create_agg_view(spark, v1, v2, key="lang", group_cols=["lang"])

    def refresh():
        MV.refresh_agg_view(spark, v1, recompute_fraction=None)
        MV.refresh_agg_view(spark, v2, recompute_fraction=None)

    VT.append(spark, path, docs.where(F.col("doc_id") % 3 == 2))
    refresh()
    # rewrite: %5 docs change text -> their (lang, n) pair may retract
    # to zero and LEAVE view1, shrinking view2's distinct count
    VT.upsert(spark, path,
              docs.where(F.col("doc_id") % 5 == 0).select(
                  "doc_id", "lang",
                  (F.col("n") % 7 + 1).alias("n")),
              "doc_id")
    refresh()
    VT.delete_rows(
        spark, path,
        docs.where(F.col("doc_id") % 11 == 0).select("doc_id"), "doc_id")
    refresh()


def _vt_distinct_count_view(spark: SparkSession, sf: str) -> DataFrame:
    """Incrementally-maintained EXACT COUNT DISTINCT — no sketch, no
    special operator, pure view COMPOSITION: a level-1 agg view holds
    one row per live (lang, length) pair (a pair whose count retracts to
    zero leaves the view), and a level-2 agg view over it counts rows
    per lang. Both levels refresh for the cost of the changes; the
    level-2 refresh consumes level-1's overwrites through the multiset
    diff. Oracle: plain COUNT(DISTINCT ...) over the final corpus."""
    from ..sources import matview as MV

    path = _vt_build(spark, sf, "distinct", _vt_distinct_builder)
    return MV.read_agg_view(spark, path + "_distinct").select(
        "lang", F.col("cnt").cast("long").alias("n_distinct_lengths"))


_register(
    "vt_distinct_count_view",
    _vt_distinct_count_view,
    """
    WITH final AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 5 = 0 THEN length(text) % 7 + 1
                  ELSE length(text) END AS n
      FROM documents WHERE doc_id % 11 <> 0)
    SELECT lang, CAST(count(DISTINCT n) AS BIGINT) AS n_distinct_lengths
    FROM final GROUP BY lang
    """,
)


def _vt_jt_builder(spark: SparkSession, sf: str, path: str) -> None:
    from ..sources import matview as MV
    from ..sources import versioned as VT

    rpath, view = path + "_cust", path + "_view"
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long")
         .alias("price_cents"))
    cust = _t(spark, sf, "customer").select(
        "c_custkey", F.col("c_custkey").alias("custkey"), "c_mktsegment")
    VT.create(spark, path, orders.where(F.col("o_orderkey") % 4 != 3))
    VT.create(spark, rpath, cust.where(F.col("c_custkey") % 5 != 4))
    MV.create_join_table_view(spark, path, rpath, view, on="custkey",
                              left_key="o_orderkey", right_key="c_custkey")
    # left append: delete-free fast refresh
    VT.append(spark, path, orders.where(F.col("o_orderkey") % 4 == 3))
    MV.refresh_join_table_view(spark, view, recompute_fraction=None)
    # right delete + append in one interval: retractions + fresh pairs
    VT.delete_rows(
        spark, rpath,
        cust.where(F.col("c_custkey") % 7 == 0).select("c_custkey"),
        "c_custkey")
    VT.append(spark, rpath, cust.where(F.col("c_custkey") % 5 == 4))
    MV.refresh_join_table_view(spark, view, recompute_fraction=None)


def _vt_join_table_view(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level maintained JOIN TABLE (matview.create_join_table_view):
    the denormalized orders⋈customer serving table advanced through a
    left append and a right delete+append rewrite interval by netted
    signed pair deltas applied as one delete-vector + append commit per
    refresh — the oracle checks the materialized ROWS equal the direct
    join of the two final sources."""
    from ..sources import versioned as VT

    path = _vt_build(spark, sf, "jt", _vt_jt_builder)
    return VT.read(spark, path + "_view").select(
        "o_orderkey", "custkey", "price_cents", "c_custkey",
        "c_mktsegment")


_register(
    "vt_join_table_view",
    _vt_join_table_view,
    """
    WITH r AS (
      SELECT c_custkey, c_custkey AS custkey, c_mktsegment FROM customer
      WHERE (c_custkey % 5 <> 4 AND c_custkey % 7 <> 0)
         OR c_custkey % 5 = 4),
    l AS (
      SELECT o_orderkey, o_custkey AS custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders)
    SELECT o_orderkey, custkey, price_cents, c_custkey, c_mktsegment
    FROM l JOIN r USING (custkey)
    """,
)


def _vt_latest_builder(spark: SparkSession, sf: str, path: str) -> None:
    from ..sources import matview as MV
    from ..sources import versioned as VT

    view = path + "_view"
    _utc(spark)
    ev = _t(spark, sf, "events").select(
        "event_id", "user_id",
        F.struct(
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("etype"),
        ).alias("pair"))
    VT.create(spark, path, ev.where(F.col("event_id") % 3 != 2))
    MV.create_agg_view(spark, path, view, key="event_id",
                       group_cols=["user_id"], minmax_cols=["pair"])
    VT.append(spark, path, ev.where(F.col("event_id") % 3 == 2))
    MV.refresh_agg_view(spark, view, recompute_fraction=None)
    # retract rows INCLUDING some users' current latest: the affected
    # groups must recompute to the true next-latest
    VT.delete_rows(
        spark, path,
        ev.where(F.col("event_id") % 13 == 0).select("event_id"),
        "event_id")
    MV.refresh_agg_view(spark, view, recompute_fraction=None)


def _vt_latest_per_key_view(spark: SparkSession, sf: str) -> DataFrame:
    """'LATEST event per user' as a maintained view with ZERO new engine
    code: min/max maintenance over a lexicographic STRUCT column
    (ts_us, event_id, event_type) — monotone merge on inserts, affected-
    group recompute when a user's current latest retracts (this builder
    deletes some latests on purpose). The argmax-by-time materialization
    every serving layer wants, expressed as existing machinery. Oracle:
    the deterministic window winner (ts DESC, event_id DESC) per user
    over the final corpus."""
    from ..sources import matview as MV

    path = _vt_build(spark, sf, "latest", _vt_latest_builder)
    return MV.read_agg_view(spark, path + "_view").select(
        "user_id",
        F.col("max_pair.ts_us").alias("latest_ts_us"),
        F.col("max_pair.eid").alias("latest_event_id"),
        F.col("max_pair.etype").alias("latest_event_type"),
        F.col("cnt").cast("long").alias("n_events"))


_register(
    "vt_latest_per_key_view",
    _vt_latest_per_key_view,
    """
    WITH final AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
      FROM events WHERE event_id % 13 <> 0),
    ranked AS (
      SELECT user_id, ts_us, event_id, event_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts_us DESC, event_id DESC, event_type DESC
             ) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM final)
    SELECT user_id, ts_us AS latest_ts_us, event_id AS latest_event_id,
           event_type AS latest_event_type,
           CAST(n_events AS BIGINT) AS n_events
    FROM ranked WHERE rn = 1
    """,
)


# ===========================================================================
# TPC-H-style relational breadth, round 7 (third batch): Q8 / Q15 / Q21
# adaptations — market-share ratio over a snowflake join, a named revenue
# view feeding a scalar-max filter, and the multi-EXISTS "kept orders
# waiting" pattern. Same shared-SQL-text rule; ratios divide exact cent
# sums (one double division at the end).
# ===========================================================================

_Q8_BODY = """
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_cents
                         ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(volume_cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume_cents
                         ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume_cents) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS volume_cents,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
"""


def _sql_q8_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-style national market share: the 8-table snowflake
    (part, lineitem, supplier, orders, customer, nation x2, region) with
    a conditional-sum ratio — numerator and denominator kept as exact
    BIGINT cents, ONE double division at the end (aggregation-order
    independent on both engines)."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q8_BODY)


_register("sql_q8_market_share", _sql_q8_query, _Q8_BODY)


_Q15_BODY = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
"""


def _sql_q15_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15-style top supplier: a named revenue CTE consumed TWICE
    (join + scalar-max subquery) — exactly the recompute the maintained
    agg view family exists to avoid at scale; here the SQL surface form,
    BIGINT-cents so the max comparison is exact."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q15_BODY)


_register("sql_q15_top_supplier", _sql_q15_query, _Q15_BODY)


_Q21_BODY = """
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_2'
      AND l1.l_shipdate > o.o_orderdate
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate)
    GROUP BY s.s_name
"""


def _sql_q21_query(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21-style suppliers-who-kept-orders-waiting: the EXISTS +
    NOT EXISTS pair over the SAME relation (multi-supplier orders where
    ONLY this supplier shipped late — the fixture lacks receipt/commit
    dates, so 'late' is l_shipdate > o_orderdate) — the hardest
    correlated-subquery plan shape in the suite (two semi/anti joins
    against lineitem)."""
    from ..sources.catalog import register_views

    _utc(spark)
    register_views(spark, sf)
    return spark.sql(_Q21_BODY)


_register("sql_q21_waiting_suppliers", _sql_q21_query, _Q21_BODY)
