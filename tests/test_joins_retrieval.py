"""Semantics + physical-plan shape for the time-ordered joins
(operators/joins.py), BM25/RRF retrieval (operators/retrieval.py), and the
n-gram contamination check (operators/text_analysis.py)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from rclip_server_spark.operators import joins, retrieval, text_analysis


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 0, minute, second, micro)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts(5)),
            (2, 100, _ts(10)),
            (3, 100, _ts(2)),  # before any quote
            (4, 200, _ts(7)),
            (5, 300, _ts(7)),  # key with no quotes at all
        ],
        "trade_id long, user_id long, ts timestamp",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (100, _ts(4), 10.0),
            (100, _ts(5), 11.0),  # equal-ts: must match trade 1
            (100, _ts(9), 12.0),
            (200, _ts(1), 20.0),
        ],
        "user_id long, ts timestamp, price double",
    )


def test_asof_backward_semantics(trades, quotes):
    out = {
        r.trade_id: (r.r_price, r.gap_us)
        for r in joins.asof_join(trades, quotes, on="user_id", ts="ts").collect()
    }
    assert out[1] == (11.0, 0)  # equal ts matches
    assert out[2] == (12.0, 60_000_000)  # latest at-or-before 00:10 is 00:09
    assert out[3] == (None, None)  # nothing before 00:02
    assert out[4] == (20.0, 360_000_000)
    assert out[5] == (None, None)  # key absent from right


def test_asof_tolerance_nulls_stale_matches(trades, quotes):
    out = {
        r.trade_id: r.r_price
        for r in joins.asof_join(
            trades, quotes, on="user_id", ts="ts", tolerance="2 minutes"
        ).collect()
    }
    assert out[1] == 11.0
    assert out[2] == 12.0  # 1 minute back, inside tolerance
    assert out[4] is None  # 6 minutes back, beyond tolerance


def test_asof_randomized_matches_quadratic_reference(spark):
    """Seeded random cross-check of the window-based as-of join against a
    driver-side quadratic reference: many keys, duplicate left timestamps,
    keys missing from the right, and with/without tolerance."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    lrows = [
        (int(i), int(rng.integers(0, 12)), int(rng.integers(0, 10_000)))
        for i in range(n_l)
    ]
    # right keys 0..9 only -> keys 10,11 unmatched; unique (key, ts)
    seen = set()
    rrows = []
    for j in range(n_r):
        k, t = int(rng.integers(0, 10)), int(rng.integers(0, 10_000))
        if (k, t) not in seen:
            seen.add((k, t))
            rrows.append((k, t, float(j)))
    left = spark.createDataFrame(lrows, "lid long, k long, t long").select(
        "lid", "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts")
    )
    right = spark.createDataFrame(rrows, "k long, t long, px double").select(
        "k", F.timestamp_micros(F.col("t") * 1_000_000).alias("ts"), "px"
    )

    for tol_spec, tol_s in ((None, None), ("100 seconds", 100)):
        got = {
            r.lid: (r.r_px, r.gap_us)
            for r in joins.asof_join(
                left, right, on="k", ts="ts", tolerance=tol_spec
            ).collect()
        }
        for lid, k, t in lrows:
            cands = [(rt, px) for (rk, rt, px) in rrows if rk == k and rt <= t]
            if cands:
                rt, px = max(cands)  # latest ts; (k, ts) unique so no tie
                want = (px, (t - rt) * 1_000_000)
                if tol_s is not None and t - rt > tol_s:
                    want = (None, None)
            else:
                want = (None, None)
            assert got[lid] == want, (lid, k, t, got[lid], want)


def test_asof_latest_by_matches_preagg(spark):
    """latest_by (equal-ts right dedupe riding the window sort, r14 opt)
    returns exactly what the groupBy((key, ts), max) pre-aggregation
    returned — row-identical on a frame with duplicate (key, ts) right
    rows — and removes the pre-agg's Exchange from the plan."""
    rng_rows = [
        # user 100: three views at the SAME ts (ids 7, 9, 8 -> max 9),
        # plus a later singleton
        (100, _ts(4), 7), (100, _ts(4), 9), (100, _ts(4), 8),
        (100, _ts(9), 3),
        # user 200: duplicate ts pair only
        (200, _ts(1), 5), (200, _ts(1), 6),
    ]
    views = spark.createDataFrame(
        rng_rows, "user_id long, ts timestamp, view_id long")
    clicks = spark.createDataFrame(
        [(1, 100, _ts(4)), (2, 100, _ts(10)), (3, 200, _ts(2)),
         (4, 300, _ts(5))],
        "click_id long, user_id long, ts timestamp")

    deduped = views.groupBy("user_id", "ts").agg(
        F.max("view_id").alias("view_id"))
    want = sorted(
        tuple(r) for r in joins.asof_join(
            clicks, deduped, on="user_id", ts="ts").collect())
    got_df = joins.asof_join(clicks, views, on="user_id", ts="ts",
                             latest_by="view_id")
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want
    # the max-id duplicate won at both equal-ts groups
    by_click = {r.click_id: r.r_view_id for r in got_df.collect()}
    assert by_click[1] == 9 and by_click[3] == 6
    # plan shape: ONE exchange (the window's), no aggregate — count the
    # FINAL adaptive plan only (toString appends an "Initial Plan"
    # section that repeats every node)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1
    assert "HashAggregate" not in final


def test_asof_latest_by_must_be_payload(trades, quotes):
    with pytest.raises(ValueError, match="latest_by"):
        joins.asof_join(trades, quotes, on="user_id", ts="ts",
                        latest_by="nope")


def test_asof_plan_is_window_not_join(trades, quotes):
    plan = joins.asof_join(trades, quotes, on="user_id", ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # one shuffle + sort, never a nested-loop join
    assert "Window" in plan


def test_band_self_join_matches_naive(events):
    got = {
        (r.a_id, r.b_id)
        for r in joins.band_self_join(events, band="5 minutes").collect()
    }
    a = events.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("a_id"),
        F.unix_micros("ts").alias("a_us"),
    )
    b = events.select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("b_id"),
        F.unix_micros("ts").alias("b_us"),
    )
    naive = {
        (r.a_id, r.b_id)
        for r in a.join(b, "k")
        .where(
            (F.col("b_us") >= F.col("a_us"))
            & (F.col("b_us") <= F.col("a_us") + 300_000_000)
            & (
                (F.col("a_us") < F.col("b_us"))
                | ((F.col("a_us") == F.col("b_us")) & (F.col("a_id") < F.col("b_id")))
            )
        )
        .collect()
    }
    assert got == naive
    assert len(got) > 0


def test_band_self_join_no_cartesian(events):
    plan = joins.band_self_join(events)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_bm25_matches_reference_formula(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark join"),
            (2, "join filter scan"),
            (3, "scan scan scan scan"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    terms = ["spark", "join"]
    got = {
        r.doc_id: r.bm25
        for r in retrieval.bm25_scores(docs, terms).collect()
    }
    # driver-side reference computation
    corpus = {1: ["spark", "spark", "join"], 2: ["join", "filter", "scan"],
              3: ["scan"] * 4, 4: []}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    k1, b = 1.2, 0.75
    for doc_id, toks in corpus.items():
        want = 0.0
        for term in terms:
            tf = toks.count(term)
            dfq = sum(1 for t in corpus.values() if term in t)
            idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
            want += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        assert abs(got[doc_id] - want) < 1e-12
    assert got[4] == 0.0  # empty doc keeps its row, scores zero


def test_bm25_topk_excludes_zero_and_orders(documents):
    rows = retrieval.bm25_topk(documents, ["vector", "join"], k=5).collect()
    assert 0 < len(rows) <= 5
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_rrf_fusion_known_ranks(spark):
    text = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, bm25 double"
    )
    vec = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    got = {r.doc_id: r for r in retrieval.rrf_fusion(text, vec, k=10).collect()}
    assert got[2].t_rank == 2 and got[2].v_rank == 1
    assert abs(got[2].rrf - (1 / 62 + 1 / 61)) < 1e-12
    assert got[1].v_rank is None and abs(got[1].rrf - 1 / 61) < 1e-12
    assert got[4].t_rank is None and abs(got[4].rrf - 1 / 62) < 1e-12
    # doc 2 (on both lists) fuses highest
    best = max(got.values(), key=lambda r: r.rrf)
    assert best.doc_id == 2


def test_ngram_contamination_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "bench"),
            (2, "a b c d e", "train"),   # identical to benchmark -> 1.0
            (3, "x y z w q", "train"),   # disjoint -> 0.0
            (4, "a b c x y z", "train"),  # partial overlap
            (5, "hi", "train"),          # too short for a 3-gram -> 0 grams
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in text_analysis.ngram_contamination(
            docs, F.col("source") == "bench", n=3
        ).collect()
    }
    assert set(out) == {2, 3, 4, 5}  # benchmark rows excluded from output
    assert out[2].contamination == 1.0
    assert out[3].contamination == 0.0
    assert out[4].n_grams == 4 and out[4].n_hit == 1  # only 'a b c' overlaps
    assert out[5].n_grams == 0 and out[5].contamination == 0.0


def test_salted_join_equals_plain_join(spark):
    from conftest import SF_DIR

    from rclip_server_spark.operators import skew
    from rclip_server_spark.sources import load_table

    orders = load_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey"
    )
    plain = {
        (r.o_orderkey, r.c_nationkey)
        for r in orders.join(customer, "c_custkey")
        .select("o_orderkey", "c_nationkey")
        .collect()
    }
    salted = {
        (r.o_orderkey, r.c_nationkey)
        for r in skew.salted_join(orders, customer, "c_custkey", salt_buckets=4)
        .select("o_orderkey", "c_nationkey")
        .collect()
    }
    assert salted == plain


# ---------------------------------------------------------------------------
# more_like_this (TF-IDF cosine via inverted-index join)
# ---------------------------------------------------------------------------


def test_more_like_this_finds_near_copy(spark):
    from rclip_server_spark.operators.retrieval import more_like_this

    df = spark.createDataFrame(
        [
            (1, "spark shuffle join agg window"),
            (2, "spark shuffle join agg windows extra"),   # near-copy of 1
            (3, "completely unrelated words entirely different"),
            (4, "spark appears once here only"),
        ],
        ["doc_id", "text"],
    )
    rows = more_like_this(df, 1, k=3).collect()
    assert rows[0].doc_id == 2            # near-copy ranks first
    assert rows[0].cosine > rows[-1].cosine
    assert all(r.doc_id != 1 for r in rows)  # query doc excluded
    assert all(0.0 <= r.cosine <= 1.0 + 1e-9 for r in rows)


def test_more_like_this_no_shared_terms_absent(spark):
    from rclip_server_spark.operators.retrieval import more_like_this

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha other")],
        ["doc_id", "text"],
    )
    ids = {r.doc_id for r in more_like_this(df, 1, k=10).collect()}
    assert ids == {3}  # doc 2 shares no term -> never scored


def test_ngram_repetition_ratio(spark):
    from pyspark.sql import functions as F

    from rclip_server_spark.operators.text_analysis import ngram_repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # heavy 3-gram repetition
            (2, "one two three four five six"),  # all distinct
            (3, "xy"),                  # < 3 tokens -> 0.0
        ],
        ["doc_id", "text"],
    ).select("doc_id", ngram_repetition_ratio(F.col("text"), 3).alias("rep"))
    out = {r.doc_id: r.rep for r in df.collect()}
    assert out[1] > 0.5
    assert out[2] == 0.0
    assert out[3] == 0.0


def test_fuzzy_string_join_finds_typos(spark):
    from rclip_server_spark.operators.joins import fuzzy_string_join

    left = spark.createDataFrame(
        [("window",), ("shuffle",), ("join",)], ["w"]
    )
    right = spark.createDataFrame(
        [("wnidow",), ("shufle",), ("completely",)], ["w2"]
    )
    pairs = {(r.sa, r.sb): r.dist for r in
             fuzzy_string_join(left, right, "w", "w2", max_dist=2).collect()}
    assert pairs[("window", "wnidow")] == 2   # transposition = 2 edits
    assert pairs[("shuffle", "shufle")] == 1  # deletion = 1 edit
    assert all(sb != "completely" for (_, sb) in pairs)


def test_fuzzy_string_join_excludes_exact_and_far(spark):
    from rclip_server_spark.operators.joins import fuzzy_string_join

    left = spark.createDataFrame([("alpha",), ("beta",)], ["w"])
    right = spark.createDataFrame([("alpha",), ("alphax",), ("gamma",)], ["w2"])
    pairs = [(r.sa, r.sb) for r in
             fuzzy_string_join(left, right, "w", "w2", max_dist=1).collect()]
    # exact matches excluded (sa != sb); gamma too far; only alpha~alphax
    assert pairs == [("alpha", "alphax")]


def test_salted_join_matches_plain_join(spark, events):
    from rclip_server_spark.operators import joins

    # skew: fold most user_ids onto one hot key
    big = events.limit(400).select(
        "event_id",
        F.when(F.col("event_id") % 4 != 0, F.lit(7))
        .otherwise(F.col("user_id")).alias("user_id"),
        "event_type")
    small = (events.select("user_id").distinct().limit(50)
             .withColumn("seg", F.col("user_id") % 5))
    for how in ("inner", "left"):
        got = joins.salted_join(big, small, on="user_id", n_salts=4,
                                how=how)
        want = big.join(small, ["user_id"], how)
        assert sorted(map(tuple, got.collect())) == \
               sorted(map(tuple, want.collect()))
        assert got.columns == want.columns
    # the physical plan stays an equi-join — never a nested loop
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_guards(spark, events):
    from rclip_server_spark.operators import joins
    import pytest

    small = events.select("user_id").distinct().limit(5)
    with pytest.raises(ValueError, match="n_salts"):
        joins.salted_join(events, small, "user_id", n_salts=1)
    with pytest.raises(ValueError, match="inner/left"):
        joins.salted_join(events, small, "user_id", how="right")
