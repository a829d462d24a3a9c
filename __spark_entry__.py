"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``rclip_server_spark.contract``, which registers every
implemented operator from SURVEY.md §2 as a (Spark query, DuckDB oracle SQL)
pair. See that module's docstring for the cross-engine determinism rules
(left-assoc float folds, integer-cents aggregation, unix-micros timestamps).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rclip_server_spark import contract as _contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference §3.1): parse 'zebra -stripes +2spots' →
    weighted-term combinator → distributed cosine top-12 on sf0.001."""
    return _contract.entry(spark)


def queries():
    return _contract.queries()


def oracle_sql():
    return _contract.oracle_sql()
