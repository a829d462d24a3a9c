"""Corpus-level text analysis: TF-IDF (SURVEY.md §F 'text analysis over
documents'). Token-level functions live in functions/text.py; this module
holds the operators that need aggregation across the corpus.

Scale shape: two hash aggregations (term frequency per doc, document
frequency per term) + one broadcast of the per-term idf — no all-pairs, no
driver collect. The doc count joins in as a 1-row cross join so the whole
plan stays lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def tfidf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, token, tf, df, tfidf) with tfidf = tf * ln(N / df).

    tf = occurrences of token in the doc; df = docs containing the token;
    N = corpus size. Plain (non-smoothed) idf — matches the DuckDB twin in
    the contract exactly (same ln over the same integers)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(TXT.tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias(id_col),
            "token",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )


def top_terms_per_doc(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Top-k TF-IDF terms per document (rank ties broken on token for
    determinism)."""
    from pyspark.sql import Window

    scored = tfidf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(id_col, "token", "tfidf", "rnk")
    )
