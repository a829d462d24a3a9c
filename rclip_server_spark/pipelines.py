"""End-to-end composite pipelines (reference §3.3: index_wikimedia.py's whole
main loop as ONE DataFrame job).

The reference indexes sequentially — one image per HTTP round-trip, guarded
by a filelock, with a per-row existence re-check (IW:187-200). Expressed as a
DataFrame pipeline all of that dissolves: the anti-join does the incremental
skip (no driver-side set), the fetch/embed stages are batched map-only UDFs,
and the MERGE upsert replaces the filelock. Every stage before the sink is
lazy — one job, end to end.

    ndjson scan (B11)
      → anti-join against already-indexed (B8)
      → extension allowlist filter (B13)
      → thumb-URL rewrite (B14)
      → fetch (B16, stubbed) → embed (D2, stubbed model)
      → upsert on filepath (B6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal
from .sources import external, writer

ALLOWED_EXT_RE = r"\.(jpg|jpeg|png|gif)$"


def _index_batch(
    spark: SparkSession, meta: DataFrame, table_path: str, url_col: str, dim: int
) -> int:
    """Shared indexing stages (anti-join skip → filter → rewrite → fetch →
    embed → upsert); called by both the batch and the streaming entry."""
    writer.create_images_table(spark, table_path)
    done = spark.read.parquet(table_path).select(F.col("filepath").alias(url_col))
    todo = writer.anti_join_skip(meta, done, url_col)

    todo = todo.where(F.regexp_extract(F.col(url_col), ALLOWED_EXT_RE, 1) != "")
    todo = todo.withColumn(
        "thumb_url",
        F.regexp_replace(F.col(url_col), "/commons/", "/commons/thumb/"),
    )

    fetched = multimodal.fetch_url_stub(todo, url_col=url_col, out_col="content")
    embedded = multimodal.embed_binary_column(fetched, bin_col="content", dim=dim)

    rows = embedded.select(
        F.abs(F.xxhash64(url_col)).alias("id"),
        F.lit(None).cast("boolean").alias("deleted"),
        F.col(url_col).alias("filepath"),
        F.current_timestamp().alias("modified_at"),
        F.length("content").cast("long").alias("size"),
        F.col("embedding").cast("array<float>").alias("vector"),
        F.col("thumb_url").alias("wikimedia_thumb_url"),
        F.lit(None).cast("string").alias("wikimedia_descr_url"),
    )
    n = rows.count()
    if n:
        writer.upsert_parquet(spark, table_path, rows, key="filepath")
    return n


def index_images(
    spark: SparkSession,
    metadata_ndjson: str,
    table_path: str,
    url_col: str = "url",
    dim: int = 64,
    shuffle_seed: int | None = 42,
) -> int:
    """Run the full indexing pipeline; returns rows upserted.

    Incremental: a second run over the same metadata upserts the same keys
    (count stable), and new metadata only processes the delta."""
    meta = external.read_ndjson(spark, metadata_ndjson, shuffle_seed=shuffle_seed)
    return _index_batch(spark, meta, table_path, url_col, dim)


def index_images_stream(
    spark: SparkSession,
    metadata_dir: str,
    table_path: str,
    url_col: str = "url",
    dim: int = 64,
) -> None:
    """Continuous indexer: watch a directory for new ndjson metadata files
    and run the SAME stages per micro-batch via foreachBatch (which executes
    driver-side, so the batch write path — anti-join + upsert — is reused
    verbatim). availableNow trigger: drain what's there, then stop; drop the
    trigger for a long-running watcher."""
    stream = (
        spark.readStream.schema(f"{url_col} string")
        .option("maxFilesPerTrigger", 1)
        .json(metadata_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _index_batch(spark, batch_df, table_path, url_col, dim)

    q = (
        stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .option("checkpointLocation", table_path + "_ckpt")
        .start()
    )
    q.awaitTermination()


def search_api(
    spark: SparkSession,
    table_path: str,
    q: str,
    embedder,
    num: int | None = None,
) -> DataFrame:
    """The /search_api lifecycle (reference §3.1) over an indexed table:
    parse → combinator → live-row filter → cosine top-k → (id, score)."""
    from .operators import similarity
    from .plans.combinator import resolve_query

    df = writer.live_rows(spark.read.parquet(table_path))
    qv = resolve_query(
        q,
        embedder,
        image_lookup=lambda i: similarity.point_lookup_embedding(
            df, i, id_col="id", vec_col="vector"
        ),
        random_image=lambda: similarity.random_row_embedding(df, vec_col="vector"),
    )
    if qv is None:
        return spark.createDataFrame([], "id long, score double")
    return similarity.topk_similar(df, qv, k=num or 12, id_col="id", vec_col="vector")


def build_words_table(
    spark: SparkSession, documents: DataFrame, dim: int = 64, min_count: int = 2
) -> DataFrame:
    """Derive the words table (reference words.sqlite3 role, RS:292-308) from
    a document corpus: tokenize → lowercase-only predicate (B3) → frequency
    floor → distributed embed (D1). One shuffle (the distinct+count), then a
    map-only embed pass."""
    from .functions import text as TXT

    words = (
        documents.select(F.explode(TXT.tokens(F.col("text"))).alias("word"))
        .where(F.lower(F.col("word")) == F.col("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select("word")
    )
    return multimodal.embed_text_column(words, "word", "vector", dim).select(
        "word", "vector"
    )


def similar_words_from_corpus(
    spark: SparkSession, documents: DataFrame, q: str, embedder, k: int = 50
) -> DataFrame:
    """End-to-end /similar_words over a REAL text corpus: build the words
    table from the documents, resolve the query, reverse-lookup top-k
    (reference §3.2 lifecycle with the words table derived, not given)."""
    from .operators import similarity
    from .plans.combinator import resolve_query

    qv = resolve_query(q, embedder)
    if qv is None:
        return spark.createDataFrame([], "word string, score double")
    words = build_words_table(spark, documents, dim=embedder.dim)
    return similarity.best_words(words, qv, k=k)


def embedding_near_dup_documents(
    spark: SparkSession,
    documents: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """End-to-end embedding-cosine near-dup over raw TEXT: distributed embed
    (D1) → multi-set hyperplane LSH → exact-cosine verification. The
    embedding-space twin of minhash_near_dup for semantic (not lexical)
    duplicates."""
    from .operators import ann, multimodal

    embedded = multimodal.embed_documents(documents, dim=dim)
    return ann.hyperplane_lsh_near_dup_multiset(
        embedded, threshold=threshold, dim=dim, id_col="doc_id"
    )
