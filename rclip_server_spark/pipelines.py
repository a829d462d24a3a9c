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

from .functions.localrel import values_df
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
    return _count_and_upsert(spark, rows, table_path)


def _count_and_upsert(spark: SparkSession, rows: DataFrame,
                      table_path: str) -> int:
    """Count + conditional upsert of an indexed-rows frame, persisted
    across the two actions: without the persist the whole
    scan→anti-join→embed pipeline executes twice, and the embed stage
    dominates once a real encoder replaces the stub."""
    rows = rows.persist()
    try:
        n = rows.count()
        if n:
            writer.upsert_parquet(spark, table_path, rows,
                                  key="filepath")
    finally:
        rows.unpersist()
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


def index_local_images(
    spark: SparkSession,
    image_dir: str,
    table_path: str,
    dim: int = 64,
    pattern: str = "*.{jpg,jpeg,png,gif}",
) -> int:
    """B16's NETWORK-FREE branch: index a LOCAL image directory end to
    end. The reference serves local files too (rclip_server.py:440-446)
    and its indexer's fetch (index_wikimedia.py:136-143) is just "get
    the bytes" — for a local corpus Spark's ``binaryFile`` source does
    that as a DISTRIBUTED scan: files are partitioned across executors,
    each row carries (path, modificationTime, length, content), and the
    extension allowlist is a planning-time ``pathGlobFilter`` so
    non-image files are never even opened (the DataFrame twin of the
    B13 extension filter). Everything downstream — the B8 anti-join
    incremental skip, D2 embed, B6 upsert — is the same real pipeline
    the URL branch uses; only the image DECODE inside the embedder
    stays honestly stubbed (no codecs in this environment).

    Returns rows upserted; a second run over the same directory is
    incremental (returns 0)."""
    writer.create_images_table(spark, table_path)
    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(image_dir)
        .select("path", "modificationTime", "length", "content")
    )
    done = spark.read.parquet(table_path).select(
        F.col("filepath").alias("path"))
    todo = writer.anti_join_skip(src, done, "path")
    embedded = multimodal.embed_binary_column(
        todo, bin_col="content", dim=dim)
    rows = embedded.select(
        F.abs(F.xxhash64("path")).alias("id"),
        F.lit(None).cast("boolean").alias("deleted"),
        F.col("path").alias("filepath"),
        F.col("modificationTime").alias("modified_at"),
        F.col("length").cast("long").alias("size"),
        F.col("embedding").cast("array<float>").alias("vector"),
        F.lit(None).cast("string").alias("wikimedia_descr_url"),
        F.lit(None).cast("string").alias("wikimedia_thumb_url"),
    )
    return _count_and_upsert(spark, rows, table_path)


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
        return values_df(spark, [], "id long, score double")
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
        return values_df(spark, [], "word string, score double")
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


def curate_corpus(
    df: DataFrame,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    min_quality: float = 0.3,
    langs: tuple[str, ...] | None = None,
    length_band: tuple[float, float] = (0.05, 0.95),
    max_repetition: float = 0.5,
    dedup_threshold: float = 0.7,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """The end-to-end training-corpus curation pipeline — the 100 TB job this
    engine exists for — as ONE lazy DataFrame composition:

        quality/language gate (clean_corpus, map-only)
          → length-outlier trim (two collected percentiles → literal range)
          → repetition (template-spam) filter (map-only)
          → PII redaction (map-only regexp chain)
          → fuzzy dedup, keep cluster representative (MinHash-LSH +
            connected components — the only multi-shuffle stage)
          → deterministic train/val/test assignment (map-only hash ranges)

    Stage ORDER is the cost story: every row-local filter runs before the
    dedup shuffle so the expensive stage sees the smallest corpus; the split
    is assigned last so eval membership is decided on the post-dedup id (a
    near-dup pair split across train/test is exactly the leak the pipeline
    must prevent — dedup-then-split makes it structurally impossible).

    Returns (doc_id, text [redacted], lang_pred, quality, n_tokens, split).
    """
    from .operators import dedup, text_analysis

    cleaned = text_analysis.clean_corpus(
        df,
        min_tokens=min_tokens,
        max_punct_ratio=max_punct_ratio,
        min_quality=min_quality,
        langs=langs,
    )
    # re-attach n_chars for the length trim (clean_corpus projects it away)
    cleaned = cleaned.join(df.select("doc_id", "n_chars"), "doc_id")
    trimmed = text_analysis.length_outlier_filter(
        cleaned, "n_chars", length_band[0], length_band[1]
    )
    no_spam = text_analysis.repetition_filter(
        trimmed, max_repetition=max_repetition
    )
    redacted = no_spam.join(
        text_analysis.redact_pii(no_spam.select("doc_id", "text")), "doc_id"
    )
    clusters = dedup.duplicate_clusters(
        redacted.select("doc_id", "text"), threshold=dedup_threshold
    )
    deduped = (
        redacted.join(clusters, "doc_id")
        .where(F.col("doc_id") == F.col("cluster_id"))
        .drop("cluster_id")
    )
    from .operators import sampling

    out = sampling.split_assign(
        deduped, "doc_id", split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return out.select(
        "doc_id",
        F.col("redacted").alias("text"),
        "lang_pred",
        "quality",
        "n_tokens",
        "split",
    )


def incremental_corpus_refresh(
    spark: SparkSession,
    raw_path: str,
    curated_path: str,
    last_raw_version: int,
    min_tokens: int = 5,
    min_quality: float = 0.3,
    dedup_threshold: float = 0.7,
) -> tuple[int | None, int]:
    """One cycle of the CONTINUOUS curation loop — the shape a 100 TB
    corpus actually runs day after day, composed from the engine's
    incremental primitives so each cycle costs O(new data), never
    O(corpus):

        CDC read of the raw versioned table since the last processed
        version (``versioned.table_changes`` fast path: only the appended
        segments are opened)
          → C4-style clean (map-only row-local gates)
          → near-dup check of the BATCH against the EXISTING curated
            corpus (``minhash_near_dup_incremental``: banded-LSH
            corpus×batch join — cost scales with the batch; the corpus
            side is its precomputable signature index)
          → exactly-once append into the curated versioned table with
            the processed RAW VERSION as the batch id — a crash-replayed
            cycle finds the id in the curated table's manifest log and
            skips, so reruns are safe end-to-end.

    Returns (new_curated_version | None if this raw interval was already
    committed, rows appended). Idempotence is carried by the manifest
    log, not the caller."""
    from .operators import dedup, text_analysis
    from .sources import versioned

    raw_head = versioned.current_version(raw_path)
    if raw_head <= last_raw_version:
        return None, 0
    if last_raw_version < 1:
        # initial backfill: the whole snapshot is the first "delta"
        fresh = versioned.read(spark, raw_path, raw_head)
    else:
        fresh = versioned.table_changes(
            spark, raw_path, from_version=last_raw_version, to_version=raw_head
        ).drop("_change_type")
    cleaned = text_analysis.clean_corpus(
        fresh, min_tokens=min_tokens, min_quality=min_quality
    ).select("doc_id", "text")
    corpus = versioned.read(spark, curated_path).select("doc_id", "text")
    dup_hits = dedup.minhash_near_dup_incremental(
        corpus, cleaned, threshold=dedup_threshold
    ).select(F.col("batch_id").alias("doc_id")).distinct()
    survivors = cleaned.join(dup_hits, "doc_id", "left_anti")
    v = versioned.append_exactly_once(
        spark, curated_path, survivors, batch_id=raw_head
    )
    if v is None:  # crash-replayed interval: already committed, no-op
        return None, 0
    return v, survivors.count()


def start_streaming_corpus_refresh(
    spark: SparkSession,
    raw_path: str,
    curated_path: str,
    checkpoint_dir: str,
    min_tokens: int = 5,
    min_quality: float = 0.3,
    dedup_threshold: float = 0.7,
):
    """The continuous-curation loop as a LIVE STREAM — the round-5 table
    machinery composed end-to-end: the versioned_cdc source tails the raw
    table's manifest log (each micro-batch = exactly the newly appended
    segments, O(delta)), and every batch runs the same clean →
    batch-vs-corpus near-dup → exactly-once-append cycle as the batch
    pipeline, keyed by the STREAM's batch id in the curated table's
    manifest log — so a crash anywhere replays into a manifest-detected
    no-op and the curated corpus is exactly-once end to end.

    Ingest writers keep appending to ``raw_path`` (batch append, or the
    exactly-once streaming sink); this query keeps the curated corpus
    current. Returns the StreamingQuery."""
    from .operators import dedup, text_analysis
    from .sources import cdc_stream, versioned

    cdc_stream.register(spark)
    stream = (
        spark.readStream.format("versioned_cdc")
        .option("path", raw_path)
        .option("from_version", 1)
        .load()
    )

    def _cycle(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = text_analysis.clean_corpus(
            batch_df, min_tokens=min_tokens, min_quality=min_quality
        ).select("doc_id", "text")
        corpus = versioned.read(spark, curated_path).select("doc_id", "text")
        dup_hits = dedup.minhash_near_dup_incremental(
            corpus, cleaned, threshold=dedup_threshold
        ).select(F.col("batch_id").alias("doc_id")).distinct()
        survivors = cleaned.join(dup_hits, "doc_id", "left_anti")
        versioned.append_exactly_once(
            spark, curated_path, survivors, batch_id=batch_id
        )

    return (
        stream.writeStream.foreachBatch(_cycle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def curate_keep_first_via_pairs_view(
    spark: SparkSession,
    pairs_view_path: str,
) -> DataFrame:
    """Keep-first dedup served FROM the maintained pair table: advance
    the near-dup pairs view to its source's head (O(changed docs) —
    sources/neardup_view.py), then anti-join that source snapshot
    against the GREATER side of every pair (pairs are stored (lesser
    id, greater id), so dropping id_b keeps each near-dup group's
    first-by-id doc, the same keep-min policy as dedup.exact_dedup_mark).

    PINNED end to end: the pairs view is read at the exact version the
    refresh returned, its spec names the source AND the source version
    that pair set covers, and the anti-join reads the source AT that
    cursor — a concurrent ingest commit between the refresh and the
    reads can neither leak unpaired docs into the "curated" output nor
    mix versions (the caller passes only the view; the source is the
    manifest's, never a parameter that could silently point elsewhere).

    This is what the r9 pair view exists for operationally: the
    incremental_corpus_refresh pipeline re-derives batch-vs-corpus
    pairs per cycle, while a standing pairs view amortizes signatures
    AND pairs across every consumer — curation here, audit/cluster
    jobs elsewhere — all reading one incrementally-maintained table.
    Note the policy difference: anti-joining id_b drops the later doc
    of EVERY near-dup pair (transitive groups collapse to their
    minimum id), whereas batch-vs-corpus curation keeps a batch doc
    unless it matches the already-curated corpus."""
    from .sources import matview, neardup_view, versioned

    view_v = matview.refresh_view(spark, pairs_view_path)
    spec = neardup_view._spec_nd(pairs_view_path, view_v)
    dup_keys = (
        neardup_view.read_near_dup_pairs_view(spark, pairs_view_path,
                                              view_v)
        .select("id_b").distinct()
    )
    raw = versioned.read(spark, spec["nd_source"],
                         int(spec["nd_source_version"]))
    return raw.join(
        F.broadcast(dup_keys.withColumnRenamed("id_b", spec["nd_key"])),
        spec["nd_key"], "left_anti")
