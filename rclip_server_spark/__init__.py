"""rclip_server_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ramayer/rclip-server, re-designed Spark-first.

The reference (/root/reference) is a single-process CLIP image-search engine:
SQLite at rest, one in-memory N×512 float32 matrix hot, brute-force cosine
scoring (rclip_server.py:194-198) behind a signed-weighted-term query grammar
(rclip_server.py:85-106). This package re-expresses every one of those
capabilities as declarative DataFrame plans that Catalyst can optimize and
that distribute to a many-executor cluster, plus the large-scale
training-data-pipeline operators (dedup, similarity join, text analysis,
streaming) the reference lacks.

Layout:
  session      — tuned SparkSession factory
  sources/     — table catalog over the parquet fixtures; upsert/soft-delete
  functions/   — pure-SQL column functions (vector algebra, text, hashing)
  operators/   — composed DataFrame operators (similarity, dedup, stats, ANN)
  plans/       — driver-side query frontend (parser, combinator, embedder)
  streaming/   — Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
