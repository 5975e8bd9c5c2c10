"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: the full document-processing pipeline
(canonicalize → dedup keep-newest → extraction UDF → payload projection)
over a pages table constructed deterministically from the sf0.001
``documents`` parquet.

``queries()`` / ``oracle_sql()`` — the operator catalog in
frontier_engine/queries.py (SURVEY.md §2 parity ops + training-data ops),
each Spark implementation paired with a DuckDB-dialect oracle; bloom /
frontier-round entries are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from frontier_engine import queries as Q

SF0001 = "/root/testdata/sf0.001"


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Common-Crawl-shaped pages table (BASELINE.json
    input_hint schema) built Spark-side from the documents parquet: each doc
    becomes an HTML page; a deterministic subset gets duplicate URLs with
    newer timestamps (keep-newest dedup targets) and non-canonical URL
    spellings (canonicalizer targets)."""
    # scale-adaptive scan fan-out (r6): the documents table is a single-
    # row-group file, so the downstream canonicalize pandas UDF would run
    # at scan parallelism (one task); load_wide is a no-op whenever the
    # layout already provides >= cores/2 scan tasks
    d = Q.load_wide(spark, sf_dir, "documents")
    host = F.concat(F.lit("site"), (F.col("doc_id") % 37).cast("string"), F.lit(".example.com"))
    url = F.concat(
        F.when(F.col("doc_id") % 11 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        host,
        F.when(F.col("doc_id") % 13 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 17 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    html = F.encode(
        F.concat(
            F.lit("<!doctype html><html><head><title>Document "),
            F.col("doc_id").cast("string"),
            F.lit('</title><meta name="description" content="synthetic doc"></head>'),
            F.lit("<body><main><h1>Document "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit("</p></main></body></html>"),
        ),
        "utf-8",
    )
    base = d.select(
        url.alias("url"),
        (F.to_timestamp(F.lit("2021-03-01 00:00:00")) + F.make_interval(secs=F.col("doc_id") * 13)).alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
    dups = base.where(F.xxhash64("url") % 5 == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.make_interval(hours=F.lit(6))
    )
    return base.unionByName(dups)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from frontier_engine import pipeline

    pages = pages_from_documents(spark, SF0001)
    out = pipeline.run_pipeline(pages)
    return out["payload"].orderBy("idx_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
