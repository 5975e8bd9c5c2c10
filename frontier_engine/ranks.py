"""Rank lookup tables + join — `prepare_lookups` parity (index.py:188-242).

The reference reads rank text files with a hand-built splittable source
(UnfusedReadFromText, textio.py:14-121), parses `<id> <value>` /
`<value> <id>` lines (process.py:477-506, silently dropping malformed
lines), and stores them as JSON blobs in Redis hashes for per-document
point lookups at index time (process.py:178-180).

Spark-first: `spark.read.text` already implements the splittable source
(Hadoop TextInputFormat has identical split + first-partial-line-discard
semantics); parsing is a two-column split + cast where a failed cast
becomes NULL and is filtered (≙ the reference's silent drop); the Redis
point-lookup becomes one **broadcast left-outer equi join** — the engine's
replacement for the reference's only join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def parse_rank_lines(df: DataFrame, value_first: bool, value_type: str = "double") -> DataFrame:
    """lines -> (doc_id, rank_value); malformed lines silently dropped.

    value_first=True  ≙ map_val_id  '<value> <id>'  (process.py:493-506)
    value_first=False ≙ map_id_val  '<id> <value>'  (process.py:477-490)
    A cast failure yields NULL via try_cast (≙ ValueError -> drop; plain
    cast would *throw* under Spark 4 ANSI mode); a missing separator yields
    a single token (≙ unpack error -> drop).
    """
    parts = F.split(F.col("value"), r"\s+", 2)
    first, second = F.get(parts, 0), F.get(parts, 1)  # F.get: NULL past end (ANSI-safe)
    if value_first:
        doc_id, val = second, first
    else:
        doc_id, val = first, second
    return (
        df.select(
            doc_id.alias("doc_id"),
            val.try_cast(value_type).alias("rank_value"),
        )
        .where(F.col("doc_id").isNotNull() & (F.length("doc_id") > 0) & F.col("rank_value").isNotNull())
    )


def load_rank_table(
    spark: SparkSession, spam_glob: str | None = None, page_glob: str | None = None
) -> DataFrame:
    """Build the unified ranks lookup table:
    ``ranks(doc_id, spam_rank int, page_rank double)`` (nullable — the
    reference merges whichever fields exist, process.py:178-180).

    spam files: '<value> <id>' with int values (ClueWeb spam ranking,
    index.py:236-240); page-rank files: '<id> <value>' with float values
    (index.py:229-233). Outer-merged on doc_id.
    """
    out: DataFrame | None = None
    if spam_glob:
        spam = parse_rank_lines(spark.read.text(spam_glob), value_first=True, value_type="int")
        out = spam.groupBy("doc_id").agg(F.min("rank_value").alias("spam_rank"))
    if page_glob:
        pr = parse_rank_lines(spark.read.text(page_glob), value_first=False, value_type="double")
        pr = pr.groupBy("doc_id").agg(F.max("rank_value").alias("page_rank"))
        out = pr if out is None else out.join(pr, "doc_id", "full_outer")
    if out is None:
        raise ValueError("at least one rank glob required")
    if "spam_rank" not in out.columns:
        out = out.withColumn("spam_rank", F.lit(None).cast("int"))
    if "page_rank" not in out.columns:
        out = out.withColumn("page_rank", F.lit(None).cast("double"))
    return out.select("doc_id", "spam_rank", "page_rank")


def join_ranks(payload: DataFrame, ranks: DataFrame, key: str = "warc_target_uri") -> DataFrame:
    """Merge ranks into payload docs — the Redis HGETALL point-lookup
    (process.py:178-180) as a broadcast left-outer equi join. Ranks are tiny
    relative to docs (two scalars per ranked doc), so the broadcast build
    side eliminates the shuffle entirely; at extreme rank-table sizes drop
    the hint and let AQE choose."""
    return payload.join(
        F.broadcast(ranks.withColumnRenamed("doc_id", key)), on=key, how="left"
    )
