"""Search-side text analysis: the reference's Elasticsearch analyzer and
scoring configuration (conf/data_index.py) re-expressed as Spark column
expressions and DataFrame computations (SURVEY.md §2.10).

- host analyzer      — strip leading ``www\\d*.`` (data_index.py:646-652),
  word-delimiter split (:653-661), cc-TLD stopword removal (258-entry list,
  :385-645 — representative subset here), unique
- path analyzer      — ``path_hierarchy`` tokenizer on '/' (:915-918,982-985)
- query-string analyzer — pattern split on ``[&=]`` (:955-958,978-981)
- BM25 scoring       — the index's similarity (BM25 throughout
  data_index.py) computed from first principles with df/idf aggregations +
  a broadcast join; the legacy index's LM-Dirichlet similarity
  (create_index_kibana.txt:7-39) is provided alongside.

All tokenizers are pure JVM expressions (codegen'd); BM25 is two
aggregations + one broadcast join — no UDFs anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# representative cc-TLD stopword subset (full list: data_index.py:385-645)
CC_TLD_STOPWORDS = [
    "ac", "ad", "ae", "at", "au", "be", "br", "ca", "ch", "cn", "co", "com",
    "cz", "de", "dk", "edu", "es", "eu", "fi", "fr", "gov", "gr", "hk", "hu",
    "ie", "il", "in", "info", "io", "it", "jp", "kr", "mx", "net", "nl", "no",
    "nz", "org", "pl", "pt", "ro", "ru", "se", "sg", "tr", "tw", "ua", "uk", "us",
]


def host_tokens(host: Column) -> Column:
    """Host analyzer: lower → strip www\\d*. prefix → split on non-alnum →
    drop cc-TLD stopwords → unique (order-preserving first occurrence)."""
    stripped = F.regexp_replace(F.lower(host), r"^www\d*\.", "")
    toks = F.split(stripped, r"[^a-z0-9]+")
    stop = F.array(*[F.lit(s) for s in CC_TLD_STOPWORDS])
    return F.array_distinct(
        F.filter(toks, lambda t: (F.length(t) > 0) & ~F.array_contains(stop, t))
    )


def path_hierarchy_tokens(path: Column) -> Column:
    """path_hierarchy tokenizer: '/a/b/c' -> ['/a', '/a/b', '/a/b/c']
    (data_index.py:915-918)."""
    parts = F.filter(F.split(path, "/"), lambda t: F.length(t) > 0)
    idx = F.sequence(F.lit(1), F.size(parts))
    return F.when(F.size(parts) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat(F.lit("/"), F.array_join(F.slice(parts, 1, i), "/")))
    )


def query_string_tokens(qs: Column) -> Column:
    """Query-string analyzer: pattern split on [&=], lowercased, non-empty
    (data_index.py:955-958)."""
    return F.filter(F.split(F.lower(qs), "[&=]"), lambda t: F.length(t) > 0)


def text_tokens(text: Column) -> Column:
    """Standard-analyzer-ish tokenizer: lowercase word chars (the per-language
    ICU/stemmer chains of data_index.py:662-976 reduce to this in-sandbox)."""
    return F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{Nd}]+"), lambda t: F.length(t) > 0
    )


# ------------------------------------------------------------------ BM25

def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 over a document table, from first principles:

      score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl))
      idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene/ES formula)

    Plan: tokenize → explode → tf agg (shuffle on (doc, term)) → df agg over
    the tiny query-term set → broadcast idf join → score agg per doc.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(text_tokens(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0] or 1.0

    qt = [t.lower() for t in query_terms]
    tf = (
        toks.where(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df_.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(dl), "doc_id")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("term_score").alias("bm25"))


def lm_dirichlet_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mu: float = 2000.0,
) -> DataFrame:
    """LM-Dirichlet similarity of the legacy v1 index
    (create_index_kibana.txt:7-17): score = Σ_t log(1 + tf/(mu·P(t|C))) +
    |q|·log(mu/(|d|+mu)), over matched terms."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(text_tokens(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    total_terms = toks.count()
    qt = [t.lower() for t in query_terms]
    cf = toks.where(F.col("term").isin(qt)).groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = (
        toks.where(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.join(F.broadcast(cf), "term")
        .join(F.broadcast(dl), "doc_id")
        .withColumn(
            "term_score",
            F.log(F.lit(1.0) + F.col("tf") * F.lit(float(total_terms)) / (F.lit(mu) * F.col("cf"))),
        )
    )
    norm = dl.select(
        "doc_id", (F.lit(float(len(qt))) * F.log(F.lit(mu) / (F.col("dl") + mu))).alias("norm")
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score").alias("s"))
        .join(norm, "doc_id")
        .select("doc_id", (F.col("s") + F.col("norm")).alias("lm_score"))
    )
