"""WARC file source: read WARC archives into the pages/record schema.

Parity with the reference's ReadWarcs/_ReadWarc splittable source
(warcio.py:46-177), re-expressed for Spark:

- file discovery + distribution: ``spark.read.format('binaryFile')`` over a
  glob (Spark schedules one task per file; a ``repartition`` after listing
  is the Reshuffle fusion-break analog, warcio.py:69),
- record iteration: a pure-Python WARC parser (no fastwarc in-sandbox)
  inside ``mapInPandas`` — gzip multi-member or plain concatenated records,
  yielding one row per record with headers map + HTTP payload + stream_pos,
- record-type filter (``response``, index.py:142) and overlong-payload
  strip (warcio.py:150-154) as options.

Scale note (why per-file tasks are acceptable here): WARC members are
gzip-framed per record, so true byte-range splitting needs a member index;
the reference solves it with a custom splittable DoFn. Our production path
is the pages *table* (columnar, natively splittable — SURVEY.md §1.1);
this source exists for ingest parity, where per-file parallelism (100k+
files at crawl scale) already saturates any cluster.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("source_offset", T.LongType(), False),
        T.StructField("record_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("http_headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_truncated", T.BooleanType(), False),
    ]
)


def parse_warc_stream(data: bytes, source_file: str, max_payload: Optional[int] = None):
    """Iterate WARC records from (possibly gzip'd) bytes.

    Yields dicts in RECORD_SCHEMA shape. Header parsing is lenient the way
    the reference's ClueWeb repair tool is (util.py:128-143): bad header
    lines are skipped, missing Content-Length ends the record at the next
    WARC/ magic.
    """
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: decompress all members
        buf = io.BytesIO(data)
        chunks = []
        while True:
            try:
                g = gzip.GzipFile(fileobj=buf)
                chunks.append(g.read())
            except (EOFError, OSError):
                break
            if buf.tell() >= len(data):
                break
        data = b"".join(chunks)

    pos = 0
    n = len(data)
    while pos < n:
        magic = data.find(b"WARC/", pos)
        if magic == -1:
            break
        record_start = magic
        hdr_end = data.find(b"\r\n\r\n", magic)
        sep_len = 4
        if hdr_end == -1:
            hdr_end = data.find(b"\n\n", magic)
            sep_len = 2
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[magic:hdr_end].splitlines()[1:]:
            try:
                k, _, v = line.decode("utf-8", "replace").partition(":")
                if _:
                    headers[k.strip()] = v.strip()
            except Exception:
                continue
        try:
            clen = int(headers.get("Content-Length", ""))
        except ValueError:
            nxt = data.find(b"WARC/", hdr_end)
            clen = (nxt if nxt != -1 else n) - (hdr_end + sep_len)
        body = data[hdr_end + sep_len : hdr_end + sep_len + clen]
        pos = hdr_end + sep_len + clen

        http_headers: dict[str, str] = {}
        payload = body
        ctype = headers.get("Content-Type", "")
        if ctype.startswith("application/http"):
            he = body.find(b"\r\n\r\n")
            hs = 4
            if he == -1:
                he = body.find(b"\n\n")
                hs = 2
            if he != -1:
                for line in body[:he].splitlines()[1:]:
                    k, _, v = line.decode("utf-8", "replace").partition(":")
                    if _:
                        http_headers[k.strip()] = v.strip()
                payload = body[he + hs :]
        truncated = False
        if max_payload is not None and len(payload) > max_payload:
            payload = payload[:max_payload]
            truncated = True
        yield {
            "source_file": source_file,
            "source_offset": record_start,
            "record_type": headers.get("WARC-Type"),
            "record_id": headers.get("WARC-Record-ID"),
            "warc_headers": headers,
            "http_headers": http_headers,
            "http_content_type": (http_headers.get("Content-Type") or "").split(";")[0].strip() or None,
            "target_uri": headers.get("WARC-Target-URI"),
            "warc_date": headers.get("WARC-Date"),
            "payload": payload,
            "payload_truncated": truncated,
        }


def read_warcs(
    spark: SparkSession,
    glob: str,
    record_types: tuple[str, ...] = ("response",),
    max_payload: int = 1024 * 1024,
    parallelism: Optional[int] = None,
) -> DataFrame:
    """ReadWarcs parity: glob → distributed per-file record extraction.

    The post-scan ``repartition`` is the reference's Reshuffle fusion break
    (warcio.py:69) — it spreads file payloads before the Python stage.
    """
    files = spark.read.format("binaryFile").load(glob).select("path", "content")
    if parallelism:
        files = files.repartition(parallelism)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for rec in parse_warc_stream(bytes(r.content), r.path, max_payload):
                    if record_types and rec["record_type"] not in record_types:
                        continue
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(extract, RECORD_SCHEMA)


def warc_records_to_pages(records: DataFrame) -> DataFrame:
    """records → the engine's pages schema (url, warc_ts, html, text, lang)."""
    return records.select(
        F.col("target_uri").alias("url"),
        F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    ).where(F.col("url").isNotNull())


def write_warc_bytes(records: list[dict]) -> bytes:
    """Serialize records into a minimal WARC/1.0 byte stream (test fixture
    generator — the engine's own parser round-trips it)."""
    out = io.BytesIO()
    for rec in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + rec.get("http_content_type", "text/html").encode()
            + b"\r\n\r\n"
            + rec["payload"]
        )
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rec.get('record_type', 'response')}\r\n"
            f"WARC-Record-ID: {rec.get('record_id', '<urn:uuid:x>')}\r\n"
            f"WARC-Date: {rec.get('warc_date', '2021-03-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {rec.get('target_uri', 'http://x/')}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        out.write(hdr + http + b"\r\n\r\n")
    return out.getvalue()
