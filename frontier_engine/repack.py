"""ClueWeb WARC repacker: rewrite buggy, unsplittable WARC/0.18 archives
into valid WARC/1.0 (one gzip member per record → splittable downstream).

Parity with the reference's `repack_clueweb_warcs` job
(/root/reference/warc_indexer/util.py:36-187), re-expressed for Spark.
The reference parallelizes an S3 key list with one slice per file and
repairs each file imperatively with warcio's WARCWriter; here the file
list is a DataFrame, the repair kernel is a pure function
(``repack_warc_bytes``), and the per-file rewrite runs inside
``mapInPandas`` so Spark schedules/retries it like any other task. The
sandbox has no S3; paths are local/``file:`` URIs (an object-store
deployment swaps the open/put calls, util.py:53-58,123-125).

Repair semantics replicated from the reference line-state machine
(util.py:70-121) — ClueWeb09's bugs, each handled identically:

- header continuation / URIs containing raw newlines: a header line with
  no ``:`` is appended to the PREVIOUS header line (util.py:93-96), and a
  blank line directly after ``WARC-Target-URI`` does not end the header
  block (util.py:89-90 ``last_header_was_uri``),
- untrusted Content-Length: the stated length positions the tentative
  record end, but excess non-blank payload lines before the next
  ``WARC/`` magic are absorbed into the record (util.py:105-116), and the
  output Content-Length is recomputed from the actual bytes
  (util.py:152-153, 180),
- non-ASCII header values: percent-encoded so the output header block is
  pure ASCII (LenientStatusAndHeadersParser, util.py:127-141),
- http-typed records (response/request/revisit): payload re-split into
  HTTP headers + body at the first blank line (util.py:157-172).
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator
from urllib.parse import quote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from frontier_engine.warc_source import _local_path

# WARC-Types whose body is an HTTP message (ArcWarcRecordLoader.HTTP_TYPES)
HTTP_TYPES = ("response", "request", "revisit")

REPACK_REPORT_SCHEMA = "path string, out_path string, records int, bytes_in long, bytes_out long"


def _ascii_header_value(v: str) -> str:
    """Percent-encode a header value that does not survive ASCII encoding
    (LenientStatusAndHeadersParser parity, util.py:127-141)."""
    try:
        v.encode("ascii")
        return v
    except UnicodeEncodeError:
        return quote(v, safe=" :/;,?=&%()[]{}<>@!#$*+'\"~^`|\\.-_")


def parse_broken_warc(data: bytes) -> Iterator[tuple[list[tuple[str, str]], bytes]]:
    """Lenient record iterator over a broken WARC byte stream.

    Yields ``(headers, content)`` with headers an ordered (name, value)
    list (statusline like ``WARC/0.18`` dropped — output is WARC/1.0) and
    content the raw body bytes INCLUDING any excess payload the stated
    Content-Length missed. Mirrors the reference state machine
    (util.py:63-121) state for state: in_headers / content / after_record.
    """
    raw_headers: list[bytes] = []
    content: list[bytes] = []
    content_len = 0
    stated_len = 0
    in_headers = True
    after_record = False
    last_header_was_uri = False

    def finish():
        hdrs: list[tuple[str, str]] = []
        for line in raw_headers[1:]:  # [0] is the WARC/x.y statusline
            k, sep, v = line.decode("utf-8", "replace").partition(":")
            if sep:
                hdrs.append((k.strip(), v.strip()))
        return hdrs, b"".join(content)

    for line in io.BytesIO(data):
        if (in_headers or after_record) and line.startswith(b"WARC/"):
            if raw_headers:
                yield finish()
            raw_headers = [line]
            content = []
            content_len = 0
            stated_len = 0
            in_headers = True
            after_record = False
            last_header_was_uri = False
            continue
        if in_headers:
            if not line.strip() and not last_header_was_uri:
                in_headers = False
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                # continuation / URI with an embedded newline: glue onto
                # the previous header line (util.py:93-96)
                if raw_headers:
                    raw_headers[-1] = raw_headers[-1].rstrip() + k.lstrip()
                continue
            raw_headers.append(line)
            key = k.strip().lower()
            last_header_was_uri = key == b"warc-target-uri"
            if key == b"content-length":
                try:
                    stated_len = int(v)
                except ValueError:
                    stated_len = 0
        elif not after_record:
            content.append(line)
            content_len += len(line)
            if stated_len <= content_len:
                after_record = True
        elif line.strip():  # excess payload beyond stated Content-Length
            content.append(line)
    if len(raw_headers) > 1:
        yield finish()


def _write_record(out, headers: list[tuple[str, str]], content: bytes) -> None:
    """Emit one valid WARC/1.0 record as its own gzip member (warcio
    WARCWriter convention — per-record members keep the output splittable).

    Content-Length is recomputed from the actual bytes (the input value is
    untrusted, util.py:152-153); for http-typed records the body is
    re-split into HTTP headers + payload and rejoined canonically
    (util.py:157-180)."""
    hmap = {k.lower(): v for k, v in headers}
    wtype = hmap.get("warc-type", "")
    if wtype in HTTP_TYPES and content:
        he = content.find(b"\r\n\r\n")
        hs = 4
        if he == -1:
            he = content.find(b"\n\n")
            hs = 2
        if he != -1:
            # normalize the header/body separator to CRLF CRLF
            content = content[:he].rstrip(b"\r\n") + b"\r\n\r\n" + content[he + hs:]
    block = io.BytesIO()
    block.write(b"WARC/1.0\r\n")
    for k, v in headers:
        if k.lower() == "content-length":
            continue
        block.write(f"{k}: {_ascii_header_value(v)}\r\n".encode("ascii", "ignore"))
    block.write(f"Content-Length: {len(content)}\r\n\r\n".encode())
    block.write(content)
    block.write(b"\r\n\r\n")
    out.write(gzip.compress(block.getvalue(), 6))


def repack_warc_bytes(data: bytes) -> tuple[bytes, int]:
    """Pure repair kernel: broken WARC bytes (gzip'd or plain) → valid
    WARC/1.0 gz bytes (one member per record). Returns (bytes, n_records)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out = io.BytesIO()
    n = 0
    for headers, content in parse_broken_warc(data):
        _write_record(out, headers, content)
        n += 1
    return out.getvalue(), n


def repack_warcs(spark: SparkSession, in_glob: str, out_dir: str,
                 parallelism: int | None = None) -> DataFrame:
    """Distributed repack: glob → one repaired ``.warc.gz`` per input file
    under ``out_dir`` (same basename), plus a report DataFrame.

    File-level parallelism matches the reference (numSlices=len(files),
    util.py:54-56): repair is a sequential scan per file by nature — the
    splittable read (`read_warcs_split`) applies AFTER repair, which is
    the point of repacking. The listing carries only paths (no content
    column) so the driver plan stays tiny; each task streams its own file.
    """
    files = spark.read.format("binaryFile").load(in_glob).select("path")
    files = files.repartition(parallelism or spark.sparkContext.defaultParallelism)
    os.makedirs(out_dir, exist_ok=True)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                lp = _local_path(p)
                if not lp.endswith((".warc.gz", ".warc")):  # util.py:60-62
                    continue
                with open(lp, "rb") as f:
                    raw = f.read()
                fixed, n = repack_warc_bytes(raw)
                op = os.path.join(out_dir, os.path.basename(lp).removesuffix(".gz").removesuffix(".warc") + ".warc.gz")
                with open(op, "wb") as f:
                    f.write(fixed)
                rows.append({"path": p, "out_path": op, "records": n,
                             "bytes_in": len(raw), "bytes_out": len(fixed)})
            yield pd.DataFrame(rows, columns=["path", "out_path", "records", "bytes_in", "bytes_out"])

    return files.mapInPandas(work, REPACK_REPORT_SCHEMA)
