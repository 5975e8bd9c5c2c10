"""Single-node processing oracle — the executable spec for the Spark pipeline.

Pure-Python mirror of the reference record lifecycle
(/root/reference/warc_indexer/indexer/process.py:131-306): decode, guard-
clause predicates in the reference's order, extraction, and the meta/payload
projections. The Spark pipeline (:mod:`frontier_engine.pipeline`) calls the
*same kernels* batch-wise; pytest asserts row-for-row, byte-for-byte equality
between the two (SURVEY.md §5.2) — resiliparse is unavailable in-sandbox, so
this oracle *defines* reference behavior for the byte-identity gate.

Skip reasons (stable strings, used as counter keys — Metrics.counter analog,
process.py:120):
  not_http, wrong_content_type, too_big, too_short, binary_mime, no_body,
  empty_extraction, mojibake, short_main
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import List, Optional
from urllib.parse import urlparse

from frontier_engine import extract as ex
from frontier_engine.identity import index_uuid, webis_uuid

MAX_DOCUMENT_SIZE = 1024 * 1024  # process.py:46, index.py:113
MIN_DOCUMENT_SIZE = 200          # process.py:173-174
MIN_MAIN_CONTENT = 200           # process.py:274-275
MOJIBAKE_RATIO = 0.1             # process.py:264-266
TEXT_MIMES = ("text/html", "application/xhtml+xml", "text/plain")  # process.py:167,249

_MULTI_SPACE_RE = re.compile(r"\s{2,}")  # process.py:45


@dataclass
class PageResult:
    idx_id: Optional[str] = None
    meta: Optional[dict] = None
    payload: Optional[dict] = None
    skip_reason: str = ""
    links: List[str] = field(default_factory=list)


def derive_source(url: str) -> tuple[str, int]:
    """Deterministic (source_file, source_offset) for a pages-table row.

    The input table (BASELINE.json input_hint) has no WARC file/offset, but
    index_uuid (process.py:347-374) needs them; derive both from the URL so
    every component (oracle, Spark UDF, golden files) agrees.
    """
    import hashlib

    h = hashlib.sha256(url.encode()).hexdigest()
    part = int(h[:4], 16) % 256
    offset = int(h[4:12], 16) & 0x7FFFFFFF
    return f"synthetic/part-{part:05d}.warc.gz", offset


def warc_ts_to_millis(warc_ts: datetime) -> int:
    """Epoch millis of the record timestamp (process.py:159)."""
    if warc_ts.tzinfo is None:
        warc_ts = warc_ts.replace(tzinfo=timezone.utc)
    return int(warc_ts.timestamp() * 1000)


def process_page(
    url: str,
    warc_ts: datetime,
    html: bytes,
    *,
    id_prefix: str = "synth",
    max_payload_size: int = MAX_DOCUMENT_SIZE,
    always_index_meta: bool = False,
    trust_http_content_type: bool = False,
    http_content_type: str = "text/html",
) -> PageResult:
    """Process one pages-table row exactly like ProcessRecord.process
    (process.py:131-196) + create_metadata/create_payload (:198-306)."""
    res = PageResult()
    doc_id = url
    webis_id = webis_uuid(id_prefix, doc_id)
    record_time = warc_ts_to_millis(warc_ts)
    source_file, source_offset = derive_source(url)
    res.idx_id = index_uuid(record_time, source_offset, source_file, webis_id)

    content_bytes = html[:max_payload_size] if html else b""
    content_length = len(html) if html else 0
    encoding = ex.detect_encoding(content_bytes)
    warc_date = (
        warc_ts.astimezone(timezone.utc).replace(tzinfo=None).isoformat(timespec="seconds") + "Z"
        if warc_ts.tzinfo
        else warc_ts.isoformat(timespec="seconds") + "Z"
    )

    # meta is always built (process.py:164), kept iff payload survives or
    # always_index_meta (process.py:193-195)
    meta = {
        "uuid": webis_id,
        "source_file": source_file,
        "source_offset": source_offset,
        "warc_date": warc_date,
        "warc_target_uri": url,
        "content_type": "application/http; msgtype=response",
        "content_length": content_length,
        "http_content_length": content_length,
        "http_content_type": http_content_type,
        "content_encoding": encoding,
    }

    def finish(reason: str) -> PageResult:
        res.skip_reason = reason
        res.meta = meta if always_index_meta else None
        return res

    # predicate ladder, reference order (process.py:166-174, 247-275)
    if http_content_type is None or http_content_type.lower() not in TEXT_MIMES:
        return finish("wrong_content_type")
    if content_length > max_payload_size:
        return finish("too_big")
    if content_length < MIN_DOCUMENT_SIZE:
        return finish("too_short")
    if not trust_http_content_type:
        mime = ex.detect_mime(content_bytes)
        if mime not in TEXT_MIMES:
            return finish("binary_mime")

    content_str = ex.bytes_to_str(content_bytes, encoding)
    doc = ex.parse_html(content_str)
    if doc.body is None:
        return finish("no_body")

    content_full = ex.extract_plain_text(doc, alt_texts=True, preserve_formatting=False)
    if not content_full:
        return finish("empty_extraction")

    repl = content_full.count("�")
    if repl / len(content_full) > MOJIBAKE_RATIO:
        return finish("mojibake")
    if repl > 0:
        content_full = _MULTI_SPACE_RE.sub(" ", content_full.replace("�", "")).strip()

    lang, _score = ex.detect_lang(content_full)

    main_content = ex.extract_plain_text(
        doc, main_content=True, alt_texts=True, preserve_formatting=True, list_bullets=False
    )
    if len(main_content) < MIN_MAIN_CONTENT:
        return finish("short_main")

    parsed = urlparse(url)
    payload = {
        "uuid": webis_id,
        "date": warc_date,
        "lang": lang,
        "body_length": len(content_str),
        "warc_target_uri": url,
        "warc_target_hostname": parsed.hostname,
        "warc_target_path": parsed.path,
        "warc_target_query_string": parsed.query,
        "content_type": http_content_type,
        # language-suffixed dynamic ES fields normalized to fixed columns
        # + the lang column (SURVEY.md §1.1)
        "title": ex.get_title(doc),
        "meta_keywords": ex.get_meta_keywords(doc)[:30],
        "meta_desc": ex.get_meta_desc(doc)[:8192],
        "body": main_content,
        "full_body": content_full,
        "headings": ex.get_headings(doc, 3),
    }
    # empty-value pruning (process.py:300-304) → nullable columns
    for k in ("title", "meta_desc"):
        if not payload[k]:
            payload[k] = None
    for k in ("meta_keywords", "headings"):
        if not payload[k]:
            payload[k] = None

    res.meta = meta
    res.payload = payload
    res.links = ex.get_links(doc)
    return res
