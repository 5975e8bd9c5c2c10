"""ClueWeb repacker tests (reference util.py:36-187 parity).

A synthetic "broken ClueWeb09" WARC exercises each bug the reference's
state machine repairs: multiline WARC-Target-URI, blank line directly
after the URI header, wrong (understated) Content-Length with excess
payload, non-ASCII header values, WARC/0.18 statusline. The repaired
output must parse cleanly with the engine's own strict reader."""

from __future__ import annotations

import gzip
import os

from frontier_engine import repack
from frontier_engine.warc_source import parse_warc_stream, read_warcs


def broken_clueweb_bytes() -> bytes:
    body1 = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>one</html>\nEXTRA PAYLOAD LINE\n"
    stated1 = body1.index(b"EXTRA")  # understate: excess lines must be absorbed
    rec1 = (
        b"WARC/0.18\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:r1>\n"
        b"WARC-Target-URI: http://example.com/a\n"
        b"b/c%20d\n"  # URI continued on next line (no colon)
        b"\n"  # blank line right after URI must NOT end headers
        b"WARC-Date: 2009-03-01T00:00:00Z\n"
        b"Content-Type: application/http; msgtype=response\n"
        b"Content-Length: " + str(stated1).encode() + b"\n"
        b"\n" + body1 + b"\n"
    )
    body2 = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>zwei</html>"
    rec2 = (
        b"WARC/0.18\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:r2>\n"
        b"WARC-Target-URI: http://example.com/m\xc3\xbcnchen\n"  # non-ascii
        b"WARC-Date: 2009-03-01T00:00:01Z\n"
        b"Content-Type: application/http; msgtype=response\n"
        b"Content-Length: " + str(len(body2)).encode() + b"\n"
        b"\n" + body2 + b"\n\n"
    )
    return rec1 + rec2


def test_repack_kernel_repairs_all_bugs():
    fixed, n = repack.repack_warc_bytes(gzip.compress(broken_clueweb_bytes()))
    assert n == 2
    recs = list(parse_warc_stream(fixed, "mem"))
    assert len(recs) == 2
    r1, r2 = recs
    # multiline URI glued back together
    assert r1["target_uri"] == "http://example.com/ab/c%20d"
    # excess payload absorbed + Content-Length recomputed → strict parse
    # recovers the full body including the extra line
    assert b"EXTRA PAYLOAD LINE" in r1["payload"]
    assert b"<html>one</html>" in r1["payload"]
    assert r1["http_content_type"] == "text/html"
    # non-ascii header percent-encoded, output block is pure ASCII
    assert r2["target_uri"] == "http://example.com/m%C3%BCnchen"
    header_block = gzip.decompress(fixed).split(b"\r\n\r\n")[0]
    header_block.decode("ascii")
    # one gzip member per record → output is splittable
    plain = fixed
    assert plain[:2] == b"\x1f\x8b"
    members = 0
    import zlib
    pos = 0
    while pos < len(plain):
        d = zlib.decompressobj(wbits=31)
        d.decompress(plain[pos:])
        members += 1
        pos = len(plain) - len(d.unused_data)
    assert members == 2


def test_repack_job_end_to_end(spark, tmp_path):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    for i in range(3):
        (in_dir / f"part-{i:02d}.warc.gz").write_bytes(gzip.compress(broken_clueweb_bytes()))
    (in_dir / "notes.txt").write_text("skipped: not a warc")  # util.py:60-62

    report = repack.repack_warcs(spark, str(in_dir) + "/*", str(out_dir)).collect()
    assert len(report) == 3
    assert all(r.records == 2 for r in report)

    # the repaired files round-trip through the engine's own reader
    recs = read_warcs(spark, str(out_dir) + "/*.warc.gz").collect()
    assert len(recs) == 6
    uris = {r.target_uri for r in recs}
    assert uris == {"http://example.com/ab/c%20d", "http://example.com/m%C3%BCnchen"}
    assert os.listdir(out_dir)


def test_repack_ingest_pipeline_matches_clean_control(spark, tmp_path):
    """VERDICT r2 item 8: broken ClueWeb WARC → repack → engine reader →
    extraction pipeline must produce the same payload docs as a clean WARC
    carrying the repaired content (multiline URI glued, understated
    Content-Length absorbed)."""
    from frontier_engine.pipeline import run_pipeline
    from frontier_engine.warc_source import (
        read_warcs_split,
        warc_records_to_pages,
        write_warc_bytes,
    )

    para = ("The quick brown fox jumps over the lazy dog and keeps going. " * 12).strip()
    html1 = f"<html><head><title>One</title></head><body><p>{para}</p></body></html>".encode()
    html2 = f"<html><head><title>Zwei</title></head><body><p>{para} again</p></body></html>".encode()

    extra = b"\nEXTRA TRAILING BYTES"
    body1 = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html1 + extra
    stated1 = body1.index(b"EXTRA")  # understated: absorbed by the repacker
    rec1 = (
        b"WARC/0.18\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:e1>\n"
        b"WARC-Target-URI: http://example.com/a\n"
        b"b/long\n"  # multiline URI
        b"WARC-Date: 2009-03-01T00:00:00Z\n"
        b"Content-Type: application/http; msgtype=response\n"
        b"Content-Length: " + str(stated1).encode() + b"\n"
        b"\n" + body1 + b"\n"
    )
    body2 = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + html2
    rec2 = (
        b"WARC/0.18\n"
        b"WARC-Type: response\n"
        b"WARC-Record-ID: <urn:uuid:e2>\n"
        b"WARC-Target-URI: http://example.com/two\n"
        b"WARC-Date: 2009-03-01T00:00:01Z\n"
        b"Content-Type: application/http; msgtype=response\n"
        b"Content-Length: " + str(len(body2)).encode() + b"\n"
        b"\n" + body2 + b"\n\n"
    )
    in_dir, fix_dir, clean_dir = tmp_path / "in", tmp_path / "fix", tmp_path / "clean"
    in_dir.mkdir(); clean_dir.mkdir()
    (in_dir / "broken.warc.gz").write_bytes(gzip.compress(rec1 + rec2))

    report = repack.repack_warcs(spark, str(in_dir) + "/*", str(fix_dir)).collect()
    assert len(report) == 1 and report[0].records == 2

    # clean control: the content the repairs should be equivalent to
    clean = write_warc_bytes([
        {"record_type": "response", "record_id": "<urn:uuid:e1>",
         "target_uri": "http://example.com/ab/long",
         "warc_date": "2009-03-01T00:00:00Z", "http_content_type": "text/html",
         "payload": html1 + extra},
        {"record_type": "response", "record_id": "<urn:uuid:e2>",
         "target_uri": "http://example.com/two",
         "warc_date": "2009-03-01T00:00:01Z", "http_content_type": "text/html",
         "payload": html2},
    ])
    (clean_dir / "clean.warc.gz").write_bytes(gzip.compress(clean))

    def payload_docs(glob):
        pages = warc_records_to_pages(read_warcs_split(spark, glob))
        out = run_pipeline(pages, id_prefix="repacktest")
        rows = out["payload"].collect()
        out["proc"].unpersist()
        return {r.uuid: (r.warc_target_uri, r.title, r.body) for r in rows}

    repaired = payload_docs(str(fix_dir) + "/*.warc.gz")
    control = payload_docs(str(clean_dir) + "/*.warc.gz")
    assert len(repaired) == 2
    assert repaired == control  # same doc identity AND same extracted text
