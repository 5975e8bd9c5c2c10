"""URL canonicalization for the crawl frontier.

Mandated by BASELINE.json ``north_rule`` (the reference indexes
``WARC-Target-URI`` verbatim — process.py:284 — so this is engine-new code;
closest reference analog is the sha256 path key of warcio.py:120).

Canonical form (RFC 3986 informed, fixed here as the engine spec):
  1. scheme lowercased; missing scheme -> 'http'
  2. host lowercased, trailing dot stripped, IDNA left as-is
  3. default ports stripped (http:80, https:443); other ports kept
  4. fragment stripped
  5. percent-encoding normalized: hex digits uppercased; unreserved
     characters (ALPHA / DIGIT / '-' '.' '_' '~') decoded
  6. dot-segments ('.', '..') collapsed in the path
  7. empty path -> '/'
  8. query kept verbatim apart from rule 5 (no key re-ordering: ordering
     can be semantic) ; empty query ('?') dropped
Canonicalization is idempotent (property-tested in tests/test_urlnorm.py).
"""

from __future__ import annotations

import re

import pandas as pd

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")
_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    """Uppercase percent triplets; decode unreserved characters."""

    def repl(m: re.Match) -> str:
        code = int(m.group(1), 16)
        ch = chr(code)
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _collapse_dots(path: str) -> str:
    """Remove '.' and '..' segments (RFC 3986 §5.2.4)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve leading slash; re-add trailing slash if '.'/'..' ended the path
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL. Pure, deterministic, idempotent."""
    if url is None:
        return None
    u = url.strip()
    # fragment first: everything after the first '#' goes away
    hash_pos = u.find("#")
    if hash_pos != -1:
        u = u[:hash_pos]
    m = _SCHEME_RE.match(u)
    if m:
        scheme = m.group(1).lower()
        rest = u[m.end():]
    else:
        scheme = "http"
        rest = u
    if rest.startswith("//"):
        rest = rest[2:]
    # split authority / path+query
    slash = len(rest)
    for i, ch in enumerate(rest):
        if ch in "/?":
            slash = i
            break
    authority, pathq = rest[:slash], rest[slash:]
    # userinfo (rare in crawls) kept verbatim
    userinfo = ""
    if "@" in authority:
        userinfo, authority = authority.rsplit("@", 1)
        userinfo += "@"
    host, port = authority, ""
    if ":" in authority and not authority.startswith("["):
        host, port = authority.rsplit(":", 1)
    elif authority.startswith("[") and "]:" in authority:
        host, port = authority.rsplit(":", 1)
    host = host.lower().rstrip(".")
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        host_port = f"{host}:{port}"
    else:
        host_port = host
    # path / query
    q_pos = pathq.find("?")
    if q_pos == -1:
        path, query = pathq, ""
    else:
        path, query = pathq[:q_pos], pathq[q_pos + 1:]
    path = _collapse_dots(_norm_pct(path)) or "/"
    query = _norm_pct(query)
    out = f"{scheme}://{userinfo}{host_port}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(url_norm: str) -> str:
    """Registered host of a canonical URL (politeness grouping key)."""
    if url_norm is None:
        return None
    rest = url_norm.split("://", 1)[-1]
    auth = rest.split("/", 1)[0].split("?", 1)[0]
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    if ":" in auth and not auth.startswith("["):
        auth = auth.rsplit(":", 1)[0]
    return auth


# ---------------------------------------------------------------- vectorized

def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url, na_action="ignore")


def host_series(urls_norm: pd.Series) -> pd.Series:
    return urls_norm.map(host_of, na_action="ignore")
