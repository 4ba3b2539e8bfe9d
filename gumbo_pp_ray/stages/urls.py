"""URL canonicalization — the standard web-pipeline normalization step
(dedup keys, per-host grouping, crawl frontier identity).

The reference has no URL handling (retrieval is out of scope for it —
SURVEY.md §2.7); this operator exists for the training-data pipeline
surface, same rule set major crawlers document publicly:

1. trim surrounding whitespace,
2. drop the fragment (``#...``),
3. lowercase the scheme and host,
4. strip the scheme's default port (``http:80`` / ``https:443``),
5. empty path → ``/``,
6. sort query parameters lexicographically (full ``k=v`` token order,
   duplicates preserved), drop a resulting empty query.

Pure per-row string work → a stateless ``map_batches`` task stage (no
actor pool needed: there is no per-worker state to build).
"""

from __future__ import annotations

import re

import pyarrow as pa

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$", re.S)
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _host_port(hostport: str) -> tuple[str, str]:
    """(host, port) split with IPv6 bracket awareness — a plain
    rsplit(':') would cut inside '[::1]' or treat a userinfo colon as
    the port separator (callers strip userinfo first)."""
    if hostport.startswith("["):
        end = hostport.find("]")
        if end != -1:
            host = hostport[:end + 1]
            rest = hostport[end + 1:]
            return host, (rest[1:] if rest.startswith(":") else "")
        return hostport, ""          # malformed bracket: leave intact
    if ":" in hostport:
        h, _, p = hostport.rpartition(":")
        return h, p
    return hostport, ""


def canonicalize_url(url: str) -> str:
    """Canonical form of one URL per the module rule set; inputs
    without a ``scheme://`` prefix are returned trimmed-only (opaque
    identifiers like ``img://…`` DO parse and normalize)."""
    s = url.strip()
    m = _SCHEME_RE.match(s)
    if not m:
        return s            # trimmed-only, fragment INCLUDED: non-URL
    #                         opaque ids keep their full identity
    scheme = m.group(1).lower()
    rest = m.group(2).split("#", 1)[0]
    cut = len(rest)
    for sep in ("/", "?"):
        i = rest.find(sep)
        if i != -1:
            cut = min(cut, i)
    auth, remainder = rest[:cut], rest[cut:]
    # userinfo keeps its case (credentials are case-sensitive); only
    # the host lowercases, and the port split is IPv6-bracket-aware
    userinfo, at, hostport = auth.rpartition("@")
    host, port = _host_port(hostport.lower())
    if port == _DEFAULT_PORTS.get(scheme):
        port = ""
    hostport = f"{host}:{port}" if port else host
    hostport = f"{userinfo}@{hostport}" if at else hostport
    if remainder.startswith("?"):
        path, _, query = "", "?", remainder[1:]
    else:
        path, _, query = remainder.partition("?")
    if not path:
        path = "/"
    if query:
        toks = sorted(t for t in query.split("&") if t)
        query = "&".join(toks)
    out = f"{scheme}://{hostport}{path}"
    return f"{out}?{query}" if query else out


def url_host(url: str) -> str:
    """Lowercased host (port stripped) of a canonical-or-raw URL; ""
    when there is no ``scheme://`` prefix."""
    m = _SCHEME_RE.match(url.strip())
    if not m:
        return ""
    rest = m.group(2)
    cut = len(rest)
    for sep in ("/", "?", "#"):
        i = rest.find(sep)
        if i != -1:
            cut = min(cut, i)
    auth = rest[:cut]
    hostport = auth.rpartition("@")[2]       # drop userinfo
    return _host_port(hostport.lower())[0]


def canonicalize_batch(batch: pa.Table, *, col: str = "url",
                       out_col: str = "url_canon",
                       host_col: str | None = "host") -> pa.Table:
    """Stateless map_batches kernel: append canonical URL (+ host)."""
    urls = batch.column(col).to_pylist()
    canon = [canonicalize_url(u or "") for u in urls]
    out = batch.append_column(out_col, pa.array(canon, pa.string()))
    if host_col:
        out = out.append_column(
            host_col, pa.array([url_host(c) for c in canon], pa.string()))
    return out


def canonicalize_urls(ds, *, col: str = "url", out_col: str = "url_canon",
                      host_col: str | None = "host"):
    """Dataset stage: per-row canonicalization + host extraction.
    Stateless task pool — nothing to initialize per worker."""
    import functools
    return ds.map_batches(
        functools.partial(canonicalize_batch, col=col, out_col=out_col,
                          host_col=host_col),
        batch_format="pyarrow")
