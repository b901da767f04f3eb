"""URL canonicalization and link resolution.

Reference parity (SURVEY.md §2.2 M10/M11/M20):

- ``GetHref`` (app/spider/common/common.go:248-306): resolve relative /
  absolute hrefs against a base URL, drop ``javascript:`` links, handle
  ``../`` segments.
- ``Request.Prepare()`` (app/downloader/request/request.go:64-117): URL
  normalization via url.Parse + defaults (method GET, priority clamp >= 0).

Our canonical form (documented contract, shared by engine and oracle):

- scheme and host lowercased
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment stripped
- dot-segments (``.`` / ``..``) resolved
- empty path -> ``/``
- query preserved byte-for-byte (no param reordering — reordering would merge
  URLs the reference treats as distinct)
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# Schemes that are never crawlable links (GetHref drops javascript:).
_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def canonicalize(url: str) -> str | None:
    """Canonical absolute URL, or None if not an http(s) URL."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    # userinfo kept AS-IS (credentials are case-sensitive and may contain
    # ':'), only the host part is lowered; port split is IPv6-aware
    userinfo, _, hostport = parts.netloc.rpartition("@")
    hostport = hostport.lower()
    if hostport.startswith("["):  # [v6-literal] with optional :port
        host, _, rest = hostport.partition("]")
        host += "]"
        sep, port = (":", rest[1:]) if rest.startswith(":") else ("", "")
    else:
        host, sep, port = hostport.partition(":")
    if sep and port == _DEFAULT_PORTS.get(scheme):
        hostport = host
    netloc = userinfo + "@" + hostport if userinfo else hostport
    path = _resolve_dots(parts.path) or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def _resolve_dots(path: str) -> str:
    if "." not in path:
        return path
    segments = path.split("/")
    out: list[str] = []
    for seg in segments:
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash produced by a final "." / ".."
    if segments and segments[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    return "/".join(out)


def host_of(url: str) -> str:
    """Lowercased host (no port, no userinfo, no v6 brackets) of an
    absolute URL — THE politeness/robots/cookie host key."""
    netloc = urlsplit(url).netloc.lower()
    netloc = netloc.rpartition("@")[2]
    if netloc.startswith("["):  # IPv6 literal: '[::1]:8080' -> '::1'
        return netloc.partition("]")[0][1:]
    return netloc.partition(":")[0]


def get_href(base_url: str, href: str) -> str | None:
    """Resolve an anchor href against its page URL; None for non-links.

    Mirrors the semantics of the reference's GetHref (common.go:248-306):
    ``javascript:`` (and other non-fetchable schemes) -> dropped; relative
    paths (``x``, ``./x``, ``../x``, ``/x``, ``//host/x``) resolved against
    the base; absolute URLs passed through. Result is canonicalized.
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    for pfx in _SKIP_PREFIXES:
        if low.startswith(pfx):
            return None
    try:
        resolved = urljoin(base_url, href)
    except ValueError:
        return None
    return canonicalize(resolved)


def make_url(base_url: str, path: str) -> str | None:
    """Path -> absolute URL (reference MakeUrl, common.go:178-196)."""
    return get_href(base_url, path)


def href_sub(url: str, query_suffix: str) -> str:
    """Append query params to a URL (reference HrefSub, common.go:234-243)."""
    sep = "&" if "?" in url else "?"
    return url + sep + query_suffix.lstrip("?&")


# --- vectorized wrappers ----------------------------------------------------


# Conservative already-canonical shape: lowercase scheme+host, no userinfo,
# no port, a present path whose charset cannot contain '.' segments, '?', or
# '#'. For any matching url, canonicalize(u) == u and host is the capture —
# so the per-row python pass (urlsplit-bound: ~6s per 165k seeds on the
# driver) runs only for rows that DON'T match.
_FAST_CANON_RE = r"^(?:https?)://(?P<h>[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?)(?P<p>/[a-z0-9/_%-]*)$"


def _fast_canon_mask(urls) -> "np.ndarray":
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(list(urls), pa.string())
    return pc.fill_null(
        pc.match_substring_regex(arr, _FAST_CANON_RE), False
    ).to_numpy(zero_copy_only=False)


def canonicalize_array(urls) -> np.ndarray:
    """Canonicalize an object array of URLs; non-http(s) -> None.
    Already-canonical urls (the common case for refresh frontiers and
    corpus-emitted links) are detected with one C-level regex pass."""
    n = len(urls)
    out = np.asarray(urls, dtype=object).copy()
    fast = _fast_canon_mask(urls)
    for i in np.flatnonzero(~fast):
        u = urls[i]
        out[i] = canonicalize(u) if u is not None else None
    return out


def host_array(urls) -> np.ndarray:
    out = np.empty(len(urls), dtype=object)
    fast = _fast_canon_mask(urls)
    if fast.any():
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(list(urls), pa.string())
        hosts = pc.extract_regex(arr, pattern=_FAST_CANON_RE).field("h")
        hn = hosts.to_numpy(zero_copy_only=False)
        out[fast] = hn[fast]
    for i in np.flatnonzero(~fast):
        u = urls[i]
        out[i] = host_of(u) if u else ""
    return out
