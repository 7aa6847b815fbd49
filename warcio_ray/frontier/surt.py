"""SURT canonicalization (RFC 3986 normalize + sort-friendly reordering)
and the stable 64-bit url hash every frontier stage keys on.

The reference repo has no canonicalizer (warcio only %-encodes spaces and
strips wget's `<>` wrapping, recordloader.py:245-268); the SURT contract
here is self-hosted and deterministic: same url string -> same surt ->
same uint64 hash in every process, forever (blake2b, no PYTHONHASHSEED
dependence). Everything that shards by url (seen-set, frontier rounds,
checkpoints) uses ``url_hash64 % num_shards``.
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Tuple
from urllib.parse import quote, unquote_to_bytes

_SCHEME_RX = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

# unreserved characters stay decoded; everything else re-encoded uppercase
_SAFE_PATH = "/~!$&'()*+,;=:@-._"
_SAFE_QUERY = "~!$&'()*+,;=:@/?-._"


def _split_url(url: str) -> Optional[Tuple[str, str, str, str, str]]:
    """-> (scheme, authority, path, query, fragment) or None if no scheme."""
    m = _SCHEME_RX.match(url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = url[m.end():]
    has_authority = rest.startswith("//")
    if has_authority:
        rest = rest[2:]
        slash = len(rest)
        for ch in "/?#":
            i = rest.find(ch)
            if i != -1:
                slash = min(slash, i)
        authority, rest = rest[:slash], rest[slash:]
    else:
        authority = ""
    frag = ""
    if "#" in rest:
        rest, frag = rest.split("#", 1)
    query = ""
    if "?" in rest:
        rest, query = rest.split("?", 1)
    if not has_authority and authority == "":
        authority = None  # opaque URI like dns:example.com
    return scheme, authority, rest, query, frag


def _normalize_pct(s: str, safe: str) -> str:
    """Percent-decode then re-encode with a canonical safe set."""
    try:
        raw = unquote_to_bytes(s)
    except Exception:
        return s
    return quote(raw, safe=safe)


def _remove_dot_segments(path: str) -> str:
    out: List[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm or "/"


def canonicalize(url: str) -> Optional[str]:
    """RFC 3986 normalization -> canonical url string.

    Returns None for urls without a scheme (not crawlable).
    """
    url = url.strip()
    parts = _split_url(url)
    if parts is None:
        return None
    scheme, authority, path, query, _frag = parts

    if authority is None:
        # opaque URI (dns:example.com, whois:..): lowercase scheme only
        out = f"{scheme}:{path}"
        if query:
            out += "?" + query
        return out

    userinfo = ""
    hostport = authority
    if "@" in authority:
        userinfo, hostport = authority.rsplit("@", 1)
    host, port = hostport, ""
    if host.startswith("["):  # ipv6 literal
        end = host.find("]")
        if end != -1 and ":" in host[end:]:
            host, port = host[:end + 1], host[end + 2:]
    elif ":" in hostport:
        host, port = hostport.rsplit(":", 1)
    host = host.lower().rstrip(".")
    if port == _DEFAULT_PORTS.get(scheme, None) or port == "":
        port = ""

    path = _remove_dot_segments(_normalize_pct(path, _SAFE_PATH)) if path else "/"
    if query:
        params = query.split("&")
        params = sorted(_normalize_pct(p, _SAFE_QUERY) for p in params if p)
        query = "&".join(params)

    auth = host + (":" + port if port else "")
    if userinfo:
        auth = userinfo + "@" + auth
    out = f"{scheme}://{auth}{path}"
    if query:
        out += "?" + query
    return out


def surt(url: str) -> Optional[str]:
    """Sort-friendly form: 'com,example)/path?query' (host reversed,
    leading www stripped, scheme dropped)."""
    canon = canonicalize(url)
    if canon is None:
        return None
    parts = _split_url(canon)
    if parts is None:
        return None
    scheme, authority, path, query, _ = parts
    if authority is None:
        return None  # opaque URIs are not crawlable
    host = authority.rsplit("@", 1)[-1]
    port = ""
    if not host.startswith("[") and ":" in host:
        host, port = host.rsplit(":", 1)
    if host.startswith("www.") and host.count(".") >= 2:
        host = host[4:]
    rev = ",".join(reversed(host.split("."))) if host else ""
    if port:
        rev += ":" + port
    out = rev + ")" + path
    if query:
        out += "?" + query
    return out


def url_hash64(surt_str: str) -> int:
    """Stable uint64 of a surt string (blake2b-8; process-independent)."""
    return int.from_bytes(
        hashlib.blake2b(surt_str.encode("utf-8"), digest_size=8).digest(),
        "big")


def url_to_hash64(url: str) -> Optional[int]:
    s = surt(url)
    return None if s is None else url_hash64(s)


def host_of(url: str) -> Optional[str]:
    parts = _split_url(url)
    if parts is None or parts[1] is None:
        return None
    host = parts[1].rsplit("@", 1)[-1]
    if not host.startswith("[") and ":" in host:
        host = host.rsplit(":", 1)[0]
    return host.lower().rstrip(".") or None
