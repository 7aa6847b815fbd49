"""Digest computation and RFC-3548-tolerant comparison.

Matches the reference semantics: digests are rendered as
``"<algo>:" + base32(raw)`` (utils.py:97-106) and stored digests in any of
base16/base64/base64-url are normalized to base32 by length before
comparison (digestverifyingreader.py:111-158).
"""

from __future__ import annotations

import base64
import hashlib
from typing import Optional, Tuple


def sha1_b32(*chunks: bytes) -> str:
    h = hashlib.sha1()
    for c in chunks:
        h.update(c)
    return "sha1:" + base64.b32encode(h.digest()).decode("ascii")


def digest_b32(algo: str, *chunks: bytes) -> str:
    h = hashlib.new(algo)
    for c in chunks:
        h.update(c)
    return algo + ":" + base64.b32encode(h.digest()).decode("ascii")


def parse_digest(digest: str) -> Tuple[str, str]:
    algo, sep, value = digest.partition(":")
    if sep != ":":
        raise ValueError("could not parse digest algorithm out of " + digest)
    return algo, value


def _normalize_to_b32(value: str, b32_len: int) -> str:
    """Re-encode a b16/b64/b64url digest value as b32, inferring the source
    encoding from its length relative to the expected b32 length."""
    if len(value) == b32_len:
        return value
    if len(value) > b32_len:
        raw = base64.b16decode(value, casefold=True)
    elif "-" in value or "_" in value:
        raw = base64.b64decode(value, altchars=b"-_")
    else:
        raw = base64.b64decode(value)
    return base64.b32encode(raw).decode("ascii")


def digests_match(computed_b32: Optional[str], stored: Optional[str]) -> Optional[bool]:
    """Tri-state compare: None when either side is missing."""
    if not computed_b32 or not stored:
        return None
    _, our_value = parse_digest(computed_b32)
    _, stored_value = parse_digest(stored)
    return our_value == _normalize_to_b32(stored_value, len(our_value))
