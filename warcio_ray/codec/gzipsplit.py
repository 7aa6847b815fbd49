"""Multi-member gzip splitting and lenient payload decompression.

The core WARC trick: each record is its own gzip member, concatenated
(bufferedreaders.py:221-227 restarts the decompressor on
``decompressor.unused_data``). We decompress member-by-member from an
in-memory buffer, tracking each member's (compressed offset, compressed
length) — the ``member_info`` provenance of archiveiterator.py:195-251.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional, Tuple


def is_gzip(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b"


_MEMBER_CHUNK = 1 << 18  # feed the decompressor in 256 KiB slices


def iter_gzip_members(data: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, decompressed_bytes) per member.

    Works on the whole in-memory buffer; a 1 GB .warc.gz file is the unit
    of read parallelism, so one task holds one file. Chunked memoryview
    feeding keeps this O(n): no per-member copy of the remaining buffer,
    and ``unused_data`` never exceeds one chunk.
    """
    mv = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        decomp = zlib.decompressobj(16 + zlib.MAX_WBITS)
        parts = []
        feed = pos
        end = None
        try:
            while feed < n:
                chunk = mv[feed:feed + _MEMBER_CHUNK]
                parts.append(decomp.decompress(chunk))
                feed += len(chunk)
                if decomp.eof:
                    end = feed - len(decomp.unused_data)
                    break
        except zlib.error:
            # corrupted member: stop like the reference's mid-stream
            # decompress failure (bufferedreaders.py:146-149)
            break
        if end is None:
            # truncated tail: flush whatever decompressed
            tail = decomp.flush()
            if tail:
                parts.append(tail)
            end = n
        if end <= pos:
            break
        yield pos, end - pos, b"".join(parts)
        pos = end


def gunzip_all(data: bytes) -> bytes:
    """Decompress every member into one buffer (the recompress 'lenient'
    fallback path, recompressor.py:71-81 / read_all_members)."""
    return b"".join(chunk for _, _, chunk in iter_gzip_members(data))


# ---------------------------------------------------------------------------
# Content-Encoding decoders with the reference's forgiving fallbacks
# (bufferedreaders.py:139-149): if the *first* block fails to decompress,
# assume the data was never compressed; 'deflate' retries as raw deflate.
# ---------------------------------------------------------------------------

try:
    import brotli  # optional, like the reference's brotlipy gate
    _HAS_BROTLI = True
except ImportError:
    _HAS_BROTLI = False


def supported_encodings() -> Tuple[str, ...]:
    base = ("gzip", "deflate", "deflate_alt")
    return base + (("br",) if _HAS_BROTLI else base[:0])


def decompress_payload(data: bytes, encoding: Optional[str]) -> bytes:
    """Decode a Content-Encoding'd payload, falling back to the raw bytes
    when the first decompression attempt fails (lenient, like the
    reference) and passing through unknown encodings untouched."""
    if not encoding:
        return data
    encoding = encoding.lower()
    if encoding == "gzip":
        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            out = d.decompress(data)
            return out + d.flush()
        except zlib.error:
            return data
    if encoding == "deflate":
        try:
            d = zlib.decompressobj()
            out = d.decompress(data)
            return out + d.flush()
        except zlib.error:
            try:
                d = zlib.decompressobj(-zlib.MAX_WBITS)
                out = d.decompress(data)
                return out + d.flush()
            except zlib.error:
                return data
    if encoding == "br" and _HAS_BROTLI:
        try:
            return brotli.decompress(data)
        except Exception:
            return data
    return data
