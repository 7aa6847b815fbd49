"""Extract pipeline: point lookup of a single record by (file, offset).

The reference's ``warcio extract`` (extractor.py:8-40): seek to the
offset, parse one record, dump headers and/or payload. A point lookup is
driver-side work, not a dataset op — gzip member offsets make the seek
exact.
"""

from __future__ import annotations

from typing import Optional

from warcio_ray.codec.gzipsplit import is_gzip, iter_gzip_members
from warcio_ray.codec.headers import ByteCursor
from warcio_ray.codec.records import (
    ParseOptions,
    ParsedRecord,
    parse_one_record,
    _consume_record_trailer,
)


def extract_record(filename: str, offset: int,
                   opts: Optional[ParseOptions] = None) -> ParsedRecord:
    """Read exactly one record starting at ``offset``."""
    opts = opts or ParseOptions()
    with open(filename, "rb") as f:
        f.seek(offset)
        data = f.read()
    if is_gzip(data):
        # first gzip member at the offset is the record
        _, comp_len, member = next(iter_gzip_members(data))
        cur = ByteCursor(member)
        rec = parse_one_record(cur, None, None, opts)
        rec.offset, rec.record_length = offset, comp_len
        return rec
    cur = ByteCursor(data)
    rec = parse_one_record(cur, None, None, opts)
    # mirror _parse_record_stream: the trailer consumer returns the next
    # record's status line when one follows — subtract it from the span
    next_line, empty, _ = _consume_record_trailer(cur)
    rec.offset = offset
    rec.record_length = (cur.pos - (len(next_line) if next_line else 0)) - empty
    return rec


def extract_bytes(filename: str, offset: int, payload_only: bool = False,
                  headers_only: bool = False) -> bytes:
    """The CLI behavior: headers blocks and/or payload bytes."""
    rec = extract_record(filename, offset)
    if payload_only:
        return rec.content()
    out = rec.warc_headers.to_bytes()
    if rec.http_headers is not None:
        out += rec.http_headers.to_bytes()
    if not headers_only:
        out += rec.payload
    return out
