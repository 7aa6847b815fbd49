"""WARC record construction and byte-identical serialization.

Reproduces the reference's serialization contract
(``warcio/recordbuilder.py:82-213``, ``warcio/warcwriter.py:41-127``):

* header synthesis order: WARC-Type, WARC-Record-ID, WARC-Target-URI,
  WARC-Date, then WARC-Payload-Digest (at build), WARC-Block-Digest (at
  write), Content-Type, Content-Length
* block digest covers ascii http-headers-buffer + payload bytes; payload
  digest covers payload bytes only; warcinfo/revisit get no payload digest
* Content-Length = len(http_headers_buff) + payload_length (revisit:
  headers only)
* WARC headers serialized utf-8; HTTP headers %-encoded ascii; record
  terminated by CRLF CRLF; gzip output is one gzip member per record at
  level 9

ID and date generation are injectable (``id_fn`` / ``date_fn``) so tests
can pin them, exactly as the reference's test suite overrides
``_make_warc_id`` / ``_make_warc_date``.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Callable, Dict, Iterable, Optional, Tuple

from warcio_ray.codec.digest import sha1_b32
from warcio_ray.codec.headers import ByteCursor, HeaderBlock
from warcio_ray.codec.records import (
    ParseOptions,
    ParsedRecord,
    _parse_http_headers,
    default_warc_id,
)
from warcio_ray.codec.timeutil import datetime_to_iso_date

WARC_1_0 = "WARC/1.0"
WARC_1_1 = "WARC/1.1"

REVISIT_PROFILE_1_0 = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
REVISIT_PROFILE_1_1 = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

DEFAULT_CONTENT_TYPES = {
    "warcinfo": "application/warc-fields",
    "response": "application/http; msgtype=response",
    "revisit": "application/http; msgtype=response",
    "request": "application/http; msgtype=request",
    "metadata": "application/warc-fields",
}

NO_PAYLOAD_DIGEST_TYPES = ("warcinfo", "revisit")

HeaderFilter = Optional[Callable[[Tuple[str, str]], Optional[Tuple[str, str]]]]


def default_warc_date(use_micros: bool = False) -> str:
    return datetime_to_iso_date(
        datetime.now(timezone.utc).replace(tzinfo=None), use_micros=use_micros)


def _headers_buff(http_headers: HeaderBlock,
                  header_filter: HeaderFilter = None) -> bytes:
    """ASCII http-headers buffer with optional per-header filter applied
    before encoding (the filter participates in digests, warcwriter.py:16)."""
    if header_filter is None:
        return http_headers.to_ascii_bytes()
    filtered = HeaderBlock(protocol=http_headers.protocol,
                           statusline=http_headers.statusline,
                           pairs=[p for p in
                                  (header_filter(h) for h in http_headers.pairs)
                                  if p])
    return filtered.to_ascii_bytes()


def build_record(uri: str,
                 rec_type: str,
                 payload: bytes = b"",
                 http_headers: Optional[HeaderBlock] = None,
                 warc_headers_dict: Optional[Dict[str, str]] = None,
                 warc_headers: Optional[HeaderBlock] = None,
                 warc_content_type: str = "",
                 warc_version: str = WARC_1_0,
                 id_fn: Callable[[], str] = default_warc_id,
                 date_fn: Optional[Callable[[bool], str]] = None) -> ParsedRecord:
    """Equivalent of RecordBuilder.create_warc_record."""
    if not warc_version.startswith("WARC/"):
        warc_version = "WARC/" + warc_version
    date_fn = date_fn or default_warc_date
    use_micros = warc_version >= WARC_1_1

    # auto-extract http headers from the payload when not supplied
    if payload and http_headers is None:
        cur = ByteCursor(payload)
        http_headers = _parse_http_headers(rec_type, uri, cur, len(payload),
                                           ParseOptions(verify_http=True))
        if http_headers is not None:
            payload = payload[http_headers.total_len:]

    if warc_headers is None:
        warc_headers = HeaderBlock(protocol=warc_version, statusline="",
                                   pairs=list((warc_headers_dict or {}).items()))
        warc_headers.replace("WARC-Type", rec_type)
        if not warc_headers.get("WARC-Record-ID"):
            warc_headers.add("WARC-Record-ID", id_fn())
        if uri:
            warc_headers.replace("WARC-Target-URI", uri)
        if not warc_headers.get("WARC-Date"):
            warc_headers.add("WARC-Date", date_fn(use_micros))

    if not warc_content_type:
        warc_content_type = warc_headers.get("Content-Type") or \
            DEFAULT_CONTENT_TYPES.get(rec_type, "application/warc-record")

    record = ParsedRecord(format="warc", rec_type=rec_type,
                          warc_headers=warc_headers, http_headers=http_headers,
                          content_type=warc_content_type, length=len(payload),
                          payload=payload, payload_length=len(payload), url=uri)

    # build-time payload digest (never for warcinfo/revisit)
    if (rec_type not in NO_PAYLOAD_DIGEST_TYPES
            and not warc_headers.get("WARC-Payload-Digest")):
        warc_headers.add("WARC-Payload-Digest", sha1_b32(payload))
    return record


def build_warcinfo(filename: str,
                   info: Dict[str, object],
                   warc_version: str = WARC_1_0,
                   id_fn: Callable[[], str] = default_warc_id,
                   date_fn: Optional[Callable[[bool], str]] = None) -> ParsedRecord:
    """Equivalent of RecordBuilder.create_warcinfo_record: a warc-fields
    payload built from an ordered mapping, skipping empty values."""
    if not warc_version.startswith("WARC/"):
        warc_version = "WARC/" + warc_version
    date_fn = date_fn or default_warc_date
    hdrs = HeaderBlock(protocol=warc_version)
    hdrs.add("WARC-Type", "warcinfo")
    hdrs.add("WARC-Record-ID", id_fn())
    if filename:
        hdrs.add("WARC-Filename", filename)
    hdrs.add("WARC-Date", date_fn(warc_version >= WARC_1_1))

    payload = b"".join(
        f"{name}: {value}\r\n".encode("utf-8")
        for name, value in info.items() if value)
    return build_record("", "warcinfo", payload=payload, warc_headers=hdrs,
                        warc_version=warc_version)


def build_revisit(uri: str,
                  digest: str,
                  refers_to_uri: str,
                  refers_to_date: str,
                  http_headers: Optional[HeaderBlock] = None,
                  warc_headers_dict: Optional[Dict[str, str]] = None,
                  warc_version: str = WARC_1_0,
                  id_fn: Callable[[], str] = default_warc_id,
                  date_fn: Optional[Callable[[bool], str]] = None) -> ParsedRecord:
    """Equivalent of RecordBuilder.create_revisit_record — warcio's dedup
    primitive: same-payload URLs become revisit pointers."""
    assert digest, "Digest can not be empty"
    record = build_record(uri, "revisit", http_headers=http_headers,
                          warc_headers_dict=warc_headers_dict or {},
                          warc_version=warc_version, id_fn=id_fn, date_fn=date_fn)
    profile = REVISIT_PROFILE_1_1 if record.warc_headers.protocol == WARC_1_1 \
        else REVISIT_PROFILE_1_0
    record.warc_headers.add("WARC-Profile", profile)
    record.warc_headers.add("WARC-Refers-To-Target-URI", refers_to_uri)
    record.warc_headers.add("WARC-Refers-To-Date", refers_to_date)
    record.warc_headers.add("WARC-Payload-Digest", digest)
    return record


def serialize_record(record: ParsedRecord,
                     gzip: bool = True,
                     header_filter: HeaderFilter = None) -> bytes:
    """Serialize one record to its exact WARC byte representation
    (one gzip member when ``gzip``). Mutates the record's WARC headers
    the same way the reference writer does (digests/lengths recomputed)."""
    hdrs = record.warc_headers
    payload = record.payload

    buff = b""
    if record.http_headers is not None:
        buff = _headers_buff(record.http_headers, header_filter)

    if record.length is None:
        # unknown length: recompute digests + length from scratch
        hdrs.remove("WARC-Block-Digest")
        if record.rec_type != "revisit":
            hdrs.remove("WARC-Payload-Digest")
        hdrs.remove("Content-Type")
        if (record.rec_type not in NO_PAYLOAD_DIGEST_TYPES):
            hdrs.add("WARC-Payload-Digest", sha1_b32(payload))
        hdrs.add("WARC-Block-Digest", sha1_b32(buff, payload))
        record.payload_length = len(payload)
        record.length = record.payload_length
    else:
        if (record.rec_type not in NO_PAYLOAD_DIGEST_TYPES
                and not hdrs.get("WARC-Payload-Digest")):
            hdrs.add("WARC-Payload-Digest", sha1_b32(payload))
        if not hdrs.get("WARC-Block-Digest"):
            hdrs.add("WARC-Block-Digest", sha1_b32(buff, payload))

    if record.content_type is not None:
        hdrs.replace("Content-Type", record.content_type)

    headers_only = record.rec_type == "revisit"
    payload_length = record.payload_length
    if payload_length is None or payload_length < 0:
        payload_length = len(payload)

    if record.http_headers is not None:
        length = len(buff) + (0 if headers_only else payload_length)
    else:
        length = record.length if record.length is not None else payload_length
    hdrs.replace("Content-Length", str(length))

    out = hdrs.to_bytes(encoding="utf-8") + buff
    if not headers_only:
        out += payload
    out += b"\r\n\r\n"
    return gzip_member(out) if gzip else out


def gzip_member(data: bytes) -> bytes:
    """One gzip member per record, level 9 (warcwriter.py:113-127)."""
    comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS + 16)
    return comp.compress(data) + comp.flush()


def serialize_records(records: Iterable[ParsedRecord], gzip: bool = True,
                      header_filter: HeaderFilter = None) -> bytes:
    return b"".join(serialize_record(r, gzip=gzip, header_filter=header_filter)
                    for r in records)
