"""WARC/ARC record parsing over in-memory buffers.

Behavior-compatible with the reference loader/iterator
(``warcio/recordloader.py:72-373``, ``warcio/archiveiterator.py:26-270``)
but cursor-over-bytes instead of stream-pull: the unit of work is a whole
archive file held by one read task, so records are parsed by slicing, and
every lazy-stream subtlety of the reference collapses into eager column
values (payloads become Arrow ``large_binary`` cells).

Reproduced leniency semantics (observable in the reference's golden tests):
  * truncated / overrun records -> warning counted in ``err_count``, parse
    continues at the next non-blank line (archiveiterator.py:160-190)
  * negative or unparseable Content-Length -> treated as 0
    (recordloader.py:111-124)
  * a gzip member containing more than one record -> ArchiveFormatError in
    strict mode (archiveiterator.py:108-155), parsed fully in lenient mode
    (the recompress fallback, recompressor.py:71-81)
  * wget `<uri>` wrapping and spaces in WARC-Target-URI normalized
    (recordloader.py:245-268)
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field as dc_field
from typing import Callable, List, Optional, Tuple

from warcio_ray.codec.digest import digest_b32, digests_match, parse_digest
from warcio_ray.codec.gzipsplit import (
    decompress_payload,
    is_gzip,
    iter_gzip_members,
    supported_encodings,
)
from warcio_ray.codec.headers import (
    ByteCursor,
    EndOfData,
    HeaderBlock,
    HeaderParseError,
    decode_line,
    parse_header_block,
)
from warcio_ray.codec.timeutil import timestamp14_to_iso_date

WARC_VERSIONS = ("WARC/1.1", "WARC/1.0", "WARC/0.17", "WARC/0.18")
HTTP_VERSIONS = ("HTTP/1.0", "HTTP/1.1")
HTTP_VERBS = ("GET", "HEAD", "POST", "PUT", "DELETE", "TRACE",
              "OPTIONS", "CONNECT", "PATCH")
HTTP_RECORD_TYPES = ("response", "request", "revisit")
HTTP_SCHEMES = ("http:", "https:")

ARC_FIELDS = ("uri", "ip-address", "archive-date", "content-type", "length")
ARC2WARC_FIELDS = ("WARC-Target-URI", "WARC-IP-Address", "WARC-Date",
                   "Content-Type", "Content-Length")

GZIP_MULTI_RECORD_MSG = (
    "non-chunked gzip file detected, gzip block continues beyond single "
    "record; each record must be compressed into its own gzip member "
    "(fix with the recompress pipeline)")


class ArchiveFormatError(Exception):
    """Equivalent of the reference's ArchiveLoadFailed."""


def default_warc_id() -> str:
    return "<urn:uuid:{0}>".format(uuid.uuid4())


@dataclass
class ParseOptions:
    no_record_parse: bool = False
    verify_http: bool = False
    arc2warc: bool = False
    ensure_http_headers: bool = False
    check_digests: bool = False
    lenient: bool = False          # allow multi-record gzip members (recompress fallback)
    id_fn: Callable[[], str] = default_warc_id   # for arc2warc WARC-Record-ID synthesis


@dataclass
class ParsedRecord:
    format: str                      # 'warc' | 'arc'
    rec_type: str
    warc_headers: HeaderBlock
    http_headers: Optional[HeaderBlock]
    content_type: Optional[str]
    length: Optional[int]            # record content length (post arc sub_len)
    payload: bytes                   # raw bytes after http headers (pre content-decode)
    payload_length: int = -1
    offset: int = 0                  # member/record offset within the file
    record_length: int = 0           # member/record length within the file
    url: Optional[str] = None
    digest_passed: Optional[bool] = None
    digest_problems: List[str] = dc_field(default_factory=list)

    def content(self) -> bytes:
        """Decoded payload bytes (transfer- then content-decoding), the
        equivalent of draining ``record.content_stream()``."""
        return decode_payload(self.payload, self.http_headers)


def _parse_arc_headers(cur: ByteCursor, first_line: Optional[str],
                       opts: ParseOptions) -> Tuple[str, HeaderBlock]:
    """ARC 1.0 five-field header line; optionally converted to WARC headers
    (recordloader.py:272-373)."""
    if first_line is None:
        first_line = decode_line(cur.readline())
    if len(first_line) == 0:
        raise EndOfData()
    headerline = first_line.rstrip()

    total_read = 0
    if headerline.startswith("filedesc://"):
        # the ARC file header consumes the version + field-spec lines
        total_read += len(cur.readline())
        total_read += len(cur.readline())

    parts = headerline.rsplit(" ", len(ARC_FIELDS) - 1)
    if len(parts) != len(ARC_FIELDS):
        raise HeaderParseError(
            f"Wrong # of headers, expected arc headers {list(ARC_FIELDS)}, Found {parts}",
            headerline)

    if not opts.arc2warc:
        pairs = list(zip(ARC_FIELDS, parts))
        return "arc", HeaderBlock(protocol="WARC/1.0", statusline="",
                                  pairs=pairs, total_len=total_read)

    # arc2warc: synthesize WARC headers on the fly
    if headerline.startswith("filedesc://"):
        rec_type = "warcinfo"
    else:
        rec_type = "response"
        parts = list(parts)
        parts[3] = "application/http;msgtype=response"
    pairs = [("WARC-Type", rec_type), ("WARC-Record-ID", opts.id_fn())]
    for name, value in zip(ARC2WARC_FIELDS, parts):
        if name == "WARC-Date":
            value = timestamp14_to_iso_date(value)
        if rec_type == "warcinfo" and name == "WARC-Target-URI":
            name, value = "WARC-Filename", value[len("filedesc://"):]
        pairs.append((name, value))
    return "arc2warc", HeaderBlock(protocol="WARC/1.0", statusline="",
                                   pairs=pairs, total_len=total_read)


def _detect_and_parse_headers(cur: ByteCursor, first_line: Optional[str],
                              known_format: Optional[str],
                              opts: ParseOptions) -> Tuple[str, HeaderBlock]:
    if known_format != "arc":
        try:
            hdrs = parse_header_block(cur, WARC_VERSIONS, verify=True,
                                      first_line=first_line)
            return "warc", hdrs
        except HeaderParseError as e:
            if known_format == "warc":
                raise ArchiveFormatError(
                    "Invalid WARC record, first line: " + str(e.statusline))
            first_line = e.statusline
    try:
        return _parse_arc_headers(cur, first_line, opts)
    except HeaderParseError as e:
        if known_format == "arc":
            msg = "Invalid ARC record, first line: "
        else:
            msg = "Unknown archive format, first line: "
        raise ArchiveFormatError(msg + str(e.statusline))


def _normalize_target_uri(hdrs: HeaderBlock) -> Optional[str]:
    """wget `<uri>` unwrap + space %-encoding (recordloader.py:245-268)."""
    uri = hdrs.get("WARC-Target-URI")
    if uri is not None and uri.startswith("<") and uri.endswith(">"):
        uri = uri[1:-1]
        hdrs.replace("WARC-Target-URI", uri)
    if uri is not None and " " in uri:
        uri = uri.replace(" ", "%20")
        hdrs.replace("WARC-Target-URI", uri)
    return uri


def _parse_http_headers(rec_type: str, uri: Optional[str],
                        block_cur: ByteCursor, length: Optional[int],
                        opts: ParseOptions) -> Optional[HeaderBlock]:
    """HTTP block parse conditions per recordloader.py:173-200."""
    if length == 0:
        return None
    if rec_type not in HTTP_RECORD_TYPES:
        return None
    if not uri or not uri.startswith(HTTP_SCHEMES):
        return None
    if rec_type == "request":
        return parse_header_block(block_cur, HTTP_VERBS, verify=opts.verify_http)
    if rec_type == "revisit":
        try:
            return parse_header_block(block_cur, HTTP_VERSIONS, verify=opts.verify_http)
        except EndOfData:
            return None  # empty revisit with no http headers is fine
    return parse_header_block(block_cur, HTTP_VERSIONS, verify=opts.verify_http)


def _default_http_headers(length: Optional[int],
                          content_type: Optional[str]) -> HeaderBlock:
    pairs = []
    if content_type:
        pairs.append(("Content-Type", content_type))
    if length is not None and length >= 0:
        pairs.append(("Content-Length", str(length)))
    return HeaderBlock(protocol="HTTP/1.0", statusline="200 OK", pairs=pairs)


def _check_digests(record: ParsedRecord, block_bytes: bytes,
                   http_consumed: int) -> None:
    """Eager digest verification, tri-state like DigestChecker
    (digestverifyingreader.py:10-108): ``None`` = nothing checked.

    The block digest covers every content byte (http headers + payload);
    the payload digest starts after the http headers. Revisit records and
    segmented records skip checks; a zero-length record never fires the
    block check (the reference only compares when bytes flow).
    """
    hdrs = record.warc_headers
    stored_payload = hdrs.get("WARC-Payload-Digest")
    stored_block = hdrs.get("WARC-Block-Digest")
    if not stored_payload and not stored_block:
        return
    if record.rec_type == "revisit":
        return
    if hdrs.get("WARC-Segment-Number") is not None:
        stored_payload = None

    problems = record.digest_problems

    def check_one(stored: Optional[str], label: str, data: bytes,
                  fail_sep: str) -> None:
        if not stored:
            return
        try:
            algo, _ = parse_digest(stored)
            computed = digest_b32(algo, data)
        except ValueError:
            problems.append(f"unknown hash algorithm name in {label} digest")
            record.digest_passed = False
            return
        try:
            ok = digests_match(computed, stored)
        except ValueError:
            # binascii.Error (a ValueError) from a malformed stored digest
            # must flag the record, not crash the whole file's read task
            problems.append(f"malformed {label} digest value: {stored}")
            record.digest_passed = False
            return
        if ok is False:
            problems.append(f"{label} digest failed{fail_sep}{stored}")
            record.digest_passed = False
        elif ok is True and record.digest_passed is not False:
            record.digest_passed = True

    payload_bytes = block_bytes[http_consumed:]
    if len(block_bytes) > 0:
        check_one(stored_block, "block", block_bytes, ": ")
    # the reference emits 'payload digest failed: X' for empty payloads
    # (begin_payload, limit==0) and 'payload digest failed X' otherwise
    check_one(stored_payload, "payload", payload_bytes,
              ": " if len(payload_bytes) == 0 else " ")


def parse_one_record(cur: ByteCursor, first_line: Optional[str],
                     known_format: Optional[str],
                     opts: ParseOptions) -> ParsedRecord:
    """Parse a single record starting at the cursor (plus optional
    carried-over first line). Raises EndOfData at stream end."""
    fmt, hdrs = _detect_and_parse_headers(cur, first_line, known_format, opts)

    if fmt == "arc":
        uri = hdrs.get("uri")
        length_str = hdrs.get("length")
        content_type = hdrs.get("content-type")
        sub_len = hdrs.total_len
        rec_type = "arc_header" if (uri and uri.startswith("filedesc://")) else "response"
    else:
        rec_type = hdrs.get("WARC-Type")
        uri = _normalize_target_uri(hdrs)
        length_str = hdrs.get("Content-Length")
        content_type = hdrs.get("Content-Type")
        sub_len = hdrs.total_len if fmt == "arc2warc" else 0
        fmt = "warc"

    length: Optional[int] = None
    is_err = False
    try:
        if length_str is not None:
            length = int(length_str) - sub_len
            if length < 0:
                is_err = True
    except (ValueError, TypeError):
        is_err = True
    if is_err:
        length = 0

    block = cur.read(length) if length is not None else cur.read()

    http_headers: Optional[HeaderBlock] = None
    payload_length = -1
    http_consumed = 0
    if not opts.no_record_parse:
        block_cur = ByteCursor(block)
        http_headers = _parse_http_headers(rec_type, uri, block_cur, length, opts)
        if http_headers is not None:
            http_consumed = http_headers.total_len
        if length and http_headers:
            payload_length = length - http_consumed

    if not http_headers and opts.ensure_http_headers:
        http_headers = _default_http_headers(length, content_type)

    record = ParsedRecord(format=fmt, rec_type=rec_type, warc_headers=hdrs,
                          http_headers=http_headers, content_type=content_type,
                          length=length, payload=block[http_consumed:],
                          payload_length=payload_length, url=uri)
    if opts.check_digests and fmt == "warc":
        _check_digests(record, block, http_consumed)
    return record


def _consume_record_trailer(cur: ByteCursor) -> Tuple[Optional[bytes], int, int]:
    """Consume blank lines after a record (archiveiterator.py:160-190).

    Returns (next_statusline_bytes_or_None, empty_size, err_increment). A
    non-blank *first* line means the Content-Length was wrong: warn-count
    it, consume it, and keep consuming blanks.
    """
    empty_size = 0
    err_inc = 0
    first_line = True
    while True:
        raw = cur.readline()
        if len(raw) == 0:
            return None, empty_size, err_inc
        stripped = raw.rstrip()
        if len(stripped) == 0 or first_line:
            empty_size += len(raw)
            if len(stripped) != 0:
                err_inc += 1
            first_line = False
            continue
        return raw, empty_size, err_inc


@dataclass
class ArchiveParseResult:
    records: List[ParsedRecord]
    err_count: int = 0


def _iter_record_stream(data: bytes, opts: ParseOptions,
                        known_format: Optional[str],
                        base_offset: int = 0,
                        compressed: bool = False):
    """Scan a decompressed buffer for consecutive records, yielding
    (record, err_inc) pairs as they parse (the streaming primitive the
    chunked datasource builds on)."""
    cur = ByteCursor(data)
    next_line: Optional[bytes] = None
    fmt_cache = known_format
    while True:
        start = cur.pos - (len(next_line) if next_line else 0)
        try:
            rec = parse_one_record(
                cur, decode_line(next_line) if next_line is not None else None,
                fmt_cache, opts)
        except EndOfData:
            break
        if not opts.arc2warc:
            fmt_cache = rec.format
        next_line, empty_size, err_inc = _consume_record_trailer(cur)
        end = cur.pos - (len(next_line) if next_line else 0)
        rec.offset = base_offset + start
        rec.record_length = (end - start) - (0 if compressed else empty_size)
        yield rec, err_inc
        if next_line is None:
            # trailer hit end-of-buffer: skip the wasted parse attempt
            # whose only outcome would be EndOfData (hot-path profiling
            # showed it doubled parse_one_record calls per gzip member)
            break


def _parse_record_stream(data: bytes, opts: ParseOptions,
                         known_format: Optional[str],
                         base_offset: int = 0,
                         compressed: bool = False,
                         max_records: Optional[int] = None
                         ) -> Tuple[List[ParsedRecord], int, Optional[str]]:
    """List-collecting wrapper over ``_iter_record_stream`` (per-member
    parses use ``max_records`` for the multi-record-gzip check)."""
    records: List[ParsedRecord] = []
    err_count = 0
    for rec, err_inc in _iter_record_stream(data, opts, known_format,
                                            base_offset, compressed):
        records.append(rec)
        err_count += err_inc
        if max_records is not None and len(records) >= max_records:
            break
    return records, err_count, None


def parse_archive_bytes(data: bytes,
                        opts: Optional[ParseOptions] = None,
                        known_format: Optional[str] = None) -> ArchiveParseResult:
    """Parse a whole WARC/ARC file (gzip-member-chunked or plain).

    For gzip inputs, (offset, record_length) are the *compressed* member
    bounds — the provenance the reference's indexer emits. In strict mode
    a member containing more than one record raises ArchiveFormatError;
    ``opts.lenient`` instead bulk-decompresses and re-parses (the
    recompress fallback path).
    """
    opts = opts or ParseOptions()
    records: List[ParsedRecord] = []
    err_count = 0
    for rec, err_inc in iter_archive_records(data, opts, known_format):
        if rec is not None:  # record-less members can still carry errors
            records.append(rec)
        err_count += err_inc
    return ArchiveParseResult(records, err_count)


def iter_archive_records(data: bytes,
                         opts: Optional[ParseOptions] = None,
                         known_format: Optional[str] = None):
    """Streaming form of ``parse_archive_bytes``: yields
    (record, err_inc) one record at a time so a datasource can emit
    bounded Arrow chunks instead of one whole-file table — a ~1 GB
    Common-Crawl WARC never holds its full decompressed payload in a
    single block."""
    opts = opts or ParseOptions()
    if not is_gzip(data):
        yield from _iter_record_stream(data, opts, known_format,
                                       compressed=False)
        return

    fmt_cache = known_format
    for offset, comp_len, member in iter_gzip_members(data):
        found, errs, _ = _parse_record_stream(
            member, opts, fmt_cache, compressed=True,
            max_records=None if opts.lenient else 2)
        if not found:
            if errs:
                yield None, errs  # trailer warnings with no record
            continue
        if len(found) > 1 and not opts.lenient:
            raise ArchiveFormatError(GZIP_MULTI_RECORD_MSG)
        if not opts.arc2warc:
            fmt_cache = found[0].format
        if len(found) == 1:
            found[0].offset = offset
            found[0].record_length = comp_len
        # lenient multi-record members keep decompressed-relative offsets
        for i, rec in enumerate(found):
            yield rec, errs if i == 0 else 0


# ---------------------------------------------------------------------------
# content_stream() equivalent: transfer-decode then content-decode
# ---------------------------------------------------------------------------

def _dechunk(data: bytes) -> bytes:
    """HTTP/1.1 chunked transfer decoding with the reference's best-guess
    fallbacks (bufferedreaders.py:322-376): undecodable chunk header or a
    missing terminator -> treat the remainder as non-chunked data."""
    out = []
    cur = ByteCursor(data)
    while True:
        # chunk-size line is capped at 64 bytes in the reference
        line_start = cur.pos
        header = cur.readline()
        if len(header) > 64:
            cur.pos = line_start + 64
            header = header[:64]
        if header[-2:] != b"\r\n":
            out.append(header + cur.read())
            break
        size_part = header[:-2].split(b";")[0]
        try:
            chunk_size = int(size_part, 16)
            if chunk_size > 2 ** 31:
                raise ValueError
        except ValueError:
            out.append(header + cur.read())
            break
        if chunk_size == 0:
            final = cur.read(2)
            if final != b"\r\n":
                out.append(header + final + cur.read())
            break
        chunk = cur.read(chunk_size)
        out.append(chunk)
        if len(chunk) < chunk_size:
            break  # ran out of data: assume the file was cut off
        crlf = cur.read(2)
        if crlf != b"\r\n":
            out.append(crlf + cur.read())
            break
    return b"".join(out)


def decode_payload(payload: bytes, http_headers: Optional[HeaderBlock]) -> bytes:
    """Equivalent of draining ``record.content_stream()``
    (recordloader.py:27-44)."""
    if not http_headers:
        return payload
    encoding = http_headers.get("content-encoding")
    if encoding:
        encoding = encoding.lower()
        if encoding not in supported_encodings():
            encoding = None
    if http_headers.get("transfer-encoding") == "chunked":
        return decompress_payload(_dechunk(payload), encoding)
    if encoding:
        return decompress_payload(payload, encoding)
    return payload
