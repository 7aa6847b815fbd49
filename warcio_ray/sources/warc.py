"""Ray Data datasource for WARC/ARC archives.

The unit of parallelism is the FILE: gzip-member chunking makes random
entry into an archive impossible (the reason Common Crawl ships ~1 GB
WARCs), so each read task parses one file with the pure codec and emits
Arrow record batches — the Ray-native equivalent of the reference's
``ArchiveIterator`` (archiveiterator.py:26-270), one task per archive
instead of one process per archive.

Emitted schema (FIXTURES.md T2, with ``payload`` holding the RAW record
content bytes; transfer/content decoding is a downstream vectorized
stage so the table stays lossless for byte-identical re-serialization):

    filename, offset, length: int64, format, rec_type,
    warc_version, warc_headers: list<struct<name,value>>,
    http_protocol, http_statusline, http_headers, content_type,
    content_length: int64, payload: large_binary,
    payload_digest, block_digest,             # computed sha1 (dedup keys)
    digest_passed: bool (tri-state), digest_problems: list<string>,
    url, warc_date: timestamp[us]
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import pyarrow as pa

from warcio_ray.codec.digest import sha1_b32
from warcio_ray.codec.headers import HeaderBlock
from warcio_ray.codec.records import (
    ArchiveFormatError,
    ParseOptions,
    ParsedRecord,
    parse_archive_bytes,
)
from warcio_ray.codec.timeutil import iso_date_to_datetime

HEADER_PAIRS = pa.list_(pa.struct([("name", pa.string()),
                                   ("value", pa.string())]))

WARC_RECORDS_SCHEMA = pa.schema([
    ("filename", pa.string()),
    ("offset", pa.int64()),
    ("length", pa.int64()),
    ("format", pa.string()),
    ("rec_type", pa.string()),
    ("warc_version", pa.string()),
    ("warc_headers", HEADER_PAIRS),
    ("http_protocol", pa.string()),
    ("http_statusline", pa.string()),
    ("http_headers", HEADER_PAIRS),
    ("content_type", pa.string()),
    ("content_length", pa.int64()),
    ("payload", pa.large_binary()),
    ("payload_digest", pa.string()),
    ("block_digest", pa.string()),
    ("digest_passed", pa.bool_()),
    ("digest_problems", pa.list_(pa.string())),
    ("url", pa.string()),
    ("warc_date", pa.timestamp("us")),
    ("parse_error", pa.string()),
    ("err_count", pa.int64()),
])


def _warc_date_of(record: ParsedRecord):
    value = record.warc_headers.get("WARC-Date")
    if value is None:
        return None
    try:
        return iso_date_to_datetime(value)
    except Exception:
        return None


def records_to_table(records: List[ParsedRecord], filename: str,
                     err_count: int = 0,
                     parse_error: Optional[str] = None) -> pa.Table:
    """Columnarize parsed records (one file's worth) into the T2 schema."""
    cols = {name: [] for name in WARC_RECORDS_SCHEMA.names}
    for r in records:
        http = r.http_headers
        cols["filename"].append(filename)
        cols["offset"].append(r.offset)
        cols["length"].append(r.record_length)
        cols["format"].append(r.format)
        cols["rec_type"].append(r.rec_type)
        cols["warc_version"].append(r.warc_headers.protocol)
        cols["warc_headers"].append(
            [{"name": n, "value": v} for n, v in r.warc_headers.pairs])
        cols["http_protocol"].append(http.protocol if http else None)
        cols["http_statusline"].append(http.statusline if http else None)
        cols["http_headers"].append(
            [{"name": n, "value": v} for n, v in http.pairs]
            if http is not None else None)
        cols["content_type"].append(r.content_type)
        cols["content_length"].append(r.length)
        cols["payload"].append(r.payload)
        cols["payload_digest"].append(sha1_b32(r.payload))
        block_http = (HeaderBlock(protocol=http.protocol,
                                  statusline=http.statusline,
                                  pairs=list(http.pairs)).to_ascii_bytes()
                      if http is not None else b"")
        cols["block_digest"].append(sha1_b32(block_http, r.payload))
        cols["digest_passed"].append(r.digest_passed)
        cols["digest_problems"].append(r.digest_problems)
        cols["url"].append(r.url)
        cols["warc_date"].append(_warc_date_of(r))
        cols["parse_error"].append(parse_error)
        cols["err_count"].append(err_count)
    if not records and parse_error is not None:
        # one sentinel row so file-level failures survive into the table
        for name in WARC_RECORDS_SCHEMA.names:
            cols[name].append(None)
        cols["filename"][-1] = filename
        cols["parse_error"][-1] = parse_error
        cols["err_count"][-1] = 0
    arrays = [pa.array(cols[f.name], type=f.type)
              for f in WARC_RECORDS_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=WARC_RECORDS_SCHEMA)


def parse_archive_file(data: bytes, filename: str,
                       opts: Optional[ParseOptions] = None,
                       fallback_lenient: bool = False) -> pa.Table:
    """One archive file -> T2 table. ``fallback_lenient`` mirrors the
    recompress behavior: on strict failure, bulk-decompress + re-parse."""
    opts = opts or ParseOptions()
    try:
        result = parse_archive_bytes(data, opts)
        return records_to_table(result.records, filename, result.err_count)
    except ArchiveFormatError as e:
        if fallback_lenient:
            import dataclasses
            lenient = dataclasses.replace(opts, lenient=True)
            result = parse_archive_bytes(data, lenient)
            return records_to_table(result.records, filename,
                                    result.err_count)
        return records_to_table([], filename, parse_error=str(e)[:500])


class WARCDatasource:
    """FileBasedDatasource over .warc(.gz)/.arc(.gz) files."""

    def __new__(cls, paths, parse_options: Optional[ParseOptions] = None,
                fallback_lenient: bool = False, **kwargs):
        # subclass lazily so importing this module never needs Ray
        from ray.data.datasource import FileBasedDatasource

        class _Impl(FileBasedDatasource):
            _FILE_EXTENSIONS = ["warc", "warc.gz", "arc", "arc.gz"]

            def __init__(self):
                super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                                 **kwargs)
                self._opts = parse_options or ParseOptions()
                self._fallback = fallback_lenient

            def _open_input_source(self, filesystem, path, **open_args):
                # the default opener auto-decompresses by .gz suffix; WARC
                # gzip members ARE the record framing, so read raw bytes
                open_args.pop("compression", None)
                return filesystem.open_input_stream(path, compression=None,
                                                    **open_args)

            def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
                data = f.readall()
                yield parse_archive_file(data, path, self._opts,
                                         self._fallback)

        return _Impl()


def read_warc(paths, parse_options: Optional[ParseOptions] = None,
              fallback_lenient: bool = False, **read_kwargs):
    """ray.data.read_datasource over WARC/ARC files.

    ``parse_options.check_digests=True`` adds digest verification columns;
    ``no_record_parse=True`` skips http parsing (the indexer's fast path,
    indexer.py:19).
    """
    import ray.data
    source = WARCDatasource(paths, parse_options=parse_options,
                            fallback_lenient=fallback_lenient)
    return ray.data.read_datasource(source, **read_kwargs)
