"""Ray Data datasink writing per-shard .warc(.gz) files.

Each write task serializes its blocks with the codec and appends one
gzip member per record (warcwriter.py:41-127 contract) into a
deterministically-named shard file: ``part-{task_index:06d}.warc.gz``.
Deterministic naming + a per-shard atomic rename make reruns resumable:
a finished shard is skipped, a half-written one is overwritten.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import pyarrow as pa

from warcio_ray.codec.build import serialize_record
from warcio_ray.codec.headers import HeaderBlock
from warcio_ray.codec.records import ParsedRecord


def row_to_record(row: dict) -> ParsedRecord:
    """Rebuild a codec record from one T2-schema row (lossless for
    re-serialization: ordered headers + raw payload survive)."""
    warc_headers = HeaderBlock(
        protocol=row.get("warc_version") or "WARC/1.0",
        pairs=[(h["name"], h["value"]) for h in row["warc_headers"] or []])
    http_headers = None
    if row.get("http_headers") is not None:
        http_headers = HeaderBlock(
            protocol=row.get("http_protocol") or "",
            statusline=row.get("http_statusline") or "",
            pairs=[(h["name"], h["value"]) for h in row["http_headers"]])
    payload = row.get("payload") or b""
    return ParsedRecord(
        format=row.get("format") or "warc",
        rec_type=row.get("rec_type") or "",
        warc_headers=warc_headers,
        http_headers=http_headers,
        content_type=row.get("content_type"),
        length=row.get("content_length"),
        payload=payload,
        payload_length=len(payload),
        offset=row.get("offset") or 0,
        record_length=row.get("length") or 0,
        url=row.get("url"))


def serialize_table(batch: pa.Table, gzip: bool = True,
                    header_filter=None) -> bytes:
    return b"".join(serialize_record(row_to_record(row), gzip=gzip,
                                     header_filter=header_filter)
                    for row in batch.to_pylist())


def pair_request_response(request: "ParsedRecord",
                          response: "ParsedRecord") -> None:
    """Link a request to its response the way the reference writer does
    (warcwriter.py:22-33): copy WARC-Target-URI/WARC-Date from the
    response, add WARC-Concurrent-To with the response's record id.
    Write response first, then request."""
    url = response.warc_headers.get("WARC-Target-URI")
    date = response.warc_headers.get("WARC-Date")
    if url is not None:
        request.warc_headers.replace("WARC-Target-URI", url)
    if date is not None:
        request.warc_headers.replace("WARC-Date", date)
    resp_id = response.warc_headers.get("WARC-Record-ID")
    if resp_id:
        request.warc_headers.add("WARC-Concurrent-To", resp_id)


class WARCDatasink:
    """Datasink: T2-schema dataset -> directory of .warc.gz shards."""

    def __new__(cls, path: str, gzip: bool = True):
        from ray.data import Datasink
        from ray.data.block import BlockAccessor

        class _Impl(Datasink):
            def __init__(self):
                self._path = path
                self._gzip = gzip

            def on_write_start(self):
                os.makedirs(self._path, exist_ok=True)

            @property
            def supports_distributed_writes(self) -> bool:
                return True

            def write(self, blocks: Iterable, ctx) -> None:
                suffix = "warc.gz" if self._gzip else "warc"
                final = os.path.join(
                    self._path, f"part-{ctx.task_idx:06d}.{suffix}")
                tmp = final + ".tmp"
                wrote = False
                with open(tmp, "wb") as out:
                    for block in blocks:
                        table = BlockAccessor.for_block(block).to_arrow()
                        if len(table):
                            out.write(serialize_table(table, gzip=self._gzip))
                            wrote = True
                if wrote:
                    os.replace(tmp, final)  # atomic shard completion
                else:
                    os.remove(tmp)

        return _Impl()


def write_warc(ds, path: str, gzip: bool = True,
               concurrency: Optional[int] = None) -> None:
    """Write a T2-schema dataset as a directory of WARC shards."""
    ds.write_datasink(WARCDatasink(path, gzip=gzip), concurrency=concurrency)
