"""Index pipeline: archive files -> NDJSON-style field projection.

Field semantics match the reference Indexer (indexer.py:64-81):
``offset``/``length`` are the record's byte provenance, ``http:status``
only for response/revisit records with http headers, ``http:<hdr>`` pulls
an HTTP header, anything else pulls a WARC header.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

from warcio_ray.codec.records import ParsedRecord


def index_record(record: ParsedRecord, fields: Iterable[str],
                 filename: str = "") -> Dict[str, str]:
    entry: Dict[str, str] = {}
    for field in fields:
        value: Optional[str] = None
        if field == "offset":
            value = str(record.offset)
        elif field == "length":
            value = str(record.record_length)
        elif field == "filename":
            value = os.path.basename(filename)
        elif field == "http:status":
            if record.rec_type in ("response", "revisit") and record.http_headers:
                value = record.http_headers.statuscode()
        elif field.startswith("http:"):
            if record.http_headers:
                value = record.http_headers.get(field[5:])
        else:
            value = record.warc_headers.get(field)
        if value is not None:
            entry[field] = value
    return entry


def index_records(records: Iterable[ParsedRecord], fields: Iterable[str],
                  filename: str = "") -> List[Dict[str, str]]:
    fields = list(fields)
    return [index_record(r, fields, filename) for r in records]
