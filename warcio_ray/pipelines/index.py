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


# ---------------------------------------------------------------------------
# Dataset-level index: projection over the T2 warc_records table
# ---------------------------------------------------------------------------

DEFAULT_FIELDS = ("offset", "warc-type", "warc-target-uri")


def _project_batch(batch, fields):
    """Vectorized-ish projection of index fields from T2 columns.

    offset/length/filename come straight from columns; header fields need
    a per-row scan of the ordered header lists (cheap: few headers each).
    """
    import pyarrow as pa

    n = len(batch)
    out = {}
    warc_headers = batch["warc_headers"].to_pylist()
    http_headers = batch["http_headers"].to_pylist()
    for field in fields:
        if field == "offset":
            out[field] = [str(v) if v is not None else None
                          for v in batch["offset"].to_pylist()]
        elif field == "length":
            out[field] = [str(v) if v is not None else None
                          for v in batch["length"].to_pylist()]
        elif field == "filename":
            out[field] = [os.path.basename(f) if f else None
                          for f in batch["filename"].to_pylist()]
        elif field == "http:status":
            rec_types = batch["rec_type"].to_pylist()
            lines = batch["http_statusline"].to_pylist()
            out[field] = [
                (line.split(" ", 1)[0] if line and rt in ("response", "revisit")
                 else None)
                for rt, line in zip(rec_types, lines)]
        elif field.startswith("http:"):
            want = field[5:].lower()
            vals = []
            for hdrs in http_headers:
                v = None
                if hdrs:
                    for h in hdrs:
                        if h["name"].lower() == want:
                            v = h["value"]
                            break
                vals.append(v)
            out[field] = vals
        else:
            want = field.lower()
            vals = []
            for hdrs in warc_headers:
                v = None
                if hdrs:
                    for h in hdrs:
                        if h["name"].lower() == want:
                            v = h["value"]
                            break
                vals.append(v)
            out[field] = vals
    return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})


def index_dataset(paths, fields=DEFAULT_FIELDS, verify_http: bool = False):
    """Archives -> dataset of index projections (write_json for NDJSON).

    Skips http parsing when no http: field is requested, exactly like the
    reference indexer's fast path (indexer.py:19).
    """
    from warcio_ray.codec.records import ParseOptions
    from warcio_ray.sources.warc import read_warc

    fields = list(fields)
    record_parse = any(f.startswith("http:") for f in fields)
    opts = ParseOptions(no_record_parse=not record_parse,
                        verify_http=verify_http, arc2warc=True)
    # the index never needs the sha1 dedup keys (indexer.py fast path)
    ds = read_warc(paths, parse_options=opts, compute_digests=False)
    return ds.map_batches(_project_batch, batch_format="pyarrow",
                          fn_kwargs={"fields": fields})


# ---------------------------------------------------------------------------
# CDXJ-style sorted capture index
# ---------------------------------------------------------------------------

def cdxj_index(paths, rec_types=("response", "revisit", "resource")):
    """Archives -> globally sorted CDXJ-style capture index: one row per
    capture with ``surt_key`` (SURT-canonicalized URL, the pywb/CDX sort
    key convention) and ``ts14`` (14-digit WARC-Date), sorted by
    (surt_key, ts14, filename, offset).

    The reference indexer (indexer.py:64-81) emits fields in file order;
    the CDX(J) convention the web-archive ecosystem consumes is the
    SAME projection globally sorted — which on Ray Data is a distributed
    range-partitioned sort over ONLY the narrow projection (payloads are
    never read: no_record_parse + compute_digests=False fast path, and
    only 6 scalar columns enter the shuffle).
    """
    import pandas as pd

    from warcio_ray.codec.records import ParseOptions
    from warcio_ray.sources.warc import read_warc

    opts = ParseOptions(no_record_parse=True, arc2warc=True)
    ds = read_warc(paths, parse_options=opts, compute_digests=False)
    keep = set(rec_types)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        from warcio_ray.frontier.surt import surt
        batch = batch[batch["rec_type"].isin(keep) & batch["url"].notna()]
        # records without a WARC-Date sort first under an all-zero ts14
        # (never NaN: a float column would poison the string schema)
        ts = pd.to_datetime(batch["warc_date"]).dt.strftime("%Y%m%d%H%M%S") \
            .fillna("00000000000000")
        return pd.DataFrame({
            "surt_key": [surt(u) for u in batch["url"]],
            "ts14": ts.to_numpy(),
            "url": batch["url"].to_numpy(),
            "rec_type": batch["rec_type"].to_numpy(),
            "filename": [os.path.basename(f) if f else ""
                         for f in batch["filename"]],
            "offset": batch["offset"].to_numpy(),
        })

    proj = ds.map_batches(project, batch_format="pandas")
    return proj.sort(["surt_key", "ts14", "filename", "offset"])
