"""WET export: WARC ``response`` records -> ``conversion`` records
carrying the extracted plain text — the Common Crawl WET layout,
produced distributed and re-parseable by this repo's own datasource.

Reference parity: warcio users generate WET files with
``create_warc_record('conversion')`` + ``WARCWriter``
(/root/reference/warcio/recordbuilder.py:33-60,
/root/reference/warcio/warcwriter.py); this pipeline is that workflow
as ONE fused Ray stage: each read task parses its WARC chunk, extracts
text with the vectorized pyarrow kernel (html.py — RE2 over the whole
column, zero Python per row), rebuilds conversion records with the
byte-identical codec (WARC-Refers-To the source record id, WARC-Date
copied verbatim from the source header, text/plain payload, digests
recomputed by serialize_record), and writes one deterministic
``.warc.gz`` shard — only a (path, n) row leaves the task, so corpus
bytes never shuffle and never reach the driver.

Resumable output: shard names derive from the contained urls (md5) and
files land via tmp + atomic rename, so a re-run overwrites
deterministically instead of duplicating.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["wet_export"]


def _wet_batch_writer(out_dir: str, gzip: bool):
    def to_wet(batch: pa.Table) -> pa.Table:
        import hashlib

        from warcio_ray.codec.build import build_record, serialize_record
        from warcio_ray.html import extract_text_array

        keep = pc.and_kleene(
            pc.equal(batch["rec_type"], "response"),
            pc.is_null(batch["parse_error"]))
        batch = batch.filter(pc.fill_null(keep, False))
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        texts = extract_text_array(batch["payload"].combine_chunks())
        urls = batch["url"].to_pylist()
        headers = batch["warc_headers"].to_pylist()
        blobs = []
        for url, text, pairs in zip(urls, texts.to_pylist(), headers):
            hmap = {p["name"]: p["value"] for p in (pairs or [])}
            wid = "<urn:uuid:" + hashlib.md5(
                (url + "#wet").encode("utf-8")).hexdigest() + ">"
            extra = {}
            rid = hmap.get("WARC-Record-ID")
            if rid:
                extra["WARC-Refers-To"] = rid
            # copy the source WARC-Date verbatim — byte parity, no
            # timestamp round trip
            date = hmap.get("WARC-Date", "")
            # dateless source records fall back to the builder's
            # default timestamp — an empty WARC-Date is invalid
            dkw = {"date_fn": lambda micros, d=date: d} if date else {}
            rec = build_record(url, "conversion",
                               payload=(text or "").encode("utf-8"),
                               warc_headers_dict=extra,
                               warc_content_type="text/plain",
                               id_fn=lambda w=wid: w, **dkw)
            blobs.append(serialize_record(rec, gzip=gzip))
        name = hashlib.md5(
            "".join(urls).encode("utf-8")).hexdigest()[:12]
        ext = ".warc.gz" if gzip else ".warc"
        path = os.path.join(out_dir, f"wet-{name}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(blobs))
        os.replace(tmp, path)  # atomic: reruns overwrite, never dup
        return pa.table({"path": pa.array([path], pa.string()),
                         "n": pa.array([len(blobs)], pa.int64())})

    return to_wet


def wet_export(warc_paths: List[str], out_dir: str,
               gzip: bool = True,
               parse_options: Optional["object"] = None) -> List[str]:
    """Parse WARC shards, emit WET-style conversion-record shards under
    ``out_dir``; returns the written paths (sorted). One fused
    read->extract->build->write task per input chunk."""
    from warcio_ray.sources.warc import read_warc

    os.makedirs(out_dir, exist_ok=True)
    ds = read_warc(warc_paths, parse_options=parse_options,
                   compute_digests=False)
    out = ds.map_batches(_wet_batch_writer(out_dir, gzip),
                         batch_format="pyarrow",
                         batch_size=None).to_pandas()
    return sorted(out["path"].tolist())
