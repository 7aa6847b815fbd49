"""WAT export: WARC ``response`` records -> ``metadata`` records whose
payload is a deterministic JSON envelope (url, source record id/date,
payload digest, outlinks with anchor texts) — the Common Crawl WAT
layout, completing the WARC/WET/WAT artifact triple.

Reference parity: warcio users build WAT with
``create_warc_record('metadata')`` + a JSON payload
(/root/reference/warcio/recordbuilder.py:33-60); this is that workflow
as one fused Ray stage, same shape as pipelines/wet.py: parse chunk ->
extract links/anchors -> build metadata records -> write one
deterministic atomic-rename shard; only (path, n) rows leave the task.

JSON is canonical (sorted keys, no whitespace) so WAT payloads are
byte-deterministic and diffable across runs/engines.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["wat_export"]


def _wat_batch_writer(out_dir: str, gzip: bool):
    def to_wat(batch: pa.Table) -> pa.Table:
        import hashlib
        import json

        from warcio_ray.codec.build import build_record, serialize_record
        from warcio_ray.html import extract_anchors

        keep = pc.and_kleene(
            pc.equal(batch["rec_type"], "response"),
            pc.is_null(batch["parse_error"]))
        batch = batch.filter(pc.fill_null(keep, False))
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        urls = batch["url"].to_pylist()
        payloads = batch["payload"].to_pylist()
        digests = batch["payload_digest"].to_pylist()
        headers = batch["warc_headers"].to_pylist()
        blobs = []
        for url, payload, digest, pairs in zip(urls, payloads, digests,
                                               headers):
            hmap = {p["name"]: p["value"] for p in (pairs or [])}
            anchors = extract_anchors(payload or b"")
            envelope = {
                "anchor_texts": [a for _, a in anchors],
                "links": [h for h, _ in anchors],
                "payload_digest": digest or "",
                "record_id": hmap.get("WARC-Record-ID", ""),
                "url": url,
            }
            body = json.dumps(envelope, sort_keys=True,
                              separators=(",", ":")).encode("utf-8")
            wid = "<urn:uuid:" + hashlib.md5(
                (url + "#wat").encode("utf-8")).hexdigest() + ">"
            extra = {}
            if envelope["record_id"]:
                extra["WARC-Refers-To"] = envelope["record_id"]
            date = hmap.get("WARC-Date", "")
            # a source record without WARC-Date must NOT propagate an
            # empty date (invalid per WARC/1.0 §5.4) — fall back to the
            # builder's default timestamp, like the reference's
            # recordbuilder (/root/reference/warcio/recordbuilder.py)
            dkw = {"date_fn": lambda micros, d=date: d} if date else {}
            rec = build_record(url, "metadata", payload=body,
                               warc_headers_dict=extra,
                               warc_content_type="application/json",
                               id_fn=lambda w=wid: w, **dkw)
            blobs.append(serialize_record(rec, gzip=gzip))
        name = hashlib.md5("".join(urls).encode("utf-8")).hexdigest()[:12]
        ext = ".warc.gz" if gzip else ".warc"
        path = os.path.join(out_dir, f"wat-{name}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(blobs))
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n": pa.array([len(blobs)], pa.int64())})

    return to_wat


def wat_export(warc_paths: List[str], out_dir: str,
               gzip: bool = True,
               parse_options: Optional["object"] = None) -> List[str]:
    """Parse WARC shards, emit WAT-style metadata-record shards under
    ``out_dir``; returns the written paths (sorted)."""
    from warcio_ray.sources.warc import read_warc

    os.makedirs(out_dir, exist_ok=True)
    ds = read_warc(warc_paths, parse_options=parse_options,
                   compute_digests=True)
    out = ds.map_batches(_wat_batch_writer(out_dir, gzip),
                         batch_format="pyarrow",
                         batch_size=None).to_pandas()
    return sorted(out["path"].tolist())
