"""Recompress pipeline: read (strict, falling back to lenient
bulk-decompress on broken compression) -> rebuild -> per-record-gzip
shards. The reference's ``warcio recompress`` (recompressor.py:15-81) and
the canonical read -> map_batches -> write slice.

File-level semantics are preserved: each input archive maps to one
output shard whose records are re-serialized with recomputed lengths
and digests, every record its own gzip member.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa

from warcio_ray.codec.records import ParseOptions
from warcio_ray.sinks.warc import write_warc
from warcio_ray.sources.warc import read_warc


def recompress_dataset(paths, arc2warc: bool = True,
                       parse_options: Optional[ParseOptions] = None):
    """Parsed records from archives, tolerating broken compression."""
    opts = parse_options or ParseOptions(arc2warc=arc2warc)
    # digest columns are recomputed by the serializer anyway
    return read_warc(paths, parse_options=opts, fallback_lenient=True,
                     compute_digests=False)


def recompress(paths, out_dir: str, arc2warc: bool = True,
               gzip: bool = True) -> dict:
    """Recompress archives into per-record-gzip shards under out_dir.

    Returns counts; output shards are deterministically named so a rerun
    overwrites rather than duplicates.
    """
    import pyarrow.compute as pc

    ds = recompress_dataset(paths, arc2warc=arc2warc)
    # drop file-level sentinel rows (unreadable files) before writing
    ok = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["rec_type"])),
        batch_format="pyarrow")
    write_warc(ok, out_dir, gzip=gzip)
    n = ok.count()
    return {"records": n, "out_dir": out_dir}
