"""Stateless map_batches stages over the pages table.

All stages are Arrow-in/Arrow-out (``batch_format="pyarrow"``,
zero-copy from the object store) with vectorized kernels; none iterate
Python rows except link extraction, which is inherently per-document
regex findall (kept cheap with a module-compiled pattern).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from warcio_ray.html import extract_links, extract_text_array


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """html -> text_extracted (the distributed half of the byte-identity
    contract; compare against the golden ``text`` column)."""
    return batch.append_column("text_extracted",
                               extract_text_array(batch["html"]))


def verify_text_stage(batch: pa.Table) -> pa.Table:
    """Per-batch equality of extracted vs golden text -> tiny partial-agg
    rows (match_count, mismatch_count); a downstream sum gives the global
    verdict without shuffling document payloads."""
    extracted = extract_text_array(batch["html"])
    eq = pc.equal(extracted, pc.cast(batch["text"], pa.large_string()))
    matches = pc.sum(pc.cast(eq, pa.int64())).as_py() or 0
    total = len(batch)
    return pa.table({"match_count": pa.array([matches], pa.int64()),
                     "mismatch_count": pa.array([total - matches], pa.int64())})


def extract_links_stage(batch: pa.Table) -> pa.Table:
    """pages -> (src_url, dst_url) edge rows (frontier discovery)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src: List[str] = []
    dst: List[str] = []
    for u, h in zip(urls, htmls):
        for link in extract_links(h):
            src.append(u)
            dst.append(link)
    return pa.table({"src_url": pa.array(src, pa.string()),
                     "dst_url": pa.array(dst, pa.string())})


def host_of_url_array(urls: pa.Array) -> pa.Array:
    """Vectorized host extraction from url strings."""
    s = pc.cast(urls, pa.large_string())
    ex = pc.extract_regex(s, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]*)")
    host = pc.struct_field(ex, "host")
    # strip userinfo / port
    host = pc.replace_substring_regex(host, r"^[^@]*@", "")
    host = pc.replace_substring_regex(host, r":\d+$", "")
    return pc.utf8_lower(host)


def add_host_stage(batch: pa.Table) -> pa.Table:
    return batch.append_column("host", host_of_url_array(batch["url"]))
