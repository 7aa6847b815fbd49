"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

BASELINE.json's input_hint fixes the input shape:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. No external data exists in the sandbox, so pages are
derived deterministically from the driver's ``documents`` table
(doc_id, text, lang, ...) — same seed data the DuckDB oracle sees, which
keeps url/host/timestamp derivations SQL-mirrorable.

Derivations (mirrored EXACTLY in oracle SQL — keep in sync with
__ray_entry__.oracle_sql):
  bucket  = doc_id % 100
  host_id = 0 if bucket<30 else 1 if bucket<45 else 2 if bucket<55
            else 3 if bucket<62 else bucket          # zipf-ish host skew
  url     = 'http://site{host_id}.example/doc/{doc_id}'
  warc_ts = 2024-01-01T00:00:00 + doc_id seconds
  html    = render_page(text, url, lang, doc_id, links)
  text    = extract_text(html)        # the self-hosted golden contract
  links   = (doc_id*31 + 7*(j+1)) % n_docs for j in range(doc_id % 4)

The synthesized ``text`` column is produced by the *single-process*
extractor at build time; every distributed pipeline must reproduce it
byte-identically (the per-row invariant).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from warcio_ray.html import extract_text_array, render_page

PAGES_CACHE_ROOT = "/tmp/warcio_ray/pages"
BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")


def host_id_for(doc_id: int) -> int:
    b = doc_id % 100
    if b < 30:
        return 0
    if b < 45:
        return 1
    if b < 55:
        return 2
    if b < 62:
        return 3
    return b


def url_for(doc_id: int) -> str:
    return f"http://site{host_id_for(doc_id)}.example/doc/{doc_id}"


def links_for(doc_id: int, n_docs: int) -> List[str]:
    return [url_for((doc_id * 31 + 7 * (j + 1)) % n_docs)
            for j in range(doc_id % 4)]


def render_pages_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """Stateless map_batches stage: documents batch -> pages batch
    (synthesis-only; stateless tasks so small test sessions aren't starved
    by an actor pool reserving every CPU)."""
    doc_ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    urls = [url_for(int(d)) for d in doc_ids]
    htmls = [render_page(t, u, lg, int(d), links_for(int(d), n_docs))
             for t, u, lg, d in zip(texts, urls, langs, doc_ids)]
    html_arr = pa.array(htmls, type=pa.large_binary())
    ts = BASE_TS + doc_ids.astype("timedelta64[s]").astype("timedelta64[us]")
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
        "html": html_arr,
        "text": extract_text_array(html_arr),
        "lang": pa.array(langs, type=pa.string()),
    })


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def n_documents(sf_dir: str) -> int:
    return pq.read_metadata(documents_path(sf_dir)).num_rows


def pages_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(PAGES_CACHE_ROOT, tag)


def build_pages(sf_dir: str, force: bool = False) -> str:
    """Synthesize (and cache) the pages table for one scale factor.

    Runs as a streaming Ray pipeline: read documents -> render batch ->
    write partitioned parquet. Returns the output directory.
    """
    import ray.data

    import shutil

    out = pages_dir(sf_dir)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker) and not force:
        return out
    shutil.rmtree(out, ignore_errors=True)  # stale/partial output
    n_docs = n_documents(sf_dir)
    ds = ray.data.read_parquet(documents_path(sf_dir),
                               columns=["doc_id", "text", "lang"])
    os.makedirs(out, exist_ok=True)
    ds.map_batches(render_pages_batch, batch_format="pyarrow",
                   batch_size=1024, fn_kwargs={"n_docs": n_docs}) \
      .write_parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def read_pages(sf_dir: str, columns=None, **read_kwargs):
    """Dataset over the (cached) pages table, with column pruning.
    Extra kwargs (e.g. override_num_blocks) pass through to
    read_parquet."""
    import ray.data
    return ray.data.read_parquet(build_pages(sf_dir), columns=columns,
                                 file_extensions=["parquet"],
                                 **read_kwargs)


# ---------------------------------------------------------------------------
# url-hash-bucketed layout: the scan-fetch path reads only the buckets
# containing a round's scheduled urls instead of rescanning the corpus
# ---------------------------------------------------------------------------

NUM_PAGE_BUCKETS = 64


def page_bucket_of(url: str, num_buckets: int = NUM_PAGE_BUCKETS) -> int:
    from warcio_ray.frontier.surt import url_hash64
    return url_hash64(url) % num_buckets


def pages_bucketed_dir(sf_dir: str) -> str:
    return pages_dir(sf_dir) + "-bucketed"


def bucketed_layout_num_buckets(root: str,
                                default: int = NUM_PAGE_BUCKETS) -> int:
    """Read the bucket count a layout was BUILT with (recorded in its
    _DONE marker) — assuming the default when the layout used another
    count would hash urls into buckets that don't exist and silently
    turn every fetch into a miss."""
    try:
        with open(os.path.join(root, "_DONE")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return default


def build_pages_bucketed(sf_dir: str, force: bool = False,
                         num_buckets: int = NUM_PAGE_BUCKETS) -> str:
    """pages table -> hive-partitioned layout bucket=K/ keyed by
    url_hash64(url) % num_buckets. One distributed pass, cached per sf.
    At 100 TB this is the layout the crawl's per-round semi-join fetch
    depends on: a round touches only the buckets its urls hash into."""
    import shutil

    import ray.data

    from warcio_ray.frontier.surt import url_hash64

    out = pages_bucketed_dir(sf_dir)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker) and not force:
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [url_hash64(u) % num_buckets
                   for u in batch["url"].to_pylist()]
        return batch.append_column("bucket",
                                   pa.array(buckets, pa.int32()))

    ds = ray.data.read_parquet(build_pages(sf_dir),
                               file_extensions=["parquet"])
    ds.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(out, partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write(str(num_buckets))
    return out
