"""Flagship crawl pipeline glue: pages table -> simulated web -> crawl.

The pages table is the simulated web (sandbox has no network); at test
scale the url->html mapping is broadcast via ray.put into the fetch
stage (SURVEY §7 step 6); the bench-scale alternative is a hash join of
the scheduled urls against the pages dataset.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pandas as pd

from warcio_ray.frontier.distributed import crawl_distributed
from warcio_ray.frontier.rounds import CrawlConfig
from warcio_ray.pages import read_pages, url_for

ORDER_COLUMNS = ["round", "shard", "seq", "url_hash", "url", "host",
                 "priority"]


def load_pages_dict(sf_dir: str) -> Dict[str, bytes]:
    """Driver-side url->html lookup (the broadcast side of the simulated
    fetch). Streams batches; only url+html columns leave storage."""
    ds = read_pages(sf_dir, columns=["url", "html"])
    out: Dict[str, bytes] = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            out[url] = html
    return out


def default_seeds(n: int = 16):
    return [(url_for(i), 1.0) for i in range(n)]


def crawl_pages(sf_dir: str, config: Optional[CrawlConfig] = None,
                n_seeds: int = 16,
                robots_bodies: Optional[Dict[str, str]] = None,
                checkpoint_dir: Optional[str] = None,
                resume: bool = False) -> pd.DataFrame:
    """Run the distributed crawl over the sf pages; returns the crawl
    order as a DataFrame (round, shard, seq, url_hash, url, host,
    priority) — deterministic for a given sf + config."""
    config = config or CrawlConfig(max_rounds=4)
    pages = load_pages_dict(sf_dir)
    result = crawl_distributed(default_seeds(n_seeds), pages, config,
                               robots_bodies=robots_bodies,
                               checkpoint_dir=checkpoint_dir, resume=resume)
    df = pd.DataFrame(result.order, columns=ORDER_COLUMNS)
    df["url_hash"] = df["url_hash"].astype("uint64")
    return df


def fetch_round_via_scan(sf_dir: str, scheduled: pd.DataFrame,
                         config: Optional[CrawlConfig] = None):
    """The bench-scale fetch alternative: instead of broadcasting the
    whole pages dict, semi-join the (small) scheduled-url set against the
    pages dataset — a filter-pushdown scan that streams, never
    materializing pages in one process. Produces the same (hits,
    canonical contribution rows) as FetchActor.fetch for the same
    scheduled rows, so the two fetch modes are interchangeable per round.

    scheduled columns: shard, seq, url_hash, url, host, priority.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from warcio_ray.frontier.rounds import (
        canonicalize_contributions,
        outlink_contributions,
    )
    from warcio_ray.html import extract_links
    from warcio_ray.pages import read_pages

    config = config or CrawlConfig()
    wanted = dict(zip(scheduled["url"],
                      zip(scheduled["shard"], scheduled["seq"],
                          scheduled["priority"])))
    wanted_ref = ray.put(wanted)

    def scan_batch(batch: pa.Table) -> pa.Table:
        lookup = ray.get(wanted_ref)
        urls = batch["url"].to_pylist()
        keep = [i for i, u in enumerate(urls) if u in lookup]
        rows = []
        for i in keep:
            url = urls[i]
            shard, seq, priority = lookup[url]
            links = extract_links(batch["html"][i].as_py())
            canon = canonicalize_contributions(outlink_contributions(
                int(shard), int(seq), float(priority), links, config))
            for c in canon:
                rows.append((url,) + c)
        return pa.table({
            "src_url": pa.array([r[0] for r in rows], pa.string()),
            "url_hash": pa.array([r[1] for r in rows], pa.uint64()),
            "url": pa.array([r[2] for r in rows], pa.string()),
            "surt": pa.array([r[3] for r in rows], pa.string()),
            "host": pa.array([r[4] for r in rows], pa.string()),
            "src_shard": pa.array([r[5] for r in rows], pa.int64()),
            "src_seq": pa.array([r[6] for r in rows], pa.int64()),
            "cash": pa.array([r[7] for r in rows], pa.float64()),
        })

    ds = read_pages(sf_dir, columns=["url", "html"])
    out = ds.map_batches(scan_batch, batch_format="pyarrow").to_pandas()
    hits = out["src_url"].nunique() if len(out) else 0
    canon_rows = [tuple(r) for r in out[
        ["url_hash", "url", "surt", "host", "src_shard", "src_seq",
         "cash"]].itertuples(index=False, name=None)]
    return hits, canon_rows
