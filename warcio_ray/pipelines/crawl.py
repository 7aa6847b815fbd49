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
