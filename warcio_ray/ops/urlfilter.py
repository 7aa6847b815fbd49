"""Domain-blocklist URL filtering — the UT1 / RefinedWeb / FineWeb
"adult & spam domain list" curation stage. No warcio counterpart
(warcio has no curation layer); LLM-pipeline operator per the build
brief. Host parsing reuses ``frontier.surt.host_of`` (the same parse
the crawl frontier canonicalizes with, so filter and frontier agree on
what a host is).

Match semantics (UT1 convention): a URL is blocked when its host
EQUALS a listed domain or is a SUBDOMAIN of one (``host`` ends with
``'.' + domain``). Expressed in SQL as
``host = d OR host LIKE '%.' || d``.

Shape at scale: the blocklist is the classic small side — it ships
ONCE via ``ray.put`` (a frozenset of domain strings) and every worker
resolves hosts against it locally; no shuffle, one stateless scan.
Per batch the suffix walk runs once per DISTINCT host (dozens), not
per row, and each host probes at most ``len(host.split('.'))`` set
lookups — O(labels), independent of blocklist size, so a 5M-domain
UT1 list costs the same per row as a 5-domain test list.
"""
from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd

from warcio_ray.frontier.surt import host_of


def host_suffix_blocked(host: Optional[str], blocked: frozenset) -> bool:
    """True when ``host`` or any of its registrable suffixes is in
    ``blocked``. None / unparseable hosts are conservatively blocked
    (a URL without a host is not trainable provenance anyway)."""
    if not host:
        return True
    labels = host.split(".")
    for i in range(len(labels)):
        if ".".join(labels[i:]) in blocked:
            return True
    return False


def mark_blocked(ds, blocklist: Iterable[str], url_col: str = "url",
                 out_col: str = "blocked"):
    """Dataset -> Dataset + ``out_col`` (int64 0/1) + ``host``
    (string). The blocklist broadcasts once; the scan is stateless."""
    import ray

    block_ref = ray.put(frozenset(
        d.strip().lower().rstrip(".") for d in blocklist if d.strip()))

    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        blocked = ray.get(block_ref)
        hosts = batch[url_col].map(lambda u: host_of(u) or "")
        # one suffix walk per DISTINCT host in the batch
        verdict = {h: host_suffix_blocked(h or None, blocked)
                   for h in pd.unique(hosts)}
        out = batch.copy()
        out["host"] = hosts
        out[out_col] = np.fromiter(
            (verdict[h] for h in hosts), dtype=np.int64,
            count=len(hosts))
        return out

    return ds.map_batches(mark, batch_format="pandas")


def blocklist_filter(ds, blocklist: Iterable[str], url_col: str = "url",
                     invert: bool = False):
    """Keep rows whose host is NOT blocklisted (``invert=True`` keeps
    only the blocked rows — the audit view)."""
    marked = mark_blocked(ds, blocklist, url_col=url_col)
    want = 1 if invert else 0
    return marked.filter(expr=f"blocked == {want}") \
        .drop_columns(["blocked"])


# ---------------------------------------------------------------------------
# crawl-trap URL signals
# ---------------------------------------------------------------------------

def _path_of(url) -> str:
    """Path component of a URL ('' when absent / unparseable)."""
    if not isinstance(url, str):
        return ""
    i = url.find("://")
    rest = url[i + 3:] if i >= 0 else url
    j = rest.find("/")
    return rest[j:] if j >= 0 else ""


def url_trap_signals(ds, url_col: str = "url", max_depth: int = 6,
                     min_repeat: int = 2):
    """Crawl-trap heuristics — the frontier QA signal that keeps a
    crawler out of calendar pages, session-id mazes and symlink loops
    (cf. Heritrix's path-depth and path-repetition TooManyHopsDecide
    rules; the reference has no frontier, so this is a build-brief
    operator). Flags a URL when its path is deeper than ``max_depth``
    segments or repeats a segment ``min_repeat``+ times beyond its
    first occurrence (``n_repeat = #segments - #distinct``, so
    '/x/x/x/p' scores 2).

    Adds (depth, n_repeat, is_trap int64) columns. Stateless scan, no
    shuffle; the per-row segment-set work is bounded by path length.
    """

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        segs = [[s for s in _path_of(u).split("/") if s]
                for u in batch[url_col]]
        n = len(segs)
        depth = np.fromiter((len(s) for s in segs), np.int64, n)
        nrep = np.fromiter((len(s) - len(set(s)) for s in segs),
                           np.int64, n)
        out = batch.copy()
        out["depth"] = depth
        out["n_repeat"] = nrep
        out["is_trap"] = ((depth > max_depth)
                          | (nrep >= min_repeat)).astype("int64")
        return out

    return ds.map_batches(kernel, batch_format="pandas")
