"""Crawl-discovery composition: raw outlinks -> prioritized unseen
frontier candidates. This is the stage between "parsed a page" and
"scheduled a fetch" in a continuous crawl, composed end to end from
operators already proven alone:

    link extraction        (stages/text.extract_links_stage)
      -> URL canonicalization  (ops/urlfilter.canonicalize_url_series:
         tracking params / fragments / case / default ports collapse)
      -> variant collapse + inlink count (ONE canon-key aggregate —
         a link's vote survives canonicalization, so n_inlinks counts
         raw link rows per canonical target)
      -> seen-set anti-join    (hash anti join against the already-
         crawled URL set — O(candidates) rows, never a driver set)
      -> domain blocklist gate (ops/urlfilter.mark_blocked: broadcast
         frozenset, O(host labels) probes per distinct host)

Output: (url, n_inlinks) per unseen, unblocked canonical URL — the
fetch-priority input a frontier scheduler consumes (inlink count is
the classic discovery-priority signal; OPIC refines it online).

Scale shape: links never leave their extraction task un-aggregated
(per-batch canon fold first), ONE hash aggregate on the canon key,
one anti join keyed on the same column, one stateless blocklist scan.
No driver-side URL set at any point.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["discover_candidates"]


def discover_candidates(pages, seen_urls, blocklist=(),
                        num_partitions=None, links=None):
    """pages Dataset (url, html) + seen_urls Dataset (url) ->
    (url, n_inlinks) Dataset of canonical, unseen, unblocked outlink
    targets. ``seen_urls`` must carry CANONICAL urls (a crawler's seen
    set is keyed canonically by construction). Pass ``links`` (a
    (src_url, dst_url) Dataset) to skip the extraction stage — the
    hook for callers that filter or augment the raw link stream."""
    import ray

    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join
    from warcio_ray.ops.urlfilter import canonicalize_url_series, \
        mark_blocked
    from warcio_ray.stages.text import extract_links_stage

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    if links is None:
        links = pages.map_batches(extract_links_stage,
                                  batch_format="pyarrow")

    def canon_fold(batch: pd.DataFrame) -> pd.DataFrame:
        canon = canonicalize_url_series(batch["dst_url"])
        out = canon.groupby(canon.values).size().reset_index()
        out.columns = ["url", "n_inlinks"]
        return out.astype({"n_inlinks": "int64"})

    counts = arrow_blocks(
        links.map_batches(canon_fold, batch_format="pandas")) \
        .groupby("url").aggregate(Sum("n_inlinks",
                                      alias_name="n_inlinks"))

    unseen = safe_join(counts, seen_urls.select_columns(["url"]),
                       "left_anti", num_partitions, ("url",))

    if not blocklist:
        return unseen

    def drop_blocked(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["blocked"] == 0
        return batch.loc[keep, ["url", "n_inlinks"]].astype(
            {"n_inlinks": "int64"})

    return mark_blocked(unseen, blocklist).map_batches(
        drop_blocked, batch_format="pandas")
