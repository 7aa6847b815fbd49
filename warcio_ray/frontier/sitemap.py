"""Sitemap ingestion — the seed-discovery source a crawler polls
alongside robots.txt (sitemaps.org protocol: <urlset> leaf files and
<sitemapindex> files pointing at more sitemaps). The reference has no
frontier; build-brief crawl operator.

Parsing is stdlib ElementTree with namespace-wildcard matching (every
real-world sitemap namespace variant — 0.9, no-namespace, Google
extensions — resolves through ``{*}``), so no third-party XML dep.
Malformed XML degrades to a single ``kind='invalid'`` row instead of
killing the task (same leniency posture as the WARC parser's error
rows).

Shape at scale: a stateless ``map_batches`` explode — each sitemap
body parses once, emits O(entries) narrow rows, and the body itself
never leaves the task. Sitemapindex recursion is the CALLER's loop
(fetch the returned locs, feed them back), which keeps each Ray stage
acyclic.
"""
from __future__ import annotations

from typing import List, Tuple

import pandas as pd


def parse_sitemap(body) -> Tuple[str, List[Tuple[str, str]]]:
    """XML text -> (kind, [(loc, lastmod)]). kind is 'urlset',
    'sitemapindex' or 'invalid'; lastmod is '' when absent. Entries
    without a <loc> are skipped (spec: loc is required)."""
    import xml.etree.ElementTree as ET

    if not isinstance(body, str) or not body.strip():
        return "invalid", []
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return "invalid", []
    tag = root.tag.rsplit("}", 1)[-1].lower()
    if tag == "urlset":
        child = "url"
    elif tag == "sitemapindex":
        child = "sitemap"
    else:
        return "invalid", []
    out: List[Tuple[str, str]] = []
    for el in root.iter():
        if el.tag.rsplit("}", 1)[-1].lower() != child:
            continue
        loc, lastmod = None, ""
        for sub in el:
            name = sub.tag.rsplit("}", 1)[-1].lower()
            if name == "loc":
                loc = (sub.text or "").strip()
            elif name == "lastmod":
                lastmod = (sub.text or "").strip()
        if loc:
            out.append((loc, lastmod))
    return tag, out


def sitemap_entries(ds, xml_col: str = "xml",
                    id_cols: Tuple[str, ...] = ("doc_id",)):
    """(ids..., xml) Dataset -> (ids..., kind, loc, lastmod) Dataset,
    one row per sitemap entry; invalid bodies emit one row with
    kind='invalid' and empty loc so failures stay observable."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {c: [] for c in id_cols}
        kinds, locs, mods = [], [], []
        for _, rec in batch.iterrows():
            kind, entries = parse_sitemap(rec[xml_col])
            if not entries:
                entries = [("", "")]
            for loc, mod in entries:
                for c in id_cols:
                    rows[c].append(rec[c])
                kinds.append(kind)
                locs.append(loc)
                mods.append(mod)
        out = pd.DataFrame(rows)
        out["kind"] = pd.Series(kinds, dtype="object")
        out["loc"] = pd.Series(locs, dtype="object")
        out["lastmod"] = pd.Series(mods, dtype="object")
        return out

    return ds.map_batches(explode, batch_format="pandas")
