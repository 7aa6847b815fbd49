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


# ---------------------------------------------------------------------------
# query-parameter mining (session-id / trap parameter detection)
# ---------------------------------------------------------------------------

def mine_url_params(ds, url_col: str = "url", host_col: str = "host",
                    min_occurrences: int = 5):
    """Per-(host, param-key) query-string statistics, flagging
    high-cardinality keys (session ids, cache busters, per-visit
    tokens) that multiply a crawl frontier without adding content —
    the canonicalization-rule miner behind tools like Heritrix's
    session-id strip lists (the reference has no frontier; build-brief
    operator, SURV §2.6 URL-seen canonicalization support).

    For each (host, key): ``n_occurrences`` (URLs carrying the key),
    ``n_distinct_values``, and ``is_trap_key`` = 1 when the key
    appears >= ``min_occurrences`` times AND at least half its
    occurrences carry a distinct value (2*n_distinct >= n_occ) —
    exact integer rule, no float thresholds.

    Scale shape: stateless explode of (host, key, value) triples, one
    distributed groupby to collapse distinct values, a second to fold
    per-key counts. Keys-space is bounded by real-world param
    vocabularies; values never leave their first groupby.
    """
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        hosts, keys, vals = [], [], []
        for host, url in zip(batch[host_col], batch[url_col]):
            if not isinstance(url, str):
                continue
            q = url.find("?")
            if q < 0:
                continue
            qs = url[q + 1:]
            f = qs.find("#")
            if f >= 0:
                qs = qs[:f]
            for part in qs.split("&"):
                if not part:
                    continue
                eq = part.find("=")
                k, v = (part, "") if eq < 0 else (part[:eq],
                                                  part[eq + 1:])
                hosts.append(host)
                keys.append(k)
                vals.append(v)
        return pd.DataFrame({"host": pd.Series(hosts, dtype="object"),
                             "key": pd.Series(keys, dtype="object"),
                             "value": pd.Series(vals, dtype="object")})

    triples = ds.map_batches(explode, batch_format="pandas")
    distinct = arrow_blocks(triples).groupby(
        ["host", "key", "value"]).aggregate(Count(alias_name="n_occ"))
    per_key = arrow_blocks(distinct).groupby(["host", "key"]).aggregate(
        Sum("n_occ", alias_name="n_occurrences"),
        Count(alias_name="n_distinct_values"))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        occ = batch["n_occurrences"].to_numpy(dtype="int64")
        dis = batch["n_distinct_values"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "host": batch["host"],
            "key": batch["key"],
            "n_occurrences": occ,
            "n_distinct_values": dis,
            "is_trap_key": ((occ >= int(min_occurrences))
                            & (2 * dis >= occ)).astype("int64")})

    return per_key.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# redirect-chain resolution
# ---------------------------------------------------------------------------

def resolve_redirects(ds, redirects, url_col: str = "url",
                      max_hops: int = 5,
                      broadcast_max: int = 5_000_000,
                      num_partitions=None):
    """Resolve each URL through a (src -> dst) redirect map — the 3xx
    canonicalization a crawl postprocess applies before dedup/graph
    building (pywb and wget chase Location: headers the same way; the
    reference parses the records but has no resolution layer).

    Adds three columns: ``final_url`` (the URL after following up to
    ``max_hops`` redirects), ``n_hops`` (hops actually taken), and
    ``looped`` (int64 1 when the final URL STILL has an outgoing
    redirect — a cycle or an over-long chain; bounded hops make cycles
    terminate by construction).

    ``redirects``: Dataset or DataFrame with (src, dst) string
    columns. Two output-identical paths (tested): a map with <=
    ``broadcast_max`` entries ships ONCE via ray.put and resolution is
    one stateless scan (max_hops dict probes per row); a larger map
    takes the iterative-join path — each hop one narrow left-outer
    hash join over only the STILL-ACTIVE rows (the active set shrinks
    to chained redirects after hop 1, so later hops are O(chains),
    not O(corpus)); the wide row columns never enter the loop and are
    joined back by ``url_col`` at the end."""
    import ray

    from warcio_ray.ops.blocks import safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    if hasattr(redirects, "to_pandas") and not isinstance(
            redirects, pd.DataFrame):
        red_n = redirects.count()
        red_small = redirects.to_pandas() if red_n <= broadcast_max \
            else None
        red_ds = redirects
    else:
        red_n = len(redirects)
        red_small = redirects if red_n <= broadcast_max else None
        red_ds = None

    if red_small is not None:
        ref = ray.put(dict(zip(red_small["src"].astype(str),
                               red_small["dst"].astype(str))))

        def resolve(batch: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(ref)
            finals, hops, looped = [], [], []
            for u in batch[url_col]:
                cur, h = u, 0
                while h < max_hops and cur in m:
                    cur = m[cur]
                    h += 1
                finals.append(cur)
                hops.append(h)
                looped.append(int(cur in m))
            out = batch.copy()
            out["final_url"] = pd.Series(finals, index=batch.index,
                                         dtype="object")
            out["n_hops"] = pd.Series(hops, index=batch.index,
                                      dtype="int64")
            out["looped"] = pd.Series(looped, index=batch.index,
                                      dtype="int64")
            return out

        return ds.map_batches(resolve, batch_format="pandas")

    # ---- iterative-join path ----
    import ray.data

    if red_ds is None:
        red_ds = ray.data.from_pandas(redirects)

    def as_map(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_cur": batch["src"].astype(str),
                             "_nxt": batch["dst"].astype(str)})

    red_narrow = red_ds.map_batches(as_map, batch_format="pandas")

    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({url_col: batch[url_col],
                             "_cur": batch[url_col].astype(str),
                             "n_hops": np.zeros(len(batch), "int64")})

    # resolve each DISTINCT url once (duplicate input urls would
    # otherwise fan out in the final join-back)
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    uniq = arrow_blocks(ds.select_columns([url_col])) \
        .groupby(url_col).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"])
    active = uniq.map_batches(seed, batch_format="pandas")
    finals = []
    for _ in range(max_hops):
        j = safe_join(active, red_narrow, "left_outer",
                      num_partitions, ("_cur",))

        def split_done(batch: pd.DataFrame) -> pd.DataFrame:
            done = batch[batch["_nxt"].isna()].copy()
            done["looped"] = np.zeros(len(done), "int64")
            return done[[url_col, "_cur", "n_hops", "looped"]]

        def advance(batch: pd.DataFrame) -> pd.DataFrame:
            live = batch[batch["_nxt"].notna()].copy()
            return pd.DataFrame({
                url_col: live[url_col],
                "_cur": live["_nxt"].astype(str),
                "n_hops": live["n_hops"].to_numpy("int64") + 1})

        j = j.materialize()
        finals.append(j.map_batches(split_done, batch_format="pandas"))
        active = j.map_batches(advance, batch_format="pandas")

    # whatever survived max_hops is final; looped iff one MORE
    # redirect exists from where it stopped
    tail = safe_join(active, red_narrow, "left_outer",
                     num_partitions, ("_cur",))

    def flag_tail(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["looped"] = batch["_nxt"].notna().astype("int64")
        return out[[url_col, "_cur", "n_hops", "looped"]]

    resolved = finals[0]
    for f in finals[1:]:
        resolved = resolved.union(f)
    resolved = resolved.union(
        tail.map_batches(flag_tail, batch_format="pandas"))

    def rename_final(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"_cur": "final_url",
                                     url_col: "_k"})

    # Ray's hash join coalesces the right key (_k) into the left key
    return safe_join(ds, resolved.map_batches(
        rename_final, batch_format="pandas"), "inner",
        num_partitions, (url_col,), ("_k",))


# ---------------------------------------------------------------------------
# URL canonicalization + variant dedup (tracking-param stripping)
# ---------------------------------------------------------------------------

# the classic strip set (Heritrix / CDX canonicalizers drop session ids
# and click-tracking params before dedup; utm_* is the GA convention)
TRACKING_PARAMS = frozenset(
    {"gclid", "fbclid", "msclkid", "ref", "jsessionid"})


def canonicalize_url_series(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonicalization for crawl-side variant dedup:

    1. fragment dropped,
    2. scheme://host lowercased, default ports (:80 http, :443 https)
       stripped — path/query case preserved,
    3. query params split on '&'; empty params and tracking params
       (name in TRACKING_PARAMS or starting with 'utm_',
       case-insensitive) dropped; survivors sorted lexicographically
       (whole 'k=v' token) and rejoined — a paramless query loses its
       '?'.

    All pandas C string kernels plus one explode/groupby for the param
    sort — no per-row Python. The rules are deliberately SQL-mirrorable
    (see the url_canon_dedup oracle) and a strict superset of the
    reference's _ensure_target_uri_format scope (which only fixes wget
    wrapping / spaces — codec/records.py keeps that role for WARC
    parity; THIS canonicalizer is the frontier-side dedup key)."""
    s = urls.fillna("").astype("object").astype("string")
    nofrag = s.str.split("#", n=1).str[0]
    sp = nofrag.str.split("?", n=1)
    base = sp.str[0]
    query = sp.str[1]

    m = base.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)(.*)$")
    sh = m[0].str.lower() \
        .str.replace(r"^(http://.*):80$", r"\1", regex=True) \
        .str.replace(r"^(https://.*):443$", r"\1", regex=True)
    canon_base = (sh + m[1]).where(m[0].notna(), base)

    ex = query.fillna("").str.split("&").explode()
    name = ex.str.split("=", n=1).str[0].str.lower()
    keep = ex.notna() & ex.ne("") & \
        ~(name.str.startswith("utm_").fillna(False)
          | name.isin(TRACKING_PARAMS))
    kept = ex[keep]
    qtail = pd.Series("", index=s.index, dtype="object")
    if len(kept):
        joined = kept.to_frame("p").assign(_i=kept.index) \
            .sort_values(["_i", "p"], kind="mergesort") \
            .groupby("_i")["p"].agg("&".join)
        qtail.loc[joined.index] = "?" + joined
    return (canon_base.astype("object") + qtail).astype("object")


def canonical_url_dedup(ds, url_col: str = "url"):
    """(.., url) Dataset -> (canon_url, n_urls, min_url) Dataset: one
    row per canonical URL with its variant count and lexicographic-min
    raw spelling (the deterministic 'representative capture'). ONE hash
    aggregate over the canon key after a stateless vectorized scan —
    the crawl-frontier dedup that collapses tracking-param and
    case/port spelling variants before fetch scheduling."""
    from ray.data.aggregate import Count, Min

    from warcio_ray.ops.blocks import arrow_blocks

    def canon_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "canon_url": canonicalize_url_series(batch[url_col]),
            url_col: batch[url_col].astype("object")})

    rows = ds.map_batches(canon_batch, batch_format="pandas")
    return arrow_blocks(rows).groupby("canon_url").aggregate(
        Count(alias_name="n_urls"),
        Min(url_col, alias_name="min_url"))


def mine_path_templates(ds, url_col: str = "url",
                        host_col: str = "host", min_count: int = 5):
    """URL path-template mining: generalize every digit run in the
    path to ``{d}`` and count URLs per (host, template) — the
    pattern-level view of a site's URL space that powers crawl-rule
    induction (which templates are articles vs calendars vs pagination
    traps) the way per-key param mining (``mine_url_params``) powers
    query-string strip lists.

    For each (host, template) seen >= ``min_count`` times:
    ``n_urls`` (total URLs matching), ``n_distinct_paths`` (distinct
    concrete paths — ``n_distinct_paths == n_urls`` means every hit is
    unique, the infinite-space signature; a static template has
    ``n_distinct_paths == 1``). Query strings are excluded: the path
    is everything between the host and ``?``.

    Scale shape: one vectorized regexp replace per batch (RE2-class
    pattern, no backtracking), then each batch collapses to its
    DISTINCT (host, template, path) triples before the single shuffle;
    the per-template fold is a second bounded groupby over distinct
    triples. Template space is bounded by real site structures, paths
    only move once, deduplicated.

    No reference counterpart (crawl-curation operator).
    """
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        urls = batch[url_col].astype("string").fillna("")
        paths = urls.map(_path_of).astype("string") \
            .str.split("?", n=1).str[0]
        tmpl = paths.str.replace(r"[0-9]+", "{d}", regex=True)
        out = pd.DataFrame({
            "host": batch[host_col].astype(str).to_numpy(),
            "template": tmpl.astype(object).to_numpy(),
            "path": paths.astype(object).to_numpy(),
            "n": np.int64(1)})
        # collapse to distinct triples with their local multiplicity
        agg = out.groupby(["host", "template", "path"], sort=False) \
            .size().reset_index(name="n")
        return agg.astype({"n": "int64"})

    triples = arrow_blocks(
        ds.map_batches(explode, batch_format="pandas")) \
        .groupby(["host", "template", "path"]) \
        .aggregate(Sum("n", alias_name="n"))
    per_tmpl = triples.groupby(["host", "template"]).aggregate(
        Sum("n", alias_name="n_urls"),
        Count(alias_name="n_distinct_paths"))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["n_urls"] >= min_count]
        return out.astype({"n_urls": "int64",
                           "n_distinct_paths": "int64"})

    return per_tmpl.map_batches(keep, batch_format="pandas")
