"""Distributed PageRank over a link-graph edge Dataset — the iterative
graph-algorithm shape (driver loop over iterations, each iteration a
join + groupby over Datasets; above ``broadcast_max_nodes`` rank
state never lives on the driver — below it, the broadcast fast path
deliberately keeps the O(n) rank vector driver-side).

Fixed-point arithmetic: ranks are int64 micro-units (``scale`` per node
of initial mass) and every update is integer math —

    share(src)  = r(src) // outdeg(src)
    S(dst)      = sum of shares over in-edges          (int64, exact)
    dang        = sum of r over zero-outdegree nodes
    r'(node)    = ((100-d) * scale) // 100
                  + (d * (S(node) + dang // n)) // 100

— so the result is bit-identical at ANY partitioning/batching (integer
sums are order-independent, unlike float accumulation) and recomputable
in SQL by unrolling the iterations. This is the same trick the OPIC
frontier uses (exactness ⇒ order-independence), applied to the classic
damped PageRank instead of crawl priority.

Scale shape: below ``broadcast_max_nodes`` the rank vector fits the
driver and each iteration is ONE edge scan + ONE integer aggregate
(no joins — the broadcast-small-side rule); above it, per iteration
ONE edges⋈ranks hash join (ids + int64 ranks only), one groupby(dst)
integer sum, one node-universe left join, the dangling term a scalar
aggregate, driver state O(1). Both paths share the integer formulas,
so they are bit-equal (tested). Ray Data cannot pin a persistent
partitioning across joins, so edges re-shuffle each iteration — a
production deployment would pre-bucket edges by src hash on disk (the
bucketed-pages pattern) and co-partition ranks to skip half of that.

No reference counterpart; PageRank per Page et al. 1999, with the
standard uniform dangling-mass redistribution.

TrustRank (Gyongyi et al., VLDB 2004) is the ``seeds`` parameter:
teleport mass, initial mass and the dangling redistribution all go to
the trusted seed set only —

    r0(node)    = scale if seed else 0
    r'(node)    = (((100-d) * scale) // 100) * [seed]
                  + (d * (S(node) + (dang // n_seeds) * [seed])) // 100

— same integer arithmetic, same two execution paths, so the unrolled
SQL oracle stays bit-identical. The seed list broadcasts once
(``ray.put`` of a sorted int64 array); TrustRank's semantics make it
small by construction (a hand-vetted trusted set), so the broadcast
never becomes the bottleneck even when the graph needs the join path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["pagerank_ds", "hits_ds", "DEFAULT_SCALE"]

DEFAULT_SCALE = 10 ** 12


def _pagerank_broadcast(edges_ds, node_deg, n, iters, damping_pct,
                        scale, seeds=None):
    """Small-graph iteration core: (node, d) universe + int64 rank
    vectors on the driver; per iteration one edges scan emits (dst,
    share) partials and ONE integer groupby-sum reduces them. Bit-equal
    to the join path (same integer formulas, order-independent sums).
    Gated by pagerank_ds at broadcast_max_nodes."""
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    base = ((100 - damping_pct) * scale) // 100
    nd = node_deg.to_pandas().sort_values("node").reset_index(drop=True)
    nodes = nd["node"].to_numpy(dtype="int64")
    deg = nd["d"].to_numpy(dtype="int64")
    if seeds is None:
        is_seed = np.ones(len(nd), dtype=np.int64)
        n_tele = n
    else:
        is_seed = np.isin(nodes, seeds).astype(np.int64)
        n_tele = int(is_seed.sum())
    rank = (np.int64(scale) * is_seed).astype(np.int64)
    pos = pd.Series(np.arange(len(nd), dtype="int64"), index=nodes)

    for _ in range(iters):
        dang_share = int(rank[deg == 0].sum()) // n_tele
        live = deg > 0
        # two sorted numpy arrays in plasma (zero-copy reads), mapped
        # per batch via searchsorted — no per-batch dict unpickling,
        # and shares stay int64 end to end (no float64 promotion)
        live_nodes = nodes[live]
        live_shares = (rank[live] // deg[live]).astype(np.int64)
        sh_ref = ray.put((live_nodes, live_shares))

        def contrib(batch: pd.DataFrame) -> pd.DataFrame:
            ln, ls = ray.get(sh_ref)
            src = batch["src"].to_numpy(dtype="int64")
            if len(ln) == 0:
                return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                     "share": pd.Series(dtype="int64")})
            p = np.searchsorted(ln, src)
            p_safe = np.clip(p, 0, len(ln) - 1)
            keep = ln[p_safe] == src
            # per-batch combine: one row per distinct dst leaves the
            # task (key space bounded by n, the broadcast gate)
            dst = batch["dst"].to_numpy(dtype="int64")[keep]
            sh = ls[p_safe][keep]
            ud, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(ud), dtype=np.int64)
            np.add.at(acc, inv, sh)
            return pd.DataFrame({"dst": ud, "share": acc})

        # bounded key space (<= n, gated by broadcast_max_nodes) ->
        # tree_aggregate combiner, NOT the sort-based Ray groupby
        # (~2 s/iteration of machinery at 5k nodes; exact int sums are
        # associative, so the result is bit-identical)
        summed = tree_aggregate(
            edges_ds.map_batches(contrib, batch_format="pandas"),
            ["dst"], sums=("share",)).rename(columns={"share": "s"})
        s_arr = np.zeros(len(nd), dtype=np.int64)
        if len(summed):
            # drop dsts outside the node universe (the join path drops
            # them implicitly via the left_outer universe join)
            dsts = summed["dst"].astype("int64")
            known = dsts.isin(pos.index).to_numpy()
            p = pos.reindex(dsts[known]).to_numpy(dtype="int64")
            s_arr[p] = summed["s"].to_numpy(dtype="int64")[known]
        rank = (base * is_seed
                + (damping_pct * (s_arr + dang_share * is_seed)) // 100
                ).astype(np.int64)

    import ray.data
    return ray.data.from_pandas(pd.DataFrame({"node": nodes,
                                              "rank": rank}))


def _adaptive_partitions() -> int:
    import ray
    return min(32, max(2, int(ray.cluster_resources().get("CPU", 8))))


def _data_partitions(n_rows: int, rows_per_part: int = 25_000) -> int:
    """Partition count sized to the DATA as well as the CPUs: per-op
    scheduling latency is paid once per partition per shuffle, so a
    toy-scale input on a wide session must not fan into 32 near-empty
    partitions (measured on the sf0.1 LPA sampler: 32 parts 18 s vs
    8 parts 9.5 s, identical output — these kernels are
    partitioning-invariant by contract). Scale inputs still get the
    full CPU width."""
    return min(_adaptive_partitions(),
               max(2, n_rows // rows_per_part + 1))


def pagerank_ds(edges_ds, nodes_ds, iters: int = 5,
                damping_pct: int = 85, scale: int = DEFAULT_SCALE,
                num_partitions: Optional[int] = None,
                broadcast_max_nodes: int = 2_000_000,
                seeds=None):
    """``edges_ds``: (src, dst) int64 rows. ``nodes_ds``: (node) int64
    rows — the node universe (isolated nodes included). Returns a
    Dataset (node, rank) of int64 fixed-point ranks after ``iters``
    damped iterations from a uniform start of ``scale`` per node.

    ``seeds`` (optional int64 array of node ids) switches the
    computation to TrustRank: initial mass, the (100-damping)%
    teleport and the dangling redistribution are restricted to the
    seed set (see module docstring). Unknown seed ids are ignored;
    an empty effective seed set raises.
    """
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import safe_join

    if num_partitions is None:
        num_partitions = _adaptive_partitions()
    if seeds is not None:
        seeds = np.unique(np.asarray(seeds, dtype=np.int64))

    # the edge table is the iteration working set — materialize ONCE so
    # the (possibly expensive) upstream that produced it (html parse,
    # warc read) never re-executes per iteration; 16-byte rows live in
    # the object store and spill if larger than memory
    edges_ds = edges_ds.materialize()
    n = nodes_ds.count()
    # every intermediate (dangling sum, per-node in-share pileup) is
    # bounded by the total mass n*scale. The bound is 2^53, NOT int64:
    # a left-outer join's NaN-filled sum column and a partial pandas
    # map both promote through float64, which is exact only to 2^53 —
    # past it the two execution paths (and the SQL oracle's HUGEINTs)
    # would round differently. Staying under 2^53 keeps every value
    # exact in BOTH int64 and float64, so path equivalence is airtight.
    if n and n * scale >= (1 << 53):
        raise ValueError(
            f"n*scale = {n * scale:.3g} exceeds the float64-exact "
            f"bound 2^53 (intermediates pass through float64 in joins"
            f"/maps); pass scale <= {(1 << 53) // n} for {n} nodes "
            f"(precision degrades gracefully)")
    if n == 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "rank": pd.Series(dtype="int64")}))

    from warcio_ray.ops.blocks import arrow_blocks

    if n <= broadcast_max_nodes:
        # small-graph fast path (auto, like the crawl's fetch modes):
        # rank state fits the driver, so each iteration is ONE edge
        # scan + ONE integer aggregate — no joins, no per-iteration
        # actor pools. The out-degree table is bounded by n here too,
        # so it folds through the same tree_aggregate combiner and the
        # universe merge happens driver-side (no Ray groupby, no hash
        # join). Integer math is identical to the join path, so
        # results are bit-equal (tested) and the oracle doesn't care
        # which path ran. At n > threshold rank state must live in the
        # cluster and the join path below is the honest shape.
        from warcio_ray.ops.blocks import tree_aggregate

        def deg_partial(batch: pd.DataFrame) -> pd.DataFrame:
            vc = batch["src"].value_counts()
            return pd.DataFrame(
                {"src": vc.index.to_numpy(dtype="int64"),
                 "d": vc.to_numpy(dtype="int64")})

        deg_pd = tree_aggregate(
            edges_ds.map_batches(deg_partial, batch_format="pandas"),
            ["src"], sums=("d",))
        node_pd = nodes_ds.to_pandas()[["node"]].astype("int64")
        merged = node_pd.merge(deg_pd.rename(columns={"src": "node"}),
                               on="node", how="left")
        merged["d"] = merged["d"].fillna(0).astype("int64")
        if seeds is not None and not np.isin(
                merged["node"].to_numpy(dtype="int64"), seeds).any():
            raise ValueError("TrustRank seed set is empty after "
                             "intersecting with the node universe")
        import ray.data
        return _pagerank_broadcast(edges_ds,
                                   ray.data.from_pandas(merged), n,
                                   iters, damping_pct, scale,
                                   seeds=seeds)

    # arrow blocks before aggregate: per-ROW Python on pandas blocks
    deg = arrow_blocks(edges_ds).groupby("src") \
        .aggregate(Count(alias_name="d"))

    # static node universe with out-degree (0 for dangling/isolated)
    node_deg = safe_join(nodes_ds, deg, "left_outer", num_partitions,
                         ("node",), right_on=("src",))

    import ray as _ray
    seed_ref = _ray.put(seeds) if seeds is not None else None

    def stamp_deg(batch: pd.DataFrame) -> pd.DataFrame:
        node = batch["node"].astype("int64")
        t = np.ones(len(batch), dtype=np.int64) if seed_ref is None \
            else np.isin(node.to_numpy(dtype="int64"),
                         _ray.get(seed_ref)).astype(np.int64)
        return pd.DataFrame({
            "node": node,
            "d": batch["d"].fillna(0).astype("int64"),
            "t": t})

    node_deg = node_deg.map_batches(
        stamp_deg, batch_format="pandas").materialize()
    # teleport-population size: n for PageRank, |seeds ∩ universe| for
    # TrustRank (one int64 scan of the bounded universe table)
    n_tele = n if seeds is None else int(node_deg.sum("t") or 0)
    if n_tele == 0:
        raise ValueError("TrustRank seed set is empty after "
                         "intersecting with the node universe")

    def init_rank(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["node", "d", "t"]].copy()
        out["rank"] = (np.int64(scale)
                       * out["t"].to_numpy(dtype="int64"))
        return out

    # ranks carry the static out-degree so the per-iteration state join
    # (rank ⋈ degree) disappears: one edges join + one universe join
    ranks = node_deg.map_batches(init_rank, batch_format="pandas") \
        .materialize()
    base = ((100 - damping_pct) * scale) // 100

    for _ in range(iters):
        dang = ranks.map_batches(
            lambda b: pd.DataFrame({"m": [np.int64(
                b.loc[b["d"] == 0, "rank"].sum())]}),
            batch_format="pandas").sum("m") or 0
        dang_share = int(dang) // n_tele

        def shares(batch: pd.DataFrame) -> pd.DataFrame:
            live = batch[batch["d"] > 0]
            return pd.DataFrame({
                "src": live["node"].astype("int64"),
                "share": (live["rank"] // live["d"]).astype("int64")})

        contrib = safe_join(
            edges_ds, ranks.map_batches(shares, batch_format="pandas"),
            "inner", num_partitions, ("src",)) \
            .groupby("dst").aggregate(Sum("share", alias_name="s"))

        nxt = safe_join(node_deg, contrib, "left_outer", num_partitions,
                        ("node",), right_on=("dst",))

        def update(batch: pd.DataFrame, dang_share=dang_share
                   ) -> pd.DataFrame:
            s = batch["s"].fillna(0).astype("int64") if "s" in batch \
                else pd.Series(np.zeros(len(batch), dtype="int64"))
            t = batch["t"].astype("int64")
            return pd.DataFrame({
                "node": batch["node"].astype("int64"),
                "d": batch["d"].astype("int64"),
                "t": t,
                "rank": (base * t
                         + (damping_pct * (s + dang_share * t)) // 100
                         ).astype("int64")})

        ranks = nxt.map_batches(update, batch_format="pandas") \
            .materialize()

    return ranks.drop_columns(["d", "t"])


def anchor_stats(pages_ds, num_partitions=None):
    """Per-target-URL anchor-text aggregation over the real page html
    (the search/training primitive: what does the web call this page?).

    Scale shape: each batch explodes to (dst_url, anchor) rows — html
    never leaves the task — then TWO narrow-row hash aggregates:
    (dst_url, anchor) pair counts first (so a page linked a million
    times with the same label collapses map-side-ish to one row per
    distinct label per partition), then per-dst totals. Unbounded key
    spaces -> real groupbys over arrow blocks (perf learning 18), not
    driver folds. Returns (url, n_anchors, n_distinct_anchors,
    min_anchor) — min over the distinct labels keeps the output
    deterministic without shipping label lists.

    Oracle: the synthesized link graph is a deterministic function of
    doc_id (pages.py links_for: anchor 'link j' pointing at
    (doc_id*31+7*(j+1)) % n), so SQL reconstructs the whole edge set
    from the documents table. No reference counterpart.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Min, Sum

    from warcio_ray.ops.blocks import arrow_blocks
    from warcio_ray.html import extract_anchors

    def explode(batch: pa.Table) -> pa.Table:
        # map-side combine: one (url, anchor, c) row per distinct pair
        # per batch, so repeated labels collapse before the shuffle
        counts: dict = {}
        for h in batch["html"].to_pylist():
            for pair in extract_anchors(h):
                counts[pair] = counts.get(pair, 0) + 1
        return pa.table({
            "url": pa.array([u for u, _ in counts], pa.string()),
            "anchor": pa.array([a for _, a in counts], pa.string()),
            "c": pa.array(list(counts.values()), pa.int64())})

    pair_counts = arrow_blocks(
        pages_ds.map_batches(explode, batch_format="pyarrow")) \
        .groupby(["url", "anchor"]).aggregate(Sum("c", alias_name="c"))
    return arrow_blocks(pair_counts).groupby("url").aggregate(
        Sum("c", alias_name="n_anchors"),
        Count(alias_name="n_distinct_anchors"),
        Min("anchor", alias_name="min_anchor"))


# ---------------------------------------------------------------------------
# HITS hubs/authorities (Kleinberg 1999) — the second classic link
# algorithm, exact-integer like pagerank_ds
# ---------------------------------------------------------------------------

def hits_ds(edges_ds, nodes_ds, rounds: int = 2, cap_bits: int = 40,
            num_partitions: Optional[int] = None,
            broadcast_max_nodes: int = 2_000_000):
    """HITS: per round  a(v) = Σ_{u→v} h(u)  then  h(u) = Σ_{u→v} a(v).

    Exactness: HITS' usual L2 normalization is float — instead each
    half-step DOWN-SHIFTS every value by
    ``max(0, bit_length(max_value) - cap_bits)`` (an exact integer
    halving chosen from an exact integer max), which bounds growth the
    way normalization does while keeping every update integer, hence
    bit-identical at any partitioning and SQL-replayable (DuckDB
    mirrors bit_length as ``length(bin(m))``). Relative order per
    vector is preserved exactly; only the shared scale changes, which
    is all HITS' ranking semantics promise anyway.

    Scale shape mirrors pagerank_ds: below ``broadcast_max_nodes`` the
    two O(n) vectors live on the driver and each half-step is ONE edge
    scan folded through the tree-aggregate combiner; above it each
    half-step is one edges⋈state hash join + one groupby integer sum
    (ids + int64 only), max via an exact Dataset.max, driver state
    O(1).  Returns a Dataset of (node, hub_q, auth_q)."""
    import ray
    import ray.data

    from warcio_ray.ops.blocks import (arrow_blocks, safe_join,
                                       tree_aggregate)

    if num_partitions is None:
        num_partitions = _adaptive_partitions()
    edges_ds = edges_ds.materialize()
    n = nodes_ds.count()
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "hub_q": pd.Series(dtype="int64"),
             "auth_q": pd.Series(dtype="int64")}))

    def _shift_of(m: int) -> int:
        return max(0, int(m).bit_length() - cap_bits)

    if n <= broadcast_max_nodes:
        nodes = nodes_ds.to_pandas()["node"].to_numpy(dtype="int64")
        nodes = np.sort(nodes)
        h = np.ones(len(nodes), dtype=np.int64)
        a = np.zeros(len(nodes), dtype=np.int64)

        def half_step(vals: np.ndarray, src_col: str,
                      dst_col: str) -> np.ndarray:
            ref = ray.put((nodes, vals))

            def contrib(batch: pd.DataFrame) -> pd.DataFrame:
                ns, vs = ray.get(ref)
                src = batch[src_col].to_numpy(dtype="int64")
                p = np.clip(np.searchsorted(ns, src), 0, len(ns) - 1)
                keep = ns[p] == src
                dst = batch[dst_col].to_numpy(dtype="int64")[keep]
                ud, inv = np.unique(dst, return_inverse=True)
                acc = np.zeros(len(ud), dtype=np.int64)
                np.add.at(acc, inv, vs[p][keep])
                return pd.DataFrame({"k": ud, "v": acc})

            summed = tree_aggregate(
                edges_ds.map_batches(contrib, batch_format="pandas"),
                ["k"], sums=("v",))
            out = np.zeros(len(nodes), dtype=np.int64)
            if len(summed):
                ks = summed["k"].to_numpy(dtype="int64")
                p = np.clip(np.searchsorted(nodes, ks), 0,
                            len(nodes) - 1)
                keep = nodes[p] == ks
                out[p[keep]] = summed["v"].to_numpy(dtype="int64")[keep]
            m = int(out.max()) if len(out) else 0
            return out >> np.int64(_shift_of(m))

        for _ in range(rounds):
            a = half_step(h, "src", "dst")   # authorities from hubs
            h = half_step(a, "dst", "src")   # hubs from authorities
        return ray.data.from_pandas(pd.DataFrame(
            {"node": nodes, "hub_q": h, "auth_q": a}))

    # join path: state Datasets (node, v); same integer math
    state = nodes_ds.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype("int64"),
                                "v": np.int64(1)}),
        batch_format="pandas")

    def half_step_join(state_ds, src_col: str, dst_col: str):
        from ray.data.aggregate import Sum

        joined = safe_join(edges_ds, state_ds, "inner", num_partitions,
                           (src_col,), right_on=("node",))
        summed = arrow_blocks(joined).groupby(dst_col) \
            .aggregate(Sum("v", alias_name="s"))
        out = safe_join(nodes_ds, summed, "left_outer", num_partitions,
                        ("node",), right_on=(dst_col,))

        def stamp(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": batch["node"].astype("int64"),
                "v": batch["s"].fillna(0).astype("int64")})

        out = out.map_batches(stamp, batch_format="pandas") \
            .materialize()
        m = int(out.max("v") or 0)
        sh = _shift_of(m)
        if sh:
            out = out.map_batches(
                lambda b, s=sh: b.assign(v=b["v"].to_numpy() >> s),
                batch_format="pandas")
        return out

    auth = state
    hub = state
    for _ in range(rounds):
        auth = half_step_join(hub, "src", "dst")
        hub = half_step_join(auth, "dst", "src")
    merged = safe_join(
        hub.map_batches(lambda b: b.rename(columns={"v": "hub_q"}),
                        batch_format="pandas"),
        auth.map_batches(lambda b: b.rename(columns={"v": "auth_q"}),
                         batch_format="pandas"),
        "inner", num_partitions, ("node",))
    return merged.map_batches(
        lambda b: b[["node", "hub_q", "auth_q"]].astype("int64"),
        batch_format="pandas")


def host_graph(edges_ds, host_of_src, host_of_dst=None):
    """Host-level webgraph — the aggregation Common Crawl publishes as
    its host/domain webgraph dataset: collapse doc-level (src, dst)
    edges to weighted host edges (src_host, dst_host, n_links,
    n_src_pages).

    ``host_of_src`` maps an int64 id array to host strings (the pages
    host rule); ``host_of_dst`` defaults to the same map. Scale shape:
    the map runs inside the edge scan (doc ids never shuffle as
    strings until they've been collapsed to per-batch distinct host
    pairs — a map-side combine, since fan-in concentrates on few
    hosts), then ONE hash aggregate over the host-pair key space;
    n_src_pages is an exact distinct-count via a second narrow
    aggregate of (pair, src) distinct rows."""
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks

    hod = host_of_dst or host_of_src

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["src"].to_numpy(dtype="int64")
        dst = batch["dst"].to_numpy(dtype="int64")
        df = pd.DataFrame({"src_host": host_of_src(src),
                           "dst_host": hod(dst),
                           "src": src})
        # map-side combine: per-batch (pair, src) distinct page rows
        # with their link multiplicity
        g = df.groupby(["src_host", "dst_host", "src"], sort=False) \
            .size().reset_index(name="c")
        return g

    per_page = arrow_blocks(
        edges_ds.map_batches(explode, batch_format="pandas")) \
        .groupby(["src_host", "dst_host", "src"]) \
        .aggregate(Sum("c", alias_name="c"))
    out = arrow_blocks(per_page).groupby(["src_host", "dst_host"]) \
        .aggregate(Sum("c", alias_name="n_links"),
                   Count(alias_name="n_src_pages"))
    return out


def weakly_connected_components(edges_ds, num_partitions=None,
                                max_iters: int = 64):
    """Weakly connected components over a directed (src, dst) edge
    Dataset — the site/mirror-cluster artifact the Common Crawl
    webgraph releases publish alongside ranks. Direction is dropped;
    every node that appears in any edge is labeled with its
    component's minimum node id.

    Thin delegation to the alternating large/small-star contraction
    (``ops/dedup.connected_components_ds``): one hash shuffle of the
    bounded edge set per half-round, O(1) driver state, O(log n)
    rounds — the scale path for billion-edge webgraphs. Returns a
    (node int64, component int64) Dataset."""
    from warcio_ray.ops.dedup import N_CC_PARTITIONS, \
        connected_components_ds

    def to_ab(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": batch["src"].to_numpy(dtype="int64"),
                             "b": batch["dst"].to_numpy(dtype="int64")})

    labeled = connected_components_ds(
        edges_ds.map_batches(to_ab, batch_format="pandas"),
        num_partitions=num_partitions or N_CC_PARTITIONS,
        max_iters=max_iters)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"doc_id": "node",
                                     "cluster_id": "component"})

    return labeled.map_batches(rename, batch_format="pandas")


def reciprocal_link_stats(edges_ds):
    """Per-node reciprocity — the classic link-farm / link-exchange
    spam signal (a site whose outlinks are mostly reciprocated is
    trading links, not earning them; cf. Common Crawl webgraph
    analyses). No warcio counterpart — webgraph operator per the
    build brief.

    (src, dst) int64 edges -> (node, n_out, n_recip): distinct
    out-neighbors and how many of those edges are reciprocated
    (both directions present). Self-loops and multi-edges are
    ignored.

    Shape at scale: per-batch distinct (lo, hi, direction-flag) rows
    (map-side combine), ONE hash aggregate over the undirected pair
    key (Max merges duplicate directions exactly), a stateless
    per-direction re-explode, then one node-keyed aggregate. Two
    narrow int64 shuffles total; nothing node- or edge-sized touches
    the driver."""
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]].drop_duplicates()
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        fwd = (src < dst)
        out = pd.DataFrame({
            "lo": np.minimum(src, dst),
            "hi": np.maximum(src, dst),
            "d_fwd": fwd.astype("int64"),
            "d_rev": (~fwd).astype("int64")})
        # duplicate (lo, hi) rows within the batch collapse here; Max
        # in the pair aggregate finishes the job across batches
        return out.groupby(["lo", "hi"], sort=False).max().reset_index()

    from ray.data.aggregate import Max

    pairs = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Max("d_fwd", alias_name="d_fwd"),
                                         Max("d_rev", alias_name="d_rev"))

    def per_node(batch: pd.DataFrame) -> pd.DataFrame:
        recip = (batch["d_fwd"] & batch["d_rev"]).astype("int64")
        f = batch["d_fwd"].astype(bool)
        r = batch["d_rev"].astype(bool)
        return pd.DataFrame({
            "node": np.concatenate([batch["lo"].to_numpy()[f],
                                    batch["hi"].to_numpy()[r]]),
            "recip": np.concatenate([recip.to_numpy()[f],
                                     recip.to_numpy()[r]])
        }).astype({"node": "int64", "recip": "int64"})

    return arrow_blocks(pairs.map_batches(per_node, batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="n_out"),
                                   Sum("recip", alias_name="n_recip"))


def triangle_counts(edges_ds, broadcast_max_nodes: int = 2_000_000,
                    num_partitions=None):
    """Per-node triangle counts over the undirected distinct edge set
    — the clustering-coefficient numerator, the classic webgraph
    cohesion metric (spam farms and boilerplate nav rings are
    triangle-dense). No warcio counterpart — build-brief webgraph
    operator.

    Algorithm: degree-ordered edge orientation ("forward" algorithm,
    Schank & Wagner 2005): every edge points from its lower-(deg, id)
    endpoint to the higher one, so each triangle is counted exactly
    once as a wedge at its lowest corner and per-source out-degrees
    are O(sqrt(m))-bounded for heavy nodes — the wedge explosion can't
    blow up on a celebrity host the way naive neighbor-pairing does.

    Shape at scale: one distinct-edge aggregate, one degree aggregate
    (broadcast <= ``broadcast_max_nodes``, the same gate PageRank
    uses; a join-path orientation is the swap above it), a
    partition-sweep wedge kernel (np.triu pair expansion per source),
    ONE wedge⋈edge hash join, then a corner-explode count. Returns a
    (node int64, n_tri int64) Dataset, nodes with >= 1 triangle."""
    import zlib

    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    tri = _oriented_triangles(und, broadcast_max_nodes, num_partitions)

    def corners(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["u"].to_numpy(), batch["s"].to_numpy(),
             batch["t"].to_numpy()])})

    return arrow_blocks(tri.map_batches(corners, batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="n_tri"))


def _oriented_triangles(und, broadcast_max_nodes: int,
                        num_partitions: int):
    """Shared forward-algorithm triangle enumeration over a
    materialized distinct undirected edge set (lo, hi): returns a
    Dataset of (u, s, t) corner triples, one row per triangle (u is
    the lowest corner in (deg, id) orientation; the triangle SET is
    orientation-independent, so callers needing canonical edges just
    min/max the pairs). Used by ``triangle_counts`` (corner counts)
    and ``ktruss_edges`` (per-edge support, per peel round)."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    def endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["lo"].to_numpy(), batch["hi"].to_numpy()])})

    deg_ds = arrow_blocks(und.map_batches(endpoints, batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="deg")).materialize()
    n_nodes = deg_ds.count()
    if n_nodes and int(deg_ds.max(on="node")) >= (1 << 40):
        raise ValueError(
            "triangle_counts: node ids must fit 40 bits for the "
            "(deg, id) orientation pack — densify ids first")

    def _finish_orient(batch: pd.DataFrame, klo: "np.ndarray",
                       khi: "np.ndarray") -> pd.DataFrame:
        # orientation key: (deg, id) packed -> strict total order;
        # kt (the target's key) rides along so the wedge kernel needs
        # no degree lookup of its own
        fwd = klo < khi
        return pd.DataFrame({
            "s": np.where(fwd, batch["lo"], batch["hi"]),
            "t": np.where(fwd, batch["hi"], batch["lo"]),
            "kt": np.where(fwd, khi, klo)}) \
            .astype({"s": "int64", "t": "int64", "kt": "int64"})

    if n_nodes <= broadcast_max_nodes:
        deg = deg_ds.to_pandas()
        dref = ray.put(pd.Series(
            (deg["deg"].to_numpy(np.int64) << np.int64(40))
            | deg["node"].to_numpy(np.int64), index=deg["node"]))

        def orient(batch: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(dref)
            return _finish_orient(
                batch,
                keys.reindex(batch["lo"]).to_numpy(np.int64),
                keys.reindex(batch["hi"]).to_numpy(np.int64))

        oriented = und.map_batches(orient, batch_format="pandas") \
            .materialize()
    else:
        # join-path orientation: two narrow und⋈deg hash joins attach
        # both endpoints' degrees; no node-sized state on any worker
        def deg_side(col):
            def rename(batch: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    f"_n{col}": batch["node"].astype("int64"),
                    f"_d{col}": batch["deg"].astype("int64")})
            return deg_ds.map_batches(rename, batch_format="pandas")

        j = safe_join(und, deg_side("lo"), "inner", num_partitions,
                      ("lo",), ("_nlo",))
        j = safe_join(j, deg_side("hi"), "inner", num_partitions,
                      ("hi",), ("_nhi",))

        def orient_joined(batch: pd.DataFrame) -> pd.DataFrame:
            klo = (batch["_dlo"].to_numpy(np.int64) << np.int64(40)) \
                | batch["lo"].to_numpy(np.int64)
            khi = (batch["_dhi"].to_numpy(np.int64) << np.int64(40)) \
                | batch["hi"].to_numpy(np.int64)
            return _finish_orient(batch, klo, khi)

        oriented = j.map_batches(orient_joined, batch_format="pandas") \
            .materialize()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = batch["s"].to_numpy().astype(np.uint64, copy=False)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def wedges(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # sorting by (s, kt) pre-orients every group's neighbor list;
        # kt rode in on the oriented rows, so no lookup here
        part = part.sort_values(["s", "kt"], kind="mergesort")
        for s, grp in part.groupby("s", sort=False):
            nb = grp["t"].to_numpy(np.int64)
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({
                "u": np.full(len(i), s, dtype="int64"),
                "s": nb[i], "t": nb[j]}))
        if not outs:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64"),
                                 "t": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    wedge_ds = oriented.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(wedges, batch_format="pandas")

    return safe_join(wedge_ds, oriented.drop_columns(["kt"]),
                     "inner", num_partitions, ("s", "t"))


def ktruss_edges(edges_ds, k: int = 4, num_partitions=None,
                 broadcast_max_nodes: int = 2_000_000,
                 max_rounds: int = 64):
    """k-truss decomposition of the undirected simple graph — the
    cohesion rung ABOVE k-core (every k-truss is a (k-1)-core, not
    vice versa): the maximal subgraph where every EDGE closes at
    least k-2 triangles. The standard community-backbone / spam-ring
    extractor (Cohen 2008); link farms survive k-core by volume but
    die here because their edges lack closed wedges.

    Parallel peel: each round enumerates triangles over the current
    edge set with the shared forward-algorithm kernel
    (``_oriented_triangles`` — degree-ordered wedges, one wedge⋈edge
    hash join), tallies per-edge support via one bounded (lo, hi)
    aggregate, and drops EVERY edge under support simultaneously,
    until a fixpoint. Support tallies and the surviving edge set are
    orientation-independent, so results are partitioning-invariant
    and SQL-replayable (id-ordered triangle join in the oracle).

    Shape at scale: per round, triangles flow straight into the
    support aggregate (never to the driver); driver state is ONE
    integer (the edge count) per round. Rounds are bounded by the
    peel depth, in practice a handful.

    Returns (lo, hi, support) — the surviving edges with their
    in-truss support (all >= k-2). k must be >= 3."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    if k < 3:
        raise ValueError("ktruss_edges: need k >= 3")
    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    need = k - 2

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    m = und.count()
    empty = pd.DataFrame({"lo": pd.Series(dtype="int64"),
                          "hi": pd.Series(dtype="int64"),
                          "support": pd.Series(dtype="int64")})

    def tri_edges(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["u"].to_numpy(np.int64)
        s = batch["s"].to_numpy(np.int64)
        t = batch["t"].to_numpy(np.int64)
        return pd.DataFrame({
            "lo": np.concatenate([np.minimum(u, s), np.minimum(u, t),
                                  np.minimum(s, t)]),
            "hi": np.concatenate([np.maximum(u, s), np.maximum(u, t),
                                  np.maximum(s, t)])})

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["support"].to_numpy() >= need]

    kept = None
    for _ in range(max_rounds):
        if m == 0:
            return ray.data.from_pandas(empty)
        tri = _oriented_triangles(und, broadcast_max_nodes,
                                  num_partitions)
        sup = arrow_blocks(
            tri.map_batches(tri_edges, batch_format="pandas")) \
            .groupby(["lo", "hi"]).aggregate(Count(alias_name="support"))
        kept = sup.map_batches(keep, batch_format="pandas").materialize()
        m2 = kept.count()
        if m2 == m:
            return kept
        und = kept.drop_columns(["support"]).materialize()
        m = m2
    return kept


def kcore_nodes(edges_ds, k: int = 3, num_partitions=None,
                broadcast_max_nodes: int = 2_000_000,
                max_rounds: int = 64):
    """k-core of the undirected simple graph under a directed (src,
    dst) edge Dataset — the classic webgraph density/spam artifact
    (Common Crawl's webgraph releases ship core numbers next to
    ranks): the maximal subgraph where every node keeps degree >= k.
    Returns a (node, deg) Dataset — survivors with their in-core
    degree.

    Parallel peel (Matula & Beck): each round removes EVERY node whose
    current degree is < k simultaneously, until a fixpoint. Self-loops
    dropped, multi-edges collapsed first (one (lo, hi) hash aggregate).

    Scale shape: the edge set materializes once and only shrinks.
    Below ``broadcast_max_nodes`` each round is ONE edge scan folding
    bounded (node, deg) partials through the tree combiner, the alive
    set broadcast back as a sorted int64 array (searchsorted filter);
    above it, degree is a real hash aggregate and the edge filter is
    two alive-semi-joins, driver state O(1). Both paths remove the
    same node set each round, so they are bit-equal (tested).
    Raises RuntimeError if ``max_rounds`` rounds don't converge
    (parallel peel needs O(peel depth) rounds — tens on real
    webgraphs; an adversarial path graph can need n/2, and a silent
    partial core would be wrong).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import (arrow_blocks, safe_join,
                                       tree_aggregate)

    if num_partitions is None:
        num_partitions = _adaptive_partitions()

    def to_und(batch: pd.DataFrame) -> pd.DataFrame:
        src = batch["src"].to_numpy(dtype="int64")
        dst = batch["dst"].to_numpy(dtype="int64")
        keep = src != dst
        lo = np.minimum(src[keep], dst[keep])
        hi = np.maximum(src[keep], dst[keep])
        return pd.DataFrame({"lo": lo, "hi": hi}).drop_duplicates()

    und = arrow_blocks(
        edges_ds.map_batches(to_und, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()

    def deg_fold(batch: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([batch["lo"].to_numpy(dtype="int64"),
                                batch["hi"].to_numpy(dtype="int64")])
        ud, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": ud, "dg": cnt.astype("int64")})

    n_nodes = int(und.map_batches(
        lambda b: pd.DataFrame({"n": [b["lo"].nunique()
                                      + b["hi"].nunique()]}),
        batch_format="pandas").sum("n") or 0)  # upper bound is fine

    empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "deg": pd.Series(dtype="int64")})

    if n_nodes <= broadcast_max_nodes:
        # endpoint universe fits the driver: per round one edge scan
        # (bounded (node, deg) combiner) + one broadcast filter
        for _ in range(max_rounds):
            deg = tree_aggregate(
                und.map_batches(deg_fold, batch_format="pandas"),
                ["node"], sums=("dg",))
            if not len(deg):
                return ray.data.from_pandas(empty)
            dead = deg["dg"].to_numpy(dtype="int64") < k
            if not dead.any():
                out = deg.rename(columns={"dg": "deg"}) \
                    .sort_values("node").reset_index(drop=True)
                return ray.data.from_pandas(out)
            alive = np.sort(deg.loc[~dead, "node"]
                            .to_numpy(dtype="int64"))
            aref = ray.put(alive)

            def keep(batch: pd.DataFrame) -> pd.DataFrame:
                a = ray.get(aref)
                lo = batch["lo"].to_numpy(dtype="int64")
                hi = batch["hi"].to_numpy(dtype="int64")
                pl = np.searchsorted(a, lo)
                ph = np.searchsorted(a, hi)
                ok = ((pl < len(a)) & (ph < len(a)))
                ok[ok] &= ((a[pl[ok]] == lo[ok])
                           & (a[ph[ok]] == hi[ok]))
                return batch[ok]

            und = und.map_batches(keep,
                                  batch_format="pandas").materialize()
        raise RuntimeError(f"k-core peel did not converge in "
                           f"{max_rounds} rounds")

    # join path: degree is a real hash aggregate; the edge filter is
    # two semi-joins against the alive node set (ids only move)
    for _ in range(max_rounds):
        deg = arrow_blocks(
            und.map_batches(deg_fold, batch_format="pandas")) \
            .groupby("node").aggregate(Sum("dg", alias_name="deg")) \
            .materialize()
        n_dead = deg.filter(expr=f"deg < {k}").count()
        if deg.count() == 0:
            return ray.data.from_pandas(empty)
        if n_dead == 0:
            def stamp(batch: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "node": batch["node"].astype("int64"),
                    "deg": batch["deg"].astype("int64")})
            return deg.map_batches(stamp, batch_format="pandas")
        alive = deg.filter(expr=f"deg >= {k}") \
            .drop_columns(["deg"]).materialize()
        for col in ("lo", "hi"):
            # inner semi-join: alive carries only its key, so the join
            # output is exactly (lo, hi) again
            und = safe_join(und, alive, "inner", num_partitions,
                            (col,), right_on=("node",))
        und = und.materialize()
    raise RuntimeError(f"k-core peel did not converge in "
                       f"{max_rounds} rounds")


def cocitation_pairs(edges_ds, max_out_degree: int = 256,
                     num_partitions=None):
    """Co-citation counts (Small 1973, the related-page signal search
    engines derive from the link graph): for every unordered pair of
    pages cited by a common source, how many distinct sources cite
    both. Returns (a, b, n_common) with a < b, plus the number of
    OVER-CAP sources truncated (second return value) — a source
    citing more than ``max_out_degree`` distinct pages contributes
    only its ``max_out_degree`` smallest-id citations (pair fan-out is
    quadratic in out-degree; an uncapped mega-hub would emit billions
    of pairs), and the truncation is accounted, never silent.

    Shape at scale: per-batch distinct (src, dst) fold, ONE src-hash
    partition sweep generates each source's pairs with a vectorized
    per-partition kernel (never a per-src map_groups group), then ONE
    (a, b) hash aggregate counts common citers. Self-loops ignored;
    duplicate (src, dst) edges collapse before pairing, so multi-edges
    don't inflate counts.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    if num_partitions is None:
        num_partitions = _adaptive_partitions()

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "src": batch["src"].to_numpy(dtype="int64"),
            "dst": batch["dst"].to_numpy(dtype="int64")})
        if len(df) and int(df["dst"].min()) < 0:
            # a = -1 is the truncation sentinel downstream; negative
            # node ids would silently vanish into it
            raise ValueError("cocitation_pairs requires non-negative "
                             "node ids")
        df = df[df["src"] != df["dst"]].drop_duplicates()
        df["_part"] = (df["src"].to_numpy(dtype="int64")
                       % num_partitions)
        return df

    def pair_kernel(grp: pd.DataFrame) -> pd.DataFrame:
        # whole partition at once: global (src, dst) dedup, then pair
        # expansion per source over sorted contiguous runs
        g = grp.drop_duplicates(["src", "dst"]) \
            .sort_values(["src", "dst"], kind="mergesort")
        src = g["src"].to_numpy(dtype="int64")
        dst = g["dst"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        a_out, b_out, n_trunc = [], [], 0
        for s, e in zip(starts, ends):
            if e - s > max_out_degree:
                n_trunc += 1
                e = s + max_out_degree  # smallest ids (sorted run)
            d = dst[s:e]
            m = len(d)
            if m < 2:
                continue
            iu = np.triu_indices(m, k=1)
            a_out.append(d[iu[0]])
            b_out.append(d[iu[1]])
        if a_out:
            out = pd.DataFrame({
                "a": np.concatenate(a_out),
                "b": np.concatenate(b_out)})
        else:
            out = pd.DataFrame({"a": pd.Series(dtype="int64"),
                                "b": pd.Series(dtype="int64")})
        if n_trunc:
            out = pd.concat([out, pd.DataFrame(
                {"a": [-1], "b": [-n_trunc]})], ignore_index=True)
        return out.astype({"a": "int64", "b": "int64"})

    pairs = edges_ds.map_batches(fold, batch_format="pandas") \
        .groupby("_part").map_groups(pair_kernel,
                                     batch_format="pandas") \
        .materialize()
    n_truncated = -int(pairs.filter(expr="a == -1")
                       .sum("b") or 0)
    real = pairs.filter(expr="a >= 0")
    counted = arrow_blocks(real).groupby(["a", "b"]) \
        .aggregate(Count(alias_name="n_common"))
    return counted, n_truncated


def adamic_adar_topk(edges_ds, k: int = 20, max_degree: int = 256,
                     num_partitions=None):
    """Adamic-Adar link prediction (Adamic & Adar 2003): for every
    non-adjacent pair (a, b) of the UNDIRECTED graph, score
    sum over common neighbors z of 1/ln(deg(z)) — frequent hubs count
    less than rare connectors. Per-z weights quantize to int64 at 2^32
    (floor(2^32/ln(deg) + 0.5), the libm-ln precedent; deg >= 2 always
    holds for a wedge center) so pair scores are EXACT integer sums —
    partitioning-invariant and hash-comparable. Returns
    (top-k Dataset of (a, b, aa_q) by score desc then (a, b) asc,
    n_truncated) — a center with more than ``max_degree`` neighbors
    contributes only its ``max_degree`` smallest-id ones (quadratic
    fan-out guard), accounted never silent.

    Shape at scale: per-batch undirect + dedup fold, ONE z-hash
    partition sweep generates each center's wedges with a vectorized
    per-partition kernel (the same sweep emits (min,max,is_edge=1)
    markers for existing edges, so adjacency exclusion needs NO extra
    join), then ONE (a, b) hash aggregate sums weights and marker
    flags; candidates = marker-free pairs; the final sort runs on the
    already-reduced candidate set."""
    import ray.data
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks

    if num_partitions is None:
        num_partitions = _adaptive_partitions()
    scale = float(np.int64(1) << np.int64(32))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype="int64")
        d = batch["dst"].to_numpy(dtype="int64")
        if len(s) and min(s.min(initial=0), d.min(initial=0)) < 0:
            raise ValueError("adamic_adar_topk requires non-negative "
                             "node ids")
        df = pd.DataFrame({"z": np.concatenate([s, d]),
                           "x": np.concatenate([d, s])})
        df = df[df["z"] != df["x"]].drop_duplicates()
        df["_part"] = df["z"].to_numpy(dtype="int64") % num_partitions
        return df

    def wedge_kernel(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.drop_duplicates(["z", "x"]) \
            .sort_values(["z", "x"], kind="mergesort")
        z = g["z"].to_numpy(dtype="int64")
        x = g["x"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        a_out, b_out, w_out, n_trunc = [], [], [], 0
        for s, e in zip(starts, ends):
            m = e - s               # TRUE degree (weight uses this)
            if e - s > max_degree:
                n_trunc += 1
                e = s + max_degree  # smallest ids (sorted run)
            d = x[s:e]
            if len(d) < 2:
                continue
            wq = np.int64(np.floor(scale / np.log(m) + 0.5))
            iu = np.triu_indices(len(d), k=1)
            a_out.append(d[iu[0]])
            b_out.append(d[iu[1]])
            w_out.append(np.full(len(iu[0]), wq, dtype=np.int64))
        # existing-edge markers ride the same stream (each edge twice,
        # once per endpoint partition — the ne >= 1 filter is idempotent)
        ea = np.minimum(z, x)
        eb = np.maximum(z, x)
        a_out.append(ea)
        b_out.append(eb)
        w_out.append(np.zeros(len(ea), dtype=np.int64))
        edge = np.concatenate(
            [np.zeros(sum(len(v) for v in a_out[:-1]), dtype=np.int64),
             np.ones(len(ea), dtype=np.int64)])
        out = pd.DataFrame({"a": np.concatenate(a_out),
                            "b": np.concatenate(b_out),
                            "w": np.concatenate(w_out),
                            "edge": edge})
        if n_trunc:
            out = pd.concat([out, pd.DataFrame(
                {"a": [-1], "b": [-n_trunc], "w": [0], "edge": [0]})],
                ignore_index=True)
        return out.astype({"a": "int64", "b": "int64",
                           "w": "int64", "edge": "int64"})

    pairs = edges_ds.map_batches(fold, batch_format="pandas") \
        .groupby("_part").map_groups(wedge_kernel,
                                     batch_format="pandas") \
        .materialize()
    n_truncated = -int(pairs.filter(expr="a == -1").sum("b") or 0)
    agg = arrow_blocks(pairs.filter(expr="a >= 0")) \
        .groupby(["a", "b"]).aggregate(Sum("w", alias_name="aa_q"),
                                       Sum("edge", alias_name="ne"))
    cand = agg.filter(expr="ne == 0").filter(expr="aa_q > 0") \
        .drop_columns(["ne"])
    top = cand.sort(["aa_q", "a", "b"],
                    descending=[True, False, False]).limit(k)
    return top, n_truncated


def crawl_horizon(edges_ds, seeds, max_depth: int = 3,
                  num_partitions=None,
                  broadcast_max_nodes: int = 2_000_000):
    """BFS depth labeling from a seed set over the directed link graph
    — the crawl-horizon / depth-budget planning artifact (which pages
    a depth-``max_depth`` crawl from these seeds can reach, and how
    deep each sits). Returns (node, depth) — depth = minimum hop count
    from any seed, seeds at 0; unreached nodes are absent.

    Parallel BFS: per round ONE edges⋈frontier join (or a broadcast
    searchsorted filter below ``broadcast_max_nodes`` endpoints)
    produces the next neighbor set, minus everything already labeled.
    The frontier and the seen set only grow by newly-labeled nodes, so
    work is O(edges within the horizon) total, not per round.

    The broadcast path keeps the seen set driver-side as ONE sorted
    int64 array (bounded by the gate); the join path keeps both
    frontier and seen as Datasets — each round is edges⋈frontier
    (inner) then a seen anti-join, ids only, O(1) driver state.
    Both paths label identical sets (tested).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = _adaptive_partitions()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    if not len(seeds):
        raise ValueError("crawl_horizon: empty seed set")

    edges_ds = edges_ds.materialize()
    n_nodes = int(edges_ds.map_batches(
        lambda b: pd.DataFrame({"n": [b["src"].nunique()
                                      + b["dst"].nunique()]}),
        batch_format="pandas").sum("n") or 0)  # upper bound

    if n_nodes + len(seeds) <= broadcast_max_nodes:
        seen = seeds.copy()          # sorted
        frontier = seeds.copy()
        out_nodes = [seeds]
        out_depths = [np.zeros(len(seeds), dtype=np.int64)]
        for depth in range(1, max_depth + 1):
            fref = ray.put(frontier)
            sref = ray.put(seen)

            def nxt(batch: pd.DataFrame) -> pd.DataFrame:
                f = ray.get(fref)
                s = ray.get(sref)
                src = batch["src"].to_numpy(dtype="int64")
                dst = batch["dst"].to_numpy(dtype="int64")
                p = np.searchsorted(f, src)
                ok = (p < len(f))
                ok[ok] &= f[p[ok]] == src[ok]
                cand = np.unique(dst[ok])
                q = np.searchsorted(s, cand)
                new = (q >= len(s))
                new[~new] |= s[q[~new]] != cand[~new]
                return pd.DataFrame({"node": cand[new]})

            nxt_pd = edges_ds.map_batches(
                nxt, batch_format="pandas").to_pandas()
            frontier = np.unique(
                nxt_pd["node"].to_numpy(dtype="int64")) \
                if len(nxt_pd) else np.array([], dtype=np.int64)
            if not len(frontier):
                break
            seen = np.union1d(seen, frontier)
            out_nodes.append(frontier)
            out_depths.append(np.full(len(frontier), depth,
                                      dtype=np.int64))
        return ray.data.from_pandas(pd.DataFrame({
            "node": np.concatenate(out_nodes),
            "depth": np.concatenate(out_depths)}))

    # join path: frontier / seen as Datasets, ids only
    frontier = ray.data.from_pandas(pd.DataFrame({"node": seeds}))
    labeled = ray.data.from_pandas(pd.DataFrame({
        "node": seeds, "depth": np.zeros(len(seeds),
                                         dtype=np.int64)})) \
        .materialize()
    for depth in range(1, max_depth + 1):
        # neighbors of the frontier (ids only move)
        nbr = safe_join(edges_ds, frontier, "inner", num_partitions,
                        ("src",), right_on=("node",))

        def to_node(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": pd.unique(batch["dst"].to_numpy(dtype="int64"))})

        cand = arrow_blocks(
            nbr.map_batches(to_node, batch_format="pandas")) \
            .groupby("node").aggregate(Count(alias_name="_c")) \
            .drop_columns(["_c"])
        # anti-join vs labeled: left_outer + null filter on depth
        j = safe_join(cand, labeled, "left_outer", num_partitions,
                      ("node",))

        def only_new(batch: pd.DataFrame, depth=depth) -> pd.DataFrame:
            new = batch[batch["depth"].isna()] if "depth" in batch \
                else batch
            return pd.DataFrame({
                "node": new["node"].astype("int64"),
                "depth": np.full(len(new), depth, dtype=np.int64)})

        fresh = j.map_batches(only_new,
                              batch_format="pandas").materialize()
        if fresh.count() == 0:
            break
        labeled = labeled.union(fresh).materialize()
        frontier = fresh.drop_columns(["depth"])
    return labeled


def random_walks(edges_ds, walk_len: int = 4, num_partitions=None):
    """DeepWalk-style random-walk corpus generation (Perozzi et al.
    2014) — the graph-embedding training-data prep: one walk per
    node, ``walk_len`` hops, next hop drawn from the current node's
    sorted out-neighbors by the md5 rule

        nbr_rank = int(md5(f"{start}:{step}")[:8], 16) % out_degree

    (deterministic => partitioning-invariant => SQL-replayable by
    unrolling the steps; a walk stops early at a dangling node).
    Returns (start, step, node) rows — step 0 is the start itself.

    Scale shape: the adjacency builds once — ONE src-hash partition
    sweep assigns each edge its per-src sorted neighbor rank (the
    contiguous-run kernel cocitation uses) — then each hop is ONE
    hash join of the walk frontier against (src, rank) adjacency
    rows; only (start, node) int64 pairs move per hop.
    """
    import hashlib

    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = _adaptive_partitions()

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "src": batch["src"].to_numpy(dtype="int64"),
            "dst": batch["dst"].to_numpy(dtype="int64")}) \
            .drop_duplicates()
        df["_part"] = df["src"] % num_partitions
        return df

    def rank_kernel(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.drop_duplicates(["src", "dst"]) \
            .sort_values(["src", "dst"], kind="mergesort")
        src = g["src"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        reps = np.r_[starts[1:], len(src)] - starts
        out = g[["src", "dst"]].copy()
        out["r"] = (np.arange(len(src), dtype="int64")
                    - np.repeat(starts, reps))
        out["d"] = np.repeat(reps, reps).astype("int64")
        return out

    adj = edges_ds.map_batches(fold, batch_format="pandas") \
        .groupby("_part").map_groups(rank_kernel,
                                     batch_format="pandas") \
        .materialize()

    # walk state: (start, cur); step 0 rows = the starts themselves
    starts = arrow_blocks(adj).groupby("src") \
        .aggregate(Count(alias_name="_c")).drop_columns(["_c"])

    def init(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype="int64")
        return pd.DataFrame({"start": s, "cur": s})

    frontier = starts.map_batches(init, batch_format="pandas") \
        .materialize()
    out_parts = [frontier.map_batches(
        lambda b: pd.DataFrame({"start": b["start"],
                                "step": np.int64(0),
                                "node": b["cur"]}),
        batch_format="pandas")]

    for step in range(1, walk_len + 1):
        # pick each walk's neighbor rank, join against adjacency
        def want(batch: pd.DataFrame, step=step) -> pd.DataFrame:
            st = batch["start"].to_numpy(dtype="int64")
            h = np.array([int(hashlib.md5(
                f"{s}:{step}".encode()).hexdigest()[:8], 16)
                for s in st], dtype="int64")
            return pd.DataFrame({"start": st,
                                 "cur": batch["cur"]
                                 .to_numpy(dtype="int64"),
                                 "h": h})

        j = safe_join(frontier.map_batches(want,
                                           batch_format="pandas"),
                      adj, "inner", num_partitions,
                      ("cur",), right_on=("src",))

        def pick(batch: pd.DataFrame, step=step) -> pd.DataFrame:
            sel = batch[batch["r"] == batch["h"] % batch["d"]]
            return pd.DataFrame({
                "start": sel["start"].astype("int64"),
                "step": np.full(len(sel), step, dtype="int64"),
                "node": sel["dst"].astype("int64")})

        stepped = j.map_batches(pick,
                                batch_format="pandas").materialize()
        if stepped.count() == 0:
            break
        out_parts.append(stepped)
        frontier = stepped.map_batches(
            lambda b: pd.DataFrame({"start": b["start"],
                                    "cur": b["node"]}),
            batch_format="pandas").materialize()

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out


def wcc_append(labels_ds, new_edges_ds, num_partitions=None,
               max_iters: int = 64):
    """Incremental weakly-connected components — fold NEW edges into a
    standing (node, component) labeling without re-shipping the
    original edge multiset (the recrawl-generation graph update).
    Correctness: a partition's star edges (node -> its component id)
    preserve connectivity exactly, so CC over (star edges ∪ delta)
    equals CC over (original ∪ delta). Cost is O(labeled nodes +
    delta edges) — node-bounded, not edge-bounded; component merges
    can span the whole graph, so no algorithm can be o(affected
    nodes), but the original edges (usually >> nodes) never move
    again. Returns fresh min-id (node, component) labels covering
    old and new nodes."""
    from warcio_ray.ops.dedup import N_CC_PARTITIONS, \
        connected_components_ds

    def star(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": batch["node"].to_numpy(dtype="int64"),
            "b": batch["component"].to_numpy(dtype="int64")})

    def to_ab(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": batch["src"].to_numpy(dtype="int64"),
            "b": batch["dst"].to_numpy(dtype="int64")})

    edges = labels_ds.map_batches(star, batch_format="pandas") \
        .union(new_edges_ds.map_batches(to_ab,
                                        batch_format="pandas"))
    labeled = connected_components_ds(
        edges, num_partitions=num_partitions or N_CC_PARTITIONS,
        max_iters=max_iters)

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"doc_id": "node",
                                     "cluster_id": "component"})

    return labeled.map_batches(rename, batch_format="pandas")


def strongly_connected_components(edges_ds,
                                  broadcast_max_nodes: int = 2_000_000,
                                  max_inner: int = 256,
                                  max_outer: int = 64):
    """Strongly connected components of a DIRECTED (src, dst) edge
    Dataset — the web-spam / link-farm structural unit (the giant SCC
    vs IN/OUT "bowtie" of Broder et al., WWW 2000; mutual-reachability
    clusters are where reciprocal link schemes live, cf. the
    reciprocity signal above). WCC (``weakly_connected_components``)
    ignores direction; this does not. No reference counterpart —
    webgraph operator per the build brief.

    Algorithm: forward-backward min-label peeling. Per outer round,
    over the still-unsettled subgraph,

        F(u) = min node id forward-reachable from u (incl. u)
        B(u) = min node id that reaches u backward (incl. u)

    each computed by min-label propagation to fixpoint (F flows
    AGAINST edge direction: F(u) <- min(F(u), F(v)) per edge u->v; B
    flows with it). F and B are constant on an SCC (its members share
    both reachable sets), and F(u) == B(u) == m proves u and m mutually
    reachable, so every node with F == B settles with scc_id = F —
    provably the minimum id of its SCC (any smaller mutual partner
    would lower both F and B). Each round settles at least the SCC of
    the smallest unsettled id, so the loop terminates; on bowtie-shaped
    webgraphs the giant SCC plus everything that min-reaches it
    settles in round one.

    Scale shape: the BROADCAST path (the pagerank/HITS <= 2M-node
    gate): label vectors live on the driver, each propagation round is
    ONE streamed edge scan emitting per-batch (node, candidate-min)
    combines folded by a bounded ``tree_aggregate`` — no shuffle of
    the edge set, edges materialize once as narrow int64 pairs.
    Settled nodes drop out via a broadcast sorted-array filter inside
    the scan, never a re-materialization. Above the gate the same
    rounds run as edges-with-labels hash joins + groupby-min (the
    pagerank join-path analogue, ``_scc_join_path``: ids + int64
    labels only, O(1) driver state) — bit-identical output (min-label
    propagation has a unique least fixpoint, so every execution shape
    converges to the same labels).

    Returns a (node int64, scc_id int64) Dataset over every node that
    appears in any edge."""
    import ray
    import ray.data

    from warcio_ray.ops.blocks import tree_aggregate

    def fold_edges(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]].drop_duplicates()
        return df

    # narrow int64 pairs, scanned once per propagation round
    edges = edges_ds.map_batches(fold_edges,
                                 batch_format="pandas").materialize()

    def endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate(
            [batch["src"].to_numpy(dtype="int64"),
             batch["dst"].to_numpy(dtype="int64")]))
        return pd.DataFrame({"node": u})

    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    # distinct node universe as a DATASET (unbounded key space — a
    # driver fold would be O(n) driver state, exactly what the join
    # path exists to avoid); the broadcast branch collects it below,
    # bounded by the gate
    uni = arrow_blocks(
        edges.map_batches(endpoints, batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    n = uni.count()
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "scc_id": pd.Series(dtype="int64")}))
    if n > broadcast_max_nodes:
        return _scc_join_path(edges, uni, max_inner, max_outer)
    nodes = np.sort(uni.to_pandas()["node"].to_numpy(dtype="int64"))

    scc = np.full(n, -1, dtype=np.int64)

    def fixpoint(follow_src: bool) -> np.ndarray:
        """Min-label propagation to fixpoint over unsettled nodes.
        follow_src=True: label of dst flows to src (computes F);
        False: src's label flows to dst (computes B)."""
        lab = nodes.copy()
        lab[scc >= 0] = np.iinfo(np.int64).max  # settled: inert
        for _ in range(max_inner):
            ref = ray.put((nodes, lab))

            def proposals(batch: pd.DataFrame) -> pd.DataFrame:
                nds, lb = ray.get(ref)
                src = batch["src"].to_numpy(dtype="int64")
                dst = batch["dst"].to_numpy(dtype="int64")
                ps = np.searchsorted(nds, src)
                pdd = np.searchsorted(nds, dst)
                # drop edges with a settled endpoint (inert label)
                big = np.iinfo(np.int64).max
                keep = (lb[ps] != big) & (lb[pdd] != big)
                to_p, from_p = ((ps, pdd) if follow_src
                                else (pdd, ps))
                to_p, from_p = to_p[keep], from_p[keep]
                # LOCAL fixpoint over this batch's edge subset before
                # emitting: min-propagation is confluent (unique least
                # fixpoint), so extra within-batch hops only cut the
                # number of GLOBAL rounds (~partition-quotient
                # diameter instead of graph diameter), never change
                # the answer. Labels copy-on-write: lb is a shared
                # plasma read.
                loc = lb.copy()
                for _ in range(len(loc)):
                    prev = loc[to_p].copy()
                    np.minimum.at(loc, to_p, loc[from_p])
                    if np.array_equal(loc[to_p], prev):
                        break
                ut = np.unique(to_p)
                return pd.DataFrame({"p": ut, "neg": -loc[ut]})

            got = tree_aggregate(
                edges.map_batches(proposals, batch_format="pandas"),
                ["p"], maxs=("neg",))
            new = lab.copy()
            if len(got):
                p = got["p"].to_numpy(dtype="int64")
                cand = -got["neg"].to_numpy(dtype="int64")
                new[p] = np.minimum(new[p], cand)
            if np.array_equal(new, lab):
                return lab
            lab = new
        raise RuntimeError(f"SCC propagation exceeded {max_inner} "
                           "rounds (graph diameter too large)")

    for _ in range(max_outer):
        if (scc >= 0).all():
            break
        f = fixpoint(follow_src=True)
        b = fixpoint(follow_src=False)
        done = (scc < 0) & (f == b)
        if not done.any():
            raise RuntimeError("SCC peel made no progress")
        scc[done] = f[done]
    else:
        raise RuntimeError(f"SCC exceeded {max_outer} peel rounds")

    return ray.data.from_pandas(pd.DataFrame({"node": nodes,
                                              "scc_id": scc}))


def _scc_join_path(edges, nodes_ds, max_inner: int, max_outer: int):
    """Forward-backward min-label SCC peeling with CLUSTER-resident
    label state — the > ``broadcast_max_nodes`` branch of
    ``strongly_connected_components`` (same algorithm, same unique
    least fixpoint, hence bit-identical labels; tested bit-equal).

    Per outer round: one double hash-join restricts ``edges`` to the
    still-unsettled subgraph; each F/B propagation step is ONE
    edges⋈labels hash join + groupby-min + a bounded delta join for
    the convergence count (the pagerank join-path idiom — narrow int64
    rows only, O(1) driver state, every table materialized per step so
    lineage never stacks). Label folds use union + groupby-min/max
    instead of left-outer joins: an outer join's NaN fill would
    promote int64 labels through float64 (exact only to 2^53).

    Assumes nonnegative node ids (the -1 unsettled sentinel — the
    broadcast branch shares this contract)."""
    import ray
    import ray.data
    from ray.data.aggregate import Max

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    num_partitions = _adaptive_partitions()

    def init_lab(batch: pd.DataFrame) -> pd.DataFrame:
        nd = batch["node"].to_numpy(dtype="int64")
        return pd.DataFrame({"node": nd,
                             "scc": np.full(len(nd), -1, dtype="int64")})

    labels = nodes_ds.map_batches(init_lab,
                                  batch_format="pandas").materialize()
    n_total = labels.count()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = batch["node"].to_numpy().astype(np.uint64, copy=False)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def fixpoint(sub_edges, unsettled, follow_src: bool):
        """Min-label propagation to fixpoint: returns a (node, lab)
        Dataset over the unsettled nodes. Two shuffles per step — the
        edges⋈labels join (with a map-side per-batch min combiner on
        the proposal stream) and ONE key-hash partition sweep that
        folds old labels and proposals together, emitting the new
        label plus a changed indicator in the same pass."""
        lab = unsettled.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"].to_numpy(dtype="int64"),
                 "val": b["node"].to_numpy(dtype="int64")}),
            batch_format="pandas").materialize()
        to_col, from_col = (("src", "dst") if follow_src
                            else ("dst", "src"))
        for _ in range(max_inner):
            j = safe_join(sub_edges, lab, "inner", num_partitions,
                          (from_col,), right_on=("node",))

            def prop(batch: pd.DataFrame) -> pd.DataFrame:
                # per-batch min combiner: min-propagation is
                # confluent, so pre-folding only cuts shuffle volume
                d = pd.DataFrame({
                    "node": batch[to_col].to_numpy(dtype="int64"),
                    "val": batch["val"].to_numpy(dtype="int64")})
                d = d.groupby("node", sort=False,
                              as_index=False)["val"].min()
                d["old"] = np.int64(0)
                return d

            def tag_old(batch: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({
                    "node": batch["node"].to_numpy(dtype="int64"),
                    "val": batch["val"].to_numpy(dtype="int64"),
                    "old": np.ones(len(batch), dtype="int64")})

            merged = lab.map_batches(tag_old, batch_format="pandas") \
                .union(j.map_batches(prop, batch_format="pandas"))

            def sweep(part: pd.DataFrame) -> pd.DataFrame:
                part = part.drop(columns=["_part"])
                old = part[part["old"] == 1].set_index("node")["val"]
                new = part.groupby("node", sort=False)["val"].min() \
                    .reindex(old.index)
                return pd.DataFrame({
                    "node": old.index.to_numpy(dtype="int64"),
                    "val": new.to_numpy(dtype="int64"),
                    "_chg": (new < old).to_numpy().astype("int64")})

            upd = merged.map_batches(add_part, batch_format="pandas") \
                .groupby("_part") \
                .map_groups(sweep, batch_format="pandas").materialize()
            changed = int(upd.sum("_chg") or 0)
            lab = upd.drop_columns(["_chg"]).materialize()
            if changed == 0:
                return lab
        raise RuntimeError(f"SCC propagation exceeded {max_inner} "
                           "rounds (graph diameter too large)")

    for _ in range(max_outer):
        unsettled = labels.map_batches(
            lambda b: b[b["scc"] < 0][["node"]].astype("int64"),
            batch_format="pandas").materialize()
        if unsettled.count() == 0:
            break
        half = safe_join(edges, unsettled, "inner", num_partitions,
                         ("src",), right_on=("node",)) \
            .map_batches(lambda b: b[["src", "dst"]].astype("int64"),
                         batch_format="pandas")
        sub = safe_join(half, unsettled, "inner", num_partitions,
                        ("dst",), right_on=("node",)) \
            .map_batches(lambda b: b[["src", "dst"]].astype("int64"),
                         batch_format="pandas").materialize()
        f = fixpoint(sub, unsettled, follow_src=True)
        b = fixpoint(sub, unsettled, follow_src=False)
        fb = safe_join(f, b.map_batches(
            lambda t: t.rename(columns={"val": "bval"}),
            batch_format="pandas"), "inner", num_partitions, ("node",))

        def settle(batch: pd.DataFrame) -> pd.DataFrame:
            keep = (batch["val"].to_numpy(dtype="int64")
                    == batch["bval"].to_numpy(dtype="int64"))
            return pd.DataFrame(
                {"node": batch["node"].to_numpy(dtype="int64")[keep],
                 "scc": batch["val"].to_numpy(dtype="int64")[keep]})

        settled_new = fb.map_batches(settle,
                                     batch_format="pandas").materialize()
        if settled_new.count() == 0:
            raise RuntimeError("SCC peel made no progress")
        # scc ids are nonneg, sentinel is -1: a groupby-max merge
        # overwrites exactly the newly settled rows
        labels = arrow_blocks(labels.union(settled_new)) \
            .groupby("node").aggregate(Max("scc", alias_name="scc")) \
            .materialize()
    else:
        raise RuntimeError(f"SCC exceeded {max_outer} peel rounds")

    assert labels.count() == n_total
    return labels.map_batches(
        lambda t: t.rename(columns={"scc": "scc_id"}),
        batch_format="pandas")


def modularity_score(edges_ds, labels_ds,
                     broadcast_max_nodes: int = 2_000_000):
    """Newman modularity Q of a node partition over an UNDIRECTED
    graph — the standard partition-quality score (Newman & Girvan
    2004) for judging a mirror-cluster / community labeling before
    acting on it (e.g. collapsing hosts). Exact rational arithmetic:

        Q = sum_c [ L_c/m - (D_c/(2m))^2 ]
          = (4*m*sum_c L_c - sum_c D_c^2) / (4*m^2)

    with m = distinct undirected edges, L_c = intra-community edges,
    D_c = community degree sum — returned as the int64 pair (q_num,
    q_den), so the score is bit-exact, partitioning-invariant and
    SQL-replayable (no float division).

    Scale shape: edges fold to distinct (lo, hi) pairs map-side + one
    hash aggregate (the reciprocity precedent); labels broadcast under
    the pagerank <= 2M-node gate (above it the two label lookups run
    as pairs⋈labels hash joins — same per-pair fold, tested bit-equal);
    intra counts and degree sums fold through bounded combiner trees
    keyed by community. Driver state: O(nodes) under the gate,
    O(communities) after."""
    import ray
    from ray.data.aggregate import Max

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate

    labels_ds = labels_ds.materialize()
    n_lab = labels_ds.count()
    broadcast = n_lab <= broadcast_max_nodes
    if broadcast:
        lab = labels_ds.to_pandas().sort_values("node") \
            .reset_index(drop=True)
        lref = ray.put((lab["node"].to_numpy(dtype="int64"),
                        lab["component"].to_numpy(dtype="int64")))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        lo = np.minimum(df["src"].to_numpy(), df["dst"].to_numpy())
        hi = np.maximum(df["src"].to_numpy(), df["dst"].to_numpy())
        return pd.DataFrame({"lo": lo, "hi": hi,
                             "one": np.ones(len(lo), dtype="int64")}) \
            .drop_duplicates(["lo", "hi"])

    pairs = arrow_blocks(
        edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Max("one", alias_name="one"))

    if not broadcast:
        # join path: stamp (cl, ch) onto each distinct pair with two
        # narrow hash joins against the cluster-resident label table
        num_partitions = _adaptive_partitions()

        def cl_col(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b["node"].to_numpy(dtype="int64"),
                 "cl": b["component"].to_numpy(dtype="int64")})

        def ch_col(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": b["node"].to_numpy(dtype="int64"),
                 "ch": b["component"].to_numpy(dtype="int64")})

        labs = labels_ds
        j = safe_join(pairs, labs.map_batches(cl_col,
                                              batch_format="pandas"),
                      "inner", num_partitions, ("lo",),
                      right_on=("node",))
        j = j.map_batches(lambda b: b[["lo", "hi", "cl"]],
                          batch_format="pandas")
        pairs = safe_join(j, labs.map_batches(ch_col,
                                              batch_format="pandas"),
                          "inner", num_partitions, ("hi",),
                          right_on=("node",))

    def per_pair(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        if broadcast:
            nodes, comp = ray.get(lref)
            cl = comp[np.searchsorted(nodes, lo)]
            ch = comp[np.searchsorted(nodes, hi)]
        else:
            cl = batch["cl"].to_numpy(dtype="int64")
            ch = batch["ch"].to_numpy(dtype="int64")
        # each distinct undirected edge contributes: m += 1, one
        # degree to each endpoint's community, and an intra edge when
        # the labels agree
        deg = pd.DataFrame({"c": np.concatenate([cl, ch]),
                            "d": np.ones(2 * len(lo), dtype="int64"),
                            "li": np.zeros(2 * len(lo),
                                           dtype="int64")})
        intra = pd.DataFrame({"c": cl[cl == ch],
                              "d": np.zeros(int((cl == ch).sum()),
                                            dtype="int64"),
                              "li": np.ones(int((cl == ch).sum()),
                                            dtype="int64")})
        both = pd.concat([deg, intra], ignore_index=True)
        return both.groupby("c", sort=False).sum().reset_index()

    cs = tree_aggregate(pairs.map_batches(per_pair,
                                          batch_format="pandas"),
                        ["c"], sums=("d", "li"))
    m = int(cs["d"].sum()) // 2
    l_intra = int(cs["li"].sum())
    d2 = int((cs["d"].to_numpy(dtype="int64") ** 2).sum())
    if m == 0:
        return pd.DataFrame({"q_num": [0], "q_den": [1]}) \
            .astype("int64")
    return pd.DataFrame({"q_num": [4 * m * l_intra - d2],
                         "q_den": [4 * m * m]}).astype("int64")


def degree_assortativity(edges_ds, num_partitions=None) -> pd.DataFrame:
    """Newman (2002) degree assortativity of the undirected simple
    graph — does the web link rich-to-rich (r > 0, social-network
    shape) or hub-to-leaf (r < 0, the classic web shape)? The one-scalar
    topology fingerprint next to the degree histogram.

    Exact-rational contract: with M edges and per-edge endpoint
    degrees (j, k),

        r = (4*M*S_jk - S_sum^2) / (2*M*S_sq - S_sum^2)

    where S_jk = sum(j*k), S_sum = sum(j+k), S_sq = sum(j^2+k^2) — all
    exact integer sums, so the only float is the final division
    (rounded to 6 decimals, identical on both engines). Degenerate
    graphs (every degree equal) have a zero denominator -> r = 0.

    Shape at scale: one distinct-edge aggregate, one degree aggregate,
    two narrow edge⋈degree hash joins (the triangle-orientation join
    path — no node-sized state on any worker), then per-batch partial
    sums fold through the combiner tree to ONE row."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()

    def endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["lo"].to_numpy(), batch["hi"].to_numpy()])})

    deg_ds = arrow_blocks(und.map_batches(endpoints,
                                          batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="deg")).materialize()

    def deg_side(col):
        def rename(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                f"_n{col}": batch["node"].astype("int64"),
                f"_d{col}": batch["deg"].astype("int64")})
        return deg_ds.map_batches(rename, batch_format="pandas")

    j = safe_join(und, deg_side("lo"), "inner", num_partitions,
                  ("lo",), ("_nlo",))
    j = safe_join(j, deg_side("hi"), "inner", num_partitions,
                  ("hi",), ("_nhi",))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dj = batch["_dlo"].to_numpy(dtype="int64")
        dk = batch["_dhi"].to_numpy(dtype="int64")
        return pd.DataFrame([{
            "m": np.int64(len(dj)),
            "s_jk": np.int64((dj * dk).sum()),
            "s_sum": np.int64((dj + dk).sum()),
            "s_sq": np.int64((dj * dj + dk * dk).sum()),
            "_k": np.int64(0)}])

    sums = tree_aggregate(j.map_batches(partial, batch_format="pandas"),
                          ["_k"], sums=("m", "s_jk", "s_sum", "s_sq"))
    if len(sums) == 0:
        return pd.DataFrame([{"m": 0, "s_jk": 0, "s_sum": 0,
                              "s_sq": 0, "assort": 0.0}]) \
            .astype({"m": "int64", "s_jk": "int64", "s_sum": "int64",
                     "s_sq": "int64"})
    m = int(sums["m"].iloc[0])
    s_jk = int(sums["s_jk"].iloc[0])
    s_sum = int(sums["s_sum"].iloc[0])
    s_sq = int(sums["s_sq"].iloc[0])
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    r = round(num / den, 6) if den != 0 else 0.0
    return pd.DataFrame([{"m": m, "s_jk": s_jk, "s_sum": s_sum,
                          "s_sq": s_sq, "assort": r}]) \
        .astype({"m": "int64", "s_jk": "int64", "s_sum": "int64",
                 "s_sq": "int64"})


def transitivity(edges_ds, broadcast_max_nodes: int = 2_000_000,
                 num_partitions=None) -> pd.DataFrame:
    """Global transitivity (clustering coefficient) of the undirected
    simple graph: C = 3*T / W with T the triangle count and
    W = sum_v C(deg_v, 2) the wedge count — the companion scalar to
    ``degree_assortativity`` (assortativity says who links to whom by
    degree; transitivity says whether links CLOSE).

    Exact-integer contract: 3*T comes from the shared forward-
    algorithm triangle kernel (each triangle counted once, corners
    exploded = exactly 3T rows); W from the bounded degree histogram.
    The single float is the final rounded division.

    Returns ONE row (corners, wedges, transitivity): corners = 3T.
    """
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()

    def endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["lo"].to_numpy(), batch["hi"].to_numpy()])})

    deg_ds = arrow_blocks(und.map_batches(endpoints,
                                          batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="deg"))

    def wedge_partial(batch: pd.DataFrame) -> pd.DataFrame:
        dg = batch["deg"].to_numpy(dtype="int64")
        return pd.DataFrame([{"w": np.int64((dg * (dg - 1) // 2).sum()),
                              "_k": np.int64(0)}])

    wsum = tree_aggregate(
        deg_ds.map_batches(wedge_partial, batch_format="pandas"),
        ["_k"], sums=("w",))
    wedges = int(wsum["w"].iloc[0]) if len(wsum) else 0

    tri = _oriented_triangles(und, broadcast_max_nodes, num_partitions)
    corners = int(tri.count()) * 3
    c = round(corners / wedges, 6) if wedges else 0.0
    return pd.DataFrame([{"corners": corners, "wedges": wedges,
                          "transitivity": c}]) \
        .astype({"corners": "int64", "wedges": "int64"})


def local_clustering(edges_ds, broadcast_max_nodes: int = 2_000_000,
                     num_partitions=None):
    """Per-node local clustering coefficient c_v = 2*t_v / (d_v*(d_v-1))
    — the node-level companion of ``transitivity``: which PAGES sit in
    closed communities vs open hub fans (nav rings and link farms
    score ~1; genuine hubs score ~0 at high degree).

    Exact-integer contract: t_v from the shared triangle kernel
    (corner explode), d_v from the endpoint aggregate; the output
    carries (n_tri, deg) exactly and the rounded ratio. Nodes with
    degree < 2 are excluded (coefficient undefined).

    Shape: one distinct-edge aggregate, the triangle kernel, one
    corner count, one degree⋈triangle hash join. Returns
    (node, n_tri, deg, coef)."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()

    def endpoints(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["lo"].to_numpy(), batch["hi"].to_numpy()])})

    deg_ds = arrow_blocks(und.map_batches(endpoints,
                                          batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="deg"))

    tri = _oriented_triangles(und, broadcast_max_nodes, num_partitions)

    def corners(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [batch["u"].to_numpy(), batch["s"].to_numpy(),
             batch["t"].to_numpy()])})

    tri_ds = arrow_blocks(tri.map_batches(corners, batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="n_tri"))

    joined = safe_join(deg_ds, tri_ds, "left_outer", num_partitions,
                       ("node",))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        deg = batch["deg"].to_numpy(dtype="int64")
        nt = batch["n_tri"].fillna(0).to_numpy(dtype="int64") \
            if "n_tri" in batch else np.zeros(len(batch), dtype="int64")
        keep = deg >= 2
        deg, nt = deg[keep], nt[keep]
        node = batch["node"].to_numpy(dtype="int64")[keep]
        wedges = deg * (deg - 1) // 2
        coef = np.round(nt / wedges, 6)
        return pd.DataFrame({"node": node, "n_tri": nt, "deg": deg,
                             "coef": coef})

    return joined.map_batches(finish, batch_format="pandas")


def robustness_curve(edges_ds, rates=(30, 60, 90),
                     num_partitions=None) -> pd.DataFrame:
    """Percolation robustness curve: connected-component structure as
    edges thin — the webgraph fragility audit (a graph whose giant
    component survives random edge loss is navigationally robust; one
    that shatters depends on a few links). Edges are retained
    DETERMINISTICALLY per rate r: keep (lo, hi) iff
    md5(f"{lo}:{hi}") % 100 < r, so the curve is reproducible and
    SQL-replayable — no RNG.

    Per rate: one stateless hash filter over the canonical distinct
    edge set, the star-contraction WCC, and one bounded
    component-size aggregate. Returns one row per rate
    (rate, n_nodes, n_comp, giant) — nodes = labeled (non-isolated)
    nodes at that rate."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        out = out.drop_duplicates()
        out["bucket"] = [
            int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:8], 16)
            % 100
            for a, b in zip(out["lo"], out["hi"])]
        return out

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).max("bucket").materialize()

    rows = []
    for r in sorted(int(x) for x in rates):
        def keep(batch: pd.DataFrame, r=r) -> pd.DataFrame:
            m = batch["max(bucket)"].to_numpy() < r
            return pd.DataFrame({
                "src": batch["lo"].to_numpy(dtype="int64")[m],
                "dst": batch["hi"].to_numpy(dtype="int64")[m]})

        sub = und.map_batches(keep, batch_format="pandas")
        labels = weakly_connected_components(
            sub, num_partitions=num_partitions)
        sizes = arrow_blocks(labels).groupby("component") \
            .aggregate(Count(alias_name="s")).to_pandas()
        if len(sizes):
            rows.append((r, int(sizes["s"].sum()), len(sizes),
                         int(sizes["s"].max())))
        else:
            rows.append((r, 0, 0, 0))
    return pd.DataFrame(rows, columns=["rate", "n_nodes", "n_comp",
                                       "giant"]).astype("int64")


def bowtie_decomposition(edges_ds, max_depth: int = 64,
                         num_partitions=None) -> pd.DataFrame:
    """Broder bowtie decomposition (Broder et al., WWW 2000): the
    canonical macroscopic web map — the largest SCC is the CORE, IN =
    nodes that can reach the core, OUT = nodes the core can reach,
    OTHER = tendrils/disconnected. Crawl planning reads this directly:
    seeds in IN discover the core; seeds in OUT never escape it.

    Composition of verified kernels: the forward-backward SCC labels
    pick the core (size desc, label asc); two parallel BFS sweeps
    (``crawl_horizon`` forward and on the reversed edges) mark
    OUT/IN; region assignment is two id-only hash joins. ``max_depth``
    must exceed the graph diameter (BFS exhausts earlier and stops —
    64 covers any web-shaped test graph; raise for pathological
    chains). The core seed list broadcasts (the crawl_horizon seed
    contract — the giant SCC of a web graph is the one component
    worth broadcasting; a join-path seeding is the swap above it).

    Returns (region, n_nodes), regions core/in/out/other over every
    node incident to an edge."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    labels = strongly_connected_components(edges_ds).materialize()
    sizes = arrow_blocks(labels).groupby("scc_id") \
        .aggregate(Count(alias_name="s"))
    top = sizes.sort(["s", "scc_id"], descending=[True, False]) \
        .limit(1).to_pandas()
    core_id = int(top["scc_id"].iloc[0])

    def core_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.loc[batch["scc_id"] == core_id, ["node"]]

    core_ids = labels.map_batches(core_only, batch_format="pandas") \
        .to_pandas()["node"].astype("int64").tolist()

    fwd = crawl_horizon(edges_ds, core_ids, max_depth=max_depth,
                        num_partitions=num_partitions)

    def rev(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": batch["dst"].to_numpy(dtype="int64"),
                             "dst": batch["src"].to_numpy(dtype="int64")})

    bwd = crawl_horizon(edges_ds.map_batches(rev, batch_format="pandas"),
                        core_ids, max_depth=max_depth,
                        num_partitions=num_partitions)

    def flag(name):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": batch["node"].astype("int64"),
                name: np.int64(1)})
        return f

    j = safe_join(labels, fwd.map_batches(flag("_f"),
                                          batch_format="pandas"),
                  "left_outer", num_partitions, ("node",))
    j = safe_join(j, bwd.map_batches(flag("_b"),
                                     batch_format="pandas"),
                  "left_outer", num_partitions, ("node",))

    def region(batch: pd.DataFrame) -> pd.DataFrame:
        scc = batch["scc_id"].to_numpy(dtype="int64")
        f = batch["_f"].notna().to_numpy() if "_f" in batch \
            else np.zeros(len(batch), dtype=bool)
        b = batch["_b"].notna().to_numpy() if "_b" in batch \
            else np.zeros(len(batch), dtype=bool)
        r = np.where(scc == core_id, "core",
                     np.where(f, "out", np.where(b, "in", "other")))
        return pd.DataFrame({"region": r})

    counts = arrow_blocks(j.map_batches(region, batch_format="pandas")) \
        .groupby("region").aggregate(Count(alias_name="n_nodes")) \
        .to_pandas()
    return counts.sort_values("region").reset_index(drop=True) \
        .astype({"n_nodes": "int64"})


def label_propagation(edges_ds, rounds: int = 4,
                      num_partitions: Optional[int] = None):
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    the DETERMINISTIC sync variant): over the undirected simple graph,
    every node starts as its own label and each round adopts the label
    most frequent among its neighbors PLUS one self-vote, ties by
    smallest label. A fixed round count (not convergence) keeps the
    sync variant oscillation-free and makes the whole computation an
    unrolled finite circuit — partitioning-invariant and SQL-replayable
    round by round (the community counterpart of the pagerank/k-truss
    generated-CTE oracles; modularity_score judges the result).

    Scale shape (the _scc_join_path idiom — no broadcast gate needed):
    edges fold once to distinct (lo, hi) pairs; per round ONE
    edges⋈labels hash join streams (node, neighbor-label) votes and ONE
    key-hash partition sweep counts votes and takes the (count DESC,
    label ASC) argmax per node with vectorized pandas — narrow int64
    rows only, O(1) driver state, labels materialized per round so
    lineage never stacks.

    Returns a Dataset (node, community) over every non-isolated node.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    auto_np = num_partitions is None

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    if auto_np:
        num_partitions = _data_partitions(und.count())

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        return pd.DataFrame({"a": np.concatenate([lo, hi]),
                             "b": np.concatenate([hi, lo])})

    dir_edges = und.map_batches(both_dirs,
                                batch_format="pandas").materialize()

    def init_lab(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        u = np.unique(np.concatenate([lo, hi]))
        return pd.DataFrame({"node": u, "lab": u})

    labels = arrow_blocks(und.map_batches(init_lab,
                                          batch_format="pandas")) \
        .groupby("node").aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"].to_numpy(dtype="int64"),
                 "lab": b["node"].to_numpy(dtype="int64")}),
            batch_format="pandas").materialize()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = batch["node"].to_numpy().astype(np.uint64, copy=False)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def vote_sweep(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_part"])
        cnt = part.groupby(["node", "lab"], sort=False) \
            .size().reset_index(name="c")
        cnt = cnt.sort_values(["node", "c", "lab"],
                              ascending=[True, False, True],
                              kind="mergesort")
        win = cnt.groupby("node", sort=False).head(1)
        return pd.DataFrame({
            "node": win["node"].to_numpy(dtype="int64"),
            "lab": win["lab"].to_numpy(dtype="int64")})

    for _ in range(rounds):
        j = safe_join(dir_edges, labels, "inner", num_partitions,
                      ("b",), right_on=("node",))

        def nbr_votes(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": batch["a"].to_numpy(dtype="int64"),
                "lab": batch["lab"].to_numpy(dtype="int64")})

        votes = j.map_batches(nbr_votes, batch_format="pandas") \
            .union(labels)                       # one self-vote each
        labels = votes.map_batches(add_part, batch_format="pandas") \
            .groupby("_part") \
            .map_groups(vote_sweep, batch_format="pandas").materialize()

    return labels.map_batches(
        lambda t: t.rename(columns={"lab": "community"}),
        batch_format="pandas")


def landmark_distances(edges_ds, n_landmarks: int = 4,
                       max_depth: int = 6,
                       num_partitions: Optional[int] = None):
    """EXACT BFS distance histograms from a deterministic landmark set
    — the pivot-based complement to the HyperBall estimate (landmark /
    pivot BFS is how web-graph studies compute distance distributions
    when all-pairs is off the table): from each of the ``n_landmarks``
    smallest node ids, the number of nodes at every hop distance
    0..``max_depth`` over the undirected simple graph.

    All-integer, hence partitioning-invariant and replayable by a
    depth-capped recursive-CTE oracle (the robustness_curve closure
    precedent).

    Scale shape: the frontier table (landmark, node, dist) holds at
    most n_landmarks x |V| rows; each hop is ONE frontier⋈edges hash
    join + ONE (landmark, node) groupby-min (first reach wins — BFS
    order IS the round order), with a map-side min combiner in the
    join projection. The output fold is a bounded (landmark, dist)
    count aggregate. No node-sized driver state; the landmark pick is
    a distributed min-k over the node universe.

    Returns a Dataset (landmark, dist, n_nodes)."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Min

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    auto_np = num_partitions is None

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    if auto_np:
        num_partitions = _data_partitions(und.count())

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        return pd.DataFrame({"a": np.concatenate([lo, hi]),
                             "b": np.concatenate([hi, lo])})

    dir_edges = und.map_batches(both_dirs,
                                batch_format="pandas").materialize()

    # landmark pick: per-batch min-k partials -> driver min-k (k tiny)
    def node_mins(batch: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(np.concatenate(
            [batch["lo"].to_numpy(dtype="int64"),
             batch["hi"].to_numpy(dtype="int64")]))
        return pd.DataFrame({"node": u[:n_landmarks]})

    cand = und.map_batches(node_mins, batch_format="pandas").to_pandas()
    landmarks = np.sort(np.unique(
        cand["node"].to_numpy(dtype="int64")))[:n_landmarks]
    if len(landmarks) == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"landmark": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64"),
             "n_nodes": pd.Series(dtype="int64")}))

    dist = ray.data.from_pandas(pd.DataFrame({
        "landmark": landmarks,
        "node": landmarks,
        "dist": np.zeros(len(landmarks), dtype="int64")})).materialize()
    frontier = dist  # hop d joins ONLY the nodes first reached at d-1

    for d in range(1, max_depth + 1):
        j = safe_join(dir_edges, frontier, "inner", num_partitions,
                      ("b",), right_on=("node",))

        def expand(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "landmark": batch["landmark"].to_numpy(dtype="int64"),
                "node": batch["a"].to_numpy(dtype="int64"),
                "dist": batch["dist"].to_numpy(dtype="int64") + 1})
            # map-side combiner: one proposal per key per batch
            return out.drop_duplicates(["landmark", "node"])

        cand_ds = j.map_batches(expand, batch_format="pandas")
        dist = arrow_blocks(dist.union(cand_ds)) \
            .groupby(["landmark", "node"]) \
            .aggregate(Min("dist", alias_name="dist")).materialize()
        # newly settled rows are exactly those whose min dist == d
        frontier = dist.map_batches(
            lambda b, _d=d: b[b["dist"] == _d],
            batch_format="pandas").materialize()
        if frontier.count() == 0:
            break

    hist = arrow_blocks(dist).groupby(["landmark", "dist"]) \
        .aggregate(Count(alias_name="n_nodes"))
    return hist


def rich_club(edges_ds, degrees=(1, 2, 4, 8),
              num_partitions: Optional[int] = None):
    """Rich-club coefficient profile (Colizza et al. 2006): for each
    degree threshold d, phi(d) = 2*E_d / (N_d*(N_d-1)) where N_d
    counts nodes of degree > d in the undirected simple graph and E_d
    the edges BETWEEN them — do the web's hubs link to each other
    (phi -> 1) or only downward (phi -> 0)? The one-table complement
    to assortativity's single scalar.

    Exact-rational contract: returned as (d, n_nodes, n_edges,
    phi_num, phi_den) with phi = phi_num/phi_den = 2*E_d scaled
    against the exact pair count — all int64, partitioning-invariant,
    by-definition SQL oracle.

    Shape at scale: one distinct-edge fold, one degree aggregate, two
    narrow edges⋈degree hash joins (the assortativity idiom), then a
    bounded per-threshold count fold — no node-sized worker or driver
    state; thresholds are a tiny static list, so the per-threshold
    masks ride the same joined stream."""
    import ray
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    if num_partitions is None:
        num_partitions = _data_partitions(und.count())

    def ends(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        return pd.DataFrame({"node": np.concatenate([lo, hi]),
                             "d": np.ones(2 * len(lo), dtype="int64")})

    deg = arrow_blocks(und.map_batches(ends, batch_format="pandas")) \
        .groupby("node").aggregate(Sum("d", alias_name="d")) \
        .materialize()

    # per-threshold node counts: bounded fold over the degree table
    def node_partial(batch: pd.DataFrame) -> pd.DataFrame:
        dv = batch["d"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "thr": np.array(list(degrees), dtype="int64"),
            "n_nodes": np.array([(dv > t).sum() for t in degrees],
                                dtype="int64")})

    nodes_tbl = tree_aggregate(
        deg.map_batches(node_partial, batch_format="pandas"),
        ["thr"], sums=("n_nodes",))

    # stamp both endpoint degrees, then fold per-threshold edge counts
    j = safe_join(und, deg.map_batches(
        lambda b: b.rename(columns={"node": "lo", "d": "dlo"}),
        batch_format="pandas"), "inner", num_partitions, ("lo",))
    j = safe_join(j.map_batches(lambda b: b[["lo", "hi", "dlo"]],
                                batch_format="pandas"),
                  deg.map_batches(
        lambda b: b.rename(columns={"node": "hi", "d": "dhi"}),
        batch_format="pandas"), "inner", num_partitions, ("hi",))

    def edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
        dlo = batch["dlo"].to_numpy(dtype="int64")
        dhi = batch["dhi"].to_numpy(dtype="int64")
        return pd.DataFrame({
            "thr": np.array(list(degrees), dtype="int64"),
            "n_edges": np.array([((dlo > t) & (dhi > t)).sum()
                                 for t in degrees], dtype="int64")})

    edges_tbl = tree_aggregate(
        j.map_batches(edge_partial, batch_format="pandas"),
        ["thr"], sums=("n_edges",))

    out = nodes_tbl.merge(edges_tbl, on="thr", how="left")
    out["n_edges"] = out["n_edges"].fillna(0).astype("int64")
    out = out.sort_values("thr").reset_index(drop=True)
    out["phi_num"] = 2 * out["n_edges"]
    out["phi_den"] = (out["n_nodes"] * (out["n_nodes"] - 1)) \
        .clip(lower=1)
    return out.rename(columns={"thr": "d"}).astype("int64")
