"""Distributed crawl: sharded actors for frontier state, Dataset stages
for the wide work.

Mapping (SURVEY §2.6 / §7):
  * URL-seen set  -> ``SeenShardActor`` per url-hash shard (counting bloom
    + cuckoo), reached via ``groupby("shard").map_groups`` so each shard's
    candidates hit its actor in the canonical (-priority, surt) order
  * politeness    -> ``PolitenessShardActor`` per host-hash shard (token
    buckets + robots cache + deferred queues)
  * fetch + parse + link extraction -> ``map_batches`` over the scheduled
    rows with the pages table broadcast once via ``ray.put`` (the
    bench-scale alternative — hash-join on url against the pages dataset —
    is the same stage with a repartition instead of a broadcast)
  * OPIC cash aggregation -> ``groupby("url_hash").map_groups`` summing in
    (src_shard, src_seq) order, bitwise-identical to the reference

Only tiny url rows ever shuffle; html payloads stay inside the fetch
stage. Crawl order and the final seen-set are bit-identical to
``reference.crawl_reference`` under the same config — enforced by
tests/test_frontier_distributed.py.

Checkpointing: after each round the driver writes every actor's snapshot
plus the next-round candidates to ``checkpoint_dir/round=K/``; resuming
rebuilds actors from the latest complete round and replays forward,
producing the same final state as an uninterrupted run.
"""

from __future__ import annotations

import os
import pickle
import shutil
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd

from warcio_ray.frontier.filters import SeenSet
from warcio_ray.frontier.politeness import (
    HostState,
    RobotsRules,
    TokenBucket,
    path_of_url,
)
from warcio_ray.frontier.rounds import (
    Candidate,
    CrawlConfig,
    aggregate_canonical,
    canonicalize_contributions,
    outlink_contributions,
    politeness_select,
    seeds_to_candidates,
)
from warcio_ray.frontier.surt import url_hash64

CAND_COLUMNS = ["url_hash", "url", "surt", "host", "priority"]


def _actor_classes():
    """Define actor classes lazily so importing this module needs no Ray."""
    import ray

    # state actors reserve ~no CPU: they are RPC-driven index holders, and
    # reserving real CPUs deadlocks small sessions (16 shards x 0.25 cpu
    # exceeded a 2-cpu session before any work ran)
    @ray.remote(num_cpus=0.01)
    class SeenShardActor:
        """One url-hash shard of the seen set."""

        def __init__(self, expected: int, seed: int,
                     snapshot: Optional[bytes] = None):
            self.seen = (SeenSet.from_bytes(snapshot) if snapshot
                         else SeenSet.create(expected, seed=seed))

        def filter_new(self, rows: List[tuple]) -> List[tuple]:
            """rows pre-sorted by (-priority, surt); returns admitted."""
            return [r for r in rows if self.seen.add_if_new(int(r[0]))]

        def snapshot(self) -> bytes:
            return self.seen.to_bytes()

    @ray.remote(num_cpus=0.01)
    class PolitenessShardActor:
        """One host-hash shard of politeness state."""

        def __init__(self, config: CrawlConfig,
                     robots_bodies: Optional[Dict[str, str]] = None,
                     snapshot: Optional[bytes] = None):
            self.config = config
            self.robots_bodies = robots_bodies or {}
            self.hosts: Dict[str, HostState] = {}
            if snapshot:
                self._restore(snapshot)

        def _host_state(self, host: str) -> HostState:
            if host not in self.hosts:
                self.hosts[host] = HostState(
                    bucket=TokenBucket(self.config.host_capacity,
                                       self.config.host_refill,
                                       self.config.host_capacity),
                    robots=RobotsRules.parse(self.robots_bodies.get(host)))
            return self.hosts[host]

        def enqueue_and_select(self, rows: List[tuple]) -> Tuple[List[tuple], int]:
            """Admitted candidate rows (url_hash, url, surt, host, priority)
            -> (selected rows, robots_denied count). Keeps deferrals."""
            denied = 0
            for url_hash, url, s, host, priority in rows:
                st = self._host_state(host)
                if not st.robots.allowed(path_of_url(url)):
                    denied += 1
                    continue
                st.pending.append((priority, s, int(url_hash), url))
            selected: List[tuple] = []
            for host in sorted(self.hosts):
                st = self.hosts[host]
                if not st.pending:
                    continue
                st.bucket.start_round()
                want = len(st.pending)
                cap = st.robots.per_round_cap(self.config.round_seconds)
                if cap is not None:
                    want = min(want, cap)
                grant = st.bucket.take(want)
                chosen, deferred = politeness_select(st.pending, grant)
                st.pending = deferred
                for priority, s, h, url in chosen:
                    selected.append((h, url, s, host, priority))
            return selected, denied

        def has_pending(self) -> bool:
            return any(st.pending for st in self.hosts.values())

        def snapshot(self) -> bytes:
            return pickle.dumps({
                host: (st.bucket.capacity, st.bucket.refill, st.bucket.tokens,
                       st.robots.rules, st.robots.crawl_delay, st.pending)
                for host, st in self.hosts.items()}, protocol=4)

        def _restore(self, blob: bytes) -> None:
            for host, (cap, refill, tokens, rules, delay, pending) in \
                    pickle.loads(blob).items():
                self.hosts[host] = HostState(
                    bucket=TokenBucket(cap, refill, tokens),
                    robots=RobotsRules(rules=rules, crawl_delay=delay),
                    pending=list(pending))

    @ray.remote(num_cpus=0.5)
    class FetchActor:
        """Persistent fetch worker: the broadcast pages dict is loaded
        ONCE per actor (``ray.get`` of the driver's ``ray.put``) and
        reused every round — no per-round pool spin-up. Does the
        parallelizable work: lookup, link extraction, outlink cash,
        canonicalization."""

        def __init__(self, pages_ref, config: CrawlConfig):
            from warcio_ray.html import extract_links
            # Ray resolves top-level ObjectRef args before __init__ runs,
            # so the broadcast dict usually arrives materialized already
            self.pages = (ray.get(pages_ref)
                          if isinstance(pages_ref, ray.ObjectRef)
                          else pages_ref)
            self.config = config
            self.extract_links = extract_links

        def fetch(self, rows: List[tuple]):
            """rows: (shard, seq, url_hash, url, host, priority) ->
            (hits, discovered, canonical contribution rows)."""
            hits = 0
            discovered = 0
            contribs: List[tuple] = []
            for shard, seq, url_hash, url, host, priority in rows:
                html = self.pages.get(url)
                if html is None:
                    continue
                hits += 1
                links = self.extract_links(html)
                discovered += len(links)
                contribs.extend(outlink_contributions(
                    int(shard), int(seq), float(priority), links,
                    self.config))
            return hits, discovered, canonicalize_contributions(contribs)

    return SeenShardActor, PolitenessShardActor, FetchActor


@dataclass
class DistributedCrawlResult:
    order: List[tuple] = field(default_factory=list)
    admitted: List[int] = field(default_factory=list)
    counters: Dict[str, int] = field(default_factory=dict)
    rounds: int = 0
    # cumulative wall seconds per round phase (seen_filter, politeness,
    # schedule, fetch, aggregate) — a handful of floats, populated by
    # _run_round so a bench can report where round time actually goes
    timings: Dict[str, float] = field(default_factory=dict)


def _candidates_df(cands: Sequence[Candidate]) -> pd.DataFrame:
    df = pd.DataFrame(
        [(c.url_hash, c.url, c.surt, c.host, c.priority) for c in cands],
        columns=CAND_COLUMNS)
    if len(df):
        df["url_hash"] = df["url_hash"].astype("uint64")
    return df


def crawl_distributed(seeds: Sequence[Tuple[str, float]],
                      pages,
                      config: Optional[CrawlConfig] = None,
                      robots_bodies: Optional[Dict[str, str]] = None,
                      checkpoint_dir: Optional[str] = None,
                      resume: bool = False,
                      fetch_concurrency: int = 2,
                      order_dir: Optional[str] = None,
                      track_order: bool = False,
                      resident_fetch_max_bytes: Optional[int] = None
                      ) -> DistributedCrawlResult:
    """Run the crawl distributed; bit-identical to the reference crawl.

    ``pages`` is the simulated web: either a ``url -> html bytes`` dict
    (broadcast once to persistent fetch actors — test scale) or a STRING
    path to a url_hash-bucketed pages layout (``build_pages_bucketed``),
    in which case each round semi-joins its scheduled urls against only
    the buckets they hash into — the 100-TB fetch path.

    ``resident_fetch_max_bytes`` (default
    ``pipelines.crawl.RESIDENT_FETCH_MAX_BYTES``) caps how large a
    bucketed layout may be before the fetch switches from the
    object-store-resident group cache to the per-round bucket semi-join
    (``ScanFetcher``) — aggregate object-store residency then stays
    O(round), never O(corpus).

    ``checkpoint_dir`` enables per-round snapshots; ``resume=True`` picks
    up from the latest complete round found there. ``order_dir`` streams
    the crawl order to one parquet file per round (deterministic names,
    atomic rename) — at real scale that file set, NOT driver memory, is
    the order record; reruns overwrite byte-identically. The in-memory
    ``result.order``/``result.admitted`` lists are populated only with
    ``track_order=True`` (a debug/test flag: they grow with the crawl).
    """
    import ray
    import ray.data

    config = config or CrawlConfig()
    scan_mode = isinstance(pages, str)
    SeenShardActor, PolitenessShardActor, FetchActor = _actor_classes()

    start_round = 0
    result = DistributedCrawlResult(
        counters={"fetched": 0, "misses": 0, "robots_denied": 0,
                  "duplicates": 0, "discovered": 0})
    seen_snaps: List[Optional[bytes]] = [None] * config.num_shards
    pol_snaps: List[Optional[bytes]] = [None] * config.num_host_shards
    cand_df = _candidates_df(seeds_to_candidates(seeds))

    if resume and checkpoint_dir:
        latest = _latest_round(checkpoint_dir)
        if latest is not None:
            start_round, seen_snaps, pol_snaps, cand_df, result = \
                _load_checkpoint(checkpoint_dir, latest)

    seen_actors = [SeenShardActor.remote(config.seen_expected,
                                         config.seen_seed + s,
                                         snapshot=seen_snaps[s])
                   for s in range(config.num_shards)]
    pol_actors = [PolitenessShardActor.remote(config, robots_bodies,
                                              snapshot=pol_snaps[p])
                  for p in range(config.num_host_shards)]
    if scan_mode:
        from warcio_ray.pipelines.crawl import (
            RESIDENT_FETCH_MAX_BYTES,
            make_fetcher,
        )

        fetch_actors = []
        # corpus-size-aware: resident group cache for small layouts,
        # per-round bucket semi-join (O(round) residency) at scale
        fetcher = make_fetcher(
            pages, config,
            resident_fetch_max_bytes=(
                RESIDENT_FETCH_MAX_BYTES if resident_fetch_max_bytes is None
                else resident_fetch_max_bytes))
    else:
        pages_ref = ray.put(pages)
        fetch_actors = [FetchActor.remote(pages_ref, config)
                        for _ in range(max(1, fetch_concurrency))]
        fetcher = None

    try:
        rnd = start_round
        while rnd < config.max_rounds:
            if cand_df.empty and not any(ray.get(
                    [a.has_pending.remote() for a in pol_actors])):
                break
            cand_df, round_rows = _run_round(
                rnd, cand_df, seen_actors, pol_actors, fetch_actors,
                config, result, fetcher=fetcher,
                track_order=track_order)
            if order_dir:
                _write_round_order(order_dir, rnd, round_rows)
            rnd += 1
            result.rounds = rnd
            if checkpoint_dir:
                _write_checkpoint(checkpoint_dir, rnd, seen_actors,
                                  pol_actors, cand_df, result)
    finally:
        for a in seen_actors + pol_actors + fetch_actors:
            ray.kill(a)
    return result


def _run_round(rnd: int, cand_df: pd.DataFrame, seen_actors, pol_actors,
               fetch_actors, config: CrawlConfig,
               result: DistributedCrawlResult,
               fetcher=None,
               track_order: bool = False
               ) -> Tuple[pd.DataFrame, List[tuple]]:
    import time

    import ray
    import ray.data

    def _mark(phase: str, since: float) -> float:
        now = time.monotonic()
        result.timings[phase] = result.timings.get(phase, 0.0) \
            + (now - since)
        return now

    t = time.monotonic()
    # 1. seen filter: shard-partitioned, canonical order inside each shard
    admitted_rows: List[tuple] = []
    n_in = len(cand_df)
    if n_in:
        cand_df = cand_df.assign(
            shard=(cand_df["url_hash"].astype("uint64") % config.num_shards))
        filter_refs = []
        for shard, grp in cand_df.groupby("shard"):
            grp = grp.sort_values(["priority", "surt"],
                                  ascending=[False, True])
            rows = list(grp[CAND_COLUMNS].itertuples(index=False, name=None))
            filter_refs.append(seen_actors[int(shard)].filter_new.remote(rows))
        for rows in ray.get(filter_refs):
            admitted_rows.extend(rows)
    result.counters["duplicates"] += n_in - len(admitted_rows)
    # seen-hash lineage in admission order (shard asc, then canonical order)
    admitted_rows.sort(key=lambda r: (int(r[0]) % config.num_shards,
                                      -r[4], r[2]))
    if track_order:  # unbounded driver memory: debug/test only
        result.admitted.extend(int(r[0]) for r in admitted_rows)
    t = _mark("seen_filter", t)

    # 2+3. politeness: host-shard partitioned enqueue + select
    select_refs = []
    by_hs: Dict[int, List[tuple]] = {}
    for r in admitted_rows:
        by_hs.setdefault(config.host_shard_of(r[3]), []).append(r)
    for p, actor in enumerate(pol_actors):
        select_refs.append(actor.enqueue_and_select.remote(by_hs.get(p, [])))
    selected: List[tuple] = []
    for rows, denied in ray.get(select_refs):
        selected.extend(rows)
        result.counters["robots_denied"] += denied
    t = _mark("politeness", t)

    if not selected:
        return pd.DataFrame(columns=CAND_COLUMNS), []

    # 4. schedule: per url-hash shard, (-priority, surt) order, seq 0..
    sched = pd.DataFrame(selected, columns=CAND_COLUMNS)
    sched["shard"] = sched["url_hash"].astype("uint64") % config.num_shards
    sched = sched.sort_values(["shard", "priority", "surt"],
                              ascending=[True, False, True],
                              kind="mergesort").reset_index(drop=True)
    sched["seq"] = sched.groupby("shard").cumcount()

    # 5. fetch + parse + link extraction: bucketed-scan semi-join (scale
    # path) or persistent broadcast fetch actors (contiguous splits;
    # result merge order is deterministic either way)
    import numpy as np

    fetch_rows = list(sched[["shard", "seq", "url_hash", "url", "host",
                             "priority"]].itertuples(index=False, name=None))
    round_rows = [(rnd, int(s), int(q), int(h), url, host, float(p))
                  for s, q, h, url, host, p in fetch_rows]
    if track_order:
        result.order.extend(round_rows)
    t = _mark("schedule", t)

    if fetcher is not None:
        round_hits, discovered, all_contribs = fetcher.fetch_round(sched)
        result.counters["discovered"] += discovered
    else:
        chunks = np.array_split(np.arange(len(fetch_rows)),
                                len(fetch_actors))
        fetch_refs = [actor.fetch.remote([fetch_rows[i] for i in idx])
                      for actor, idx in zip(fetch_actors, chunks)
                      if len(idx)]
        all_contribs = []
        round_hits = 0
        for hits, discovered, contribs in ray.get(fetch_refs):
            round_hits += hits
            result.counters["discovered"] += discovered
            all_contribs.extend(contribs)
    result.counters["fetched"] += round_hits
    result.counters["misses"] += len(fetch_rows) - round_hits
    t = _mark("fetch", t)

    # 6. OPIC aggregation: in-process for small rounds, partition-sweep
    # Dataset fold at scale — both produce identical output (shared
    # sort-fsum semantics)
    next_cands = _aggregate(all_contribs, config)
    _mark("aggregate", t)
    return next_cands, round_rows


# above this many contribution rows, aggregation goes through a Dataset
# partition sweep instead of the driver (same output either way)
AGG_DATASET_THRESHOLD = 200_000


def _sweep_partition(part: pd.DataFrame) -> pd.DataFrame:
    """One key-hash partition of contribution rows -> one candidate row
    per url_hash: cash folded with math.fsum (exact, hence independent
    of arrival order), representative (url, surt, host) from the
    (src_shard, src_seq)-first row — bitwise-identical to
    ``aggregate_canonical`` on the same rows."""
    import math

    part = part.sort_values(["url_hash", "src_shard", "src_seq"],
                            kind="mergesort")
    g = part.groupby("url_hash", sort=True)
    first = g.head(1).set_index("url_hash")
    total = g["cash"].apply(lambda s: math.fsum(s.to_numpy()))
    return pd.DataFrame({
        "url_hash": first.index.to_numpy(),
        "url": first["url"].to_numpy(),
        "surt": first["surt"].to_numpy(),
        "host": first["host"].to_numpy(),
        "priority": total.reindex(first.index).to_numpy()})


def _aggregate(contribs, config: CrawlConfig) -> pd.DataFrame:
    """Canonical contribution rows -> next-round candidates DataFrame.

    ``contribs`` is either a driver list of tuples (broadcast /
    resident fetch modes) or a Dataset (the scan fetch mode, which
    keeps a round's per-link rows in the object store). Small rounds
    aggregate in-process via the shared ``aggregate_canonical`` (no
    Dataset overhead); big rounds fold with ONE key-hash partition
    sweep (the collapse_captures idiom — ~#CPU ``map_groups`` calls,
    NOT one per url_hash) whose kernel runs the identical per-key
    math.fsum. fsum is EXACT, hence order-independent -> identical
    floats on every path at every parallelism; only the aggregated
    frontier-sized candidate table ever reaches the driver.
    """
    import numpy as np
    import ray
    import ray.data

    is_ds = not isinstance(contribs, list)
    n = contribs.count() if is_ds else len(contribs)
    if n == 0:
        return pd.DataFrame(columns=CAND_COLUMNS)

    if n <= AGG_DATASET_THRESHOLD:
        if is_ds:
            rows = [tuple(r) for r in contribs.to_pandas()[
                ["url_hash", "url", "surt", "host", "src_shard",
                 "src_seq", "cash"]].itertuples(index=False, name=None)]
        else:
            rows = contribs
        return _candidates_df(aggregate_canonical(rows))

    if not is_ds:
        df = pd.DataFrame(contribs, columns=[
            "url_hash", "url", "surt", "host", "src_shard", "src_seq",
            "cash"])
        df["url_hash"] = df["url_hash"].astype("uint64")
        contribs = ray.data.from_pandas(df)

    num_partitions = min(
        64, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = batch["url_hash"].to_numpy().astype(np.uint64, copy=False)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def sweep(part: pd.DataFrame) -> pd.DataFrame:
        return _sweep_partition(part.drop(columns=["_part"]))

    out = contribs.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(sweep, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        return pd.DataFrame(columns=CAND_COLUMNS)
    out["url_hash"] = out["url_hash"].astype("uint64")
    return out.sort_values("url_hash").reset_index(drop=True)


ORDER_SCHEMA_COLS = ["round", "shard", "seq", "url_hash", "url", "host",
                     "priority"]


def _write_round_order(order_dir: str, rnd: int, rows: List[tuple]) -> None:
    """One parquet file per round, written atomically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(order_dir, exist_ok=True)
    df = pd.DataFrame(rows, columns=ORDER_SCHEMA_COLS)
    table = pa.table({
        "round": pa.array(df["round"], pa.int32()),
        "shard": pa.array(df["shard"], pa.int32()),
        "seq": pa.array(df["seq"], pa.int64()),
        "url_hash": pa.array(df["url_hash"].astype("uint64"), pa.uint64()),
        "url": pa.array(df["url"], pa.string()),
        "host": pa.array(df["host"], pa.string()),
        "priority": pa.array(df["priority"], pa.float64()),
    })
    final = os.path.join(order_dir, f"round={rnd:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


# ---------------------------------------------------------------------------
# checkpointing: one directory per completed round
# ---------------------------------------------------------------------------

def _round_dir(checkpoint_dir: str, rnd: int) -> str:
    return os.path.join(checkpoint_dir, f"round={rnd:05d}")


def _write_checkpoint(checkpoint_dir: str, rnd: int, seen_actors, pol_actors,
                      cand_df: pd.DataFrame,
                      result: DistributedCrawlResult) -> None:
    import ray

    d = _round_dir(checkpoint_dir, rnd)
    tmp = d + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    seen = ray.get([a.snapshot.remote() for a in seen_actors])
    pol = ray.get([a.snapshot.remote() for a in pol_actors])
    for i, blob in enumerate(seen):
        with open(os.path.join(tmp, f"seen-{i:04d}.bin"), "wb") as f:
            f.write(blob)
    for i, blob in enumerate(pol):
        with open(os.path.join(tmp, f"pol-{i:04d}.bin"), "wb") as f:
            f.write(blob)
    with open(os.path.join(tmp, "driver.pkl"), "wb") as f:
        pickle.dump({"round": rnd, "candidates": cand_df,
                     "order": result.order, "admitted": result.admitted,
                     "counters": result.counters}, f, protocol=4)
    shutil.rmtree(d, ignore_errors=True)
    os.replace(tmp, d)  # atomic round completion


def _latest_round(checkpoint_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoint_dir):
        return None
    rounds = [int(name.split("=")[1]) for name in os.listdir(checkpoint_dir)
              if name.startswith("round=") and not name.endswith(".tmp")]
    return max(rounds) if rounds else None


def _load_checkpoint(checkpoint_dir: str, rnd: int):
    d = _round_dir(checkpoint_dir, rnd)
    seen = []
    pol = []
    for name in sorted(os.listdir(d)):
        path = os.path.join(d, name)
        if name.startswith("seen-"):
            seen.append(open(path, "rb").read())
        elif name.startswith("pol-"):
            pol.append(open(path, "rb").read())
    with open(os.path.join(d, "driver.pkl"), "rb") as f:
        drv = pickle.load(f)
    result = DistributedCrawlResult(order=drv["order"],
                                    admitted=drv["admitted"],
                                    counters=drv["counters"], rounds=rnd)
    return rnd, seen, pol, drv["candidates"], result
