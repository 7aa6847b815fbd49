"""Single-node reference crawl — the deterministic contract.

Like warcio's golden files define its codec, this single-process crawl
defines the crawl order and URL-seen set that the distributed
implementation must reproduce bit-identically under the same seed list
and politeness budget (north_rule). It is intentionally plain Python:
one process, explicit state, every ordering delegated to the shared
round-step functions in rounds.py.

State layout mirrors the distributed sharding exactly (seen-set filter
per url-hash shard, politeness state per host-hash shard) so snapshots
are interchangeable between the two implementations.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

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
    aggregate_contributions,
    outlink_contributions,
    politeness_select,
    schedule,
    seeds_to_candidates,
    seen_order,
)

FetchFn = Callable[[str], Optional[bytes]]
RobotsFn = Callable[[str], Optional[str]]

# one crawl-order row: (round, shard, seq, url_hash, url, host, priority)
OrderRow = Tuple[int, int, int, int, str, str, float]

SNAPSHOT_VERSION = 1


@dataclass
class CrawlState:
    """Complete mutable crawl state; snapshot/restore round-trips exactly.

    ``admitted`` (the explicit seen-hash list) exists for verification:
    at real scale it would live in the per-round parquet output, not in
    driver memory — the filters alone drive admission decisions.
    """

    config: CrawlConfig
    seen: List[SeenSet] = field(default_factory=list)
    hosts: Dict[int, Dict[str, HostState]] = field(default_factory=dict)
    candidates: List[Candidate] = field(default_factory=list)
    round: int = 0
    order: List[OrderRow] = field(default_factory=list)
    admitted: List[int] = field(default_factory=list)
    counters: Dict[str, int] = field(default_factory=dict)

    @classmethod
    def create(cls, config: CrawlConfig,
               seeds: Sequence[Tuple[str, float]]) -> "CrawlState":
        state = cls(config=config)
        state.seen = [SeenSet.create(config.seen_expected,
                                     seed=config.seen_seed + s)
                      for s in range(config.num_shards)]
        state.hosts = {hs: {} for hs in range(config.num_host_shards)}
        state.candidates = seeds_to_candidates(seeds)
        state.counters = {"fetched": 0, "misses": 0, "robots_denied": 0,
                          "duplicates": 0, "discovered": 0}
        return state

    # -- snapshot (per-partition lineage: one blob per shard) -------------
    def snapshot(self) -> bytes:
        payload = {
            "version": SNAPSHOT_VERSION,
            "config": self.config,
            "seen": [s.to_bytes() for s in self.seen],
            "hosts": {
                hs: {
                    host: (st.bucket.capacity, st.bucket.refill,
                           st.bucket.tokens, st.robots.rules,
                           st.robots.crawl_delay, st.pending)
                    for host, st in shard.items()}
                for hs, shard in self.hosts.items()},
            "candidates": self.candidates,
            "round": self.round,
            "order": self.order,
            "admitted": self.admitted,
            "counters": self.counters,
        }
        return pickle.dumps(payload, protocol=4)

    @classmethod
    def restore(cls, blob: bytes) -> "CrawlState":
        payload = pickle.loads(blob)
        assert payload["version"] == SNAPSHOT_VERSION
        state = cls(config=payload["config"])
        state.seen = [SeenSet.from_bytes(b) for b in payload["seen"]]
        state.hosts = {}
        for hs, shard in payload["hosts"].items():
            out = {}
            for host, (cap, refill, tokens, rules, delay, pending) in shard.items():
                st = HostState(bucket=TokenBucket(cap, refill, tokens),
                               robots=RobotsRules(rules=rules,
                                                  crawl_delay=delay),
                               pending=list(pending))
                out[host] = st
            state.hosts[hs] = out
        state.candidates = payload["candidates"]
        state.round = payload["round"]
        state.order = payload["order"]
        state.admitted = payload["admitted"]
        state.counters = payload["counters"]
        return state


def _host_state(state: CrawlState, host: str,
                robots_fn: Optional[RobotsFn]) -> HostState:
    hs = state.config.host_shard_of(host)
    shard = state.hosts[hs]
    if host not in shard:
        body = robots_fn(host) if robots_fn else None
        shard[host] = HostState(
            bucket=TokenBucket(state.config.host_capacity,
                               state.config.host_refill,
                               state.config.host_capacity),
            robots=RobotsRules.parse(body))
    return shard[host]


def crawl_step(state: CrawlState, fetch: FetchFn,
               robots_fn: Optional[RobotsFn] = None,
               link_fn: Optional[Callable[[bytes], List[str]]] = None
               ) -> List[OrderRow]:
    """Advance one round. Returns this round's crawl-order rows."""
    from warcio_ray.html import extract_links
    link_fn = link_fn or extract_links
    config = state.config

    # 1. seen-filter in canonical order (filter state mutates in it)
    admitted: List[Candidate] = []
    for c in seen_order(state.candidates, config):
        if state.seen[config.shard_of(c.url_hash)].add_if_new(c.url_hash):
            admitted.append(c)
            state.admitted.append(c.url_hash)
        else:
            state.counters["duplicates"] += 1
    state.candidates = []

    # 2. robots + enqueue into per-host pools
    for c in admitted:
        hstate = _host_state(state, c.host, robots_fn)
        if not hstate.robots.allowed(path_of_url(c.url)):
            state.counters["robots_denied"] += 1
            continue
        hstate.pending.append((c.priority, c.surt, c.url_hash, c.url))

    # 3. politeness: per host (sorted), refill bucket and select
    selected: List[Candidate] = []
    for hs in sorted(state.hosts):
        for host in sorted(state.hosts[hs]):
            hstate = state.hosts[hs][host]
            if not hstate.pending:
                continue
            hstate.bucket.start_round()
            want = len(hstate.pending)
            cap = hstate.robots.per_round_cap(state.config.round_seconds)
            if cap is not None:
                want = min(want, cap)
            grant = hstate.bucket.take(want)
            chosen, deferred = politeness_select(hstate.pending, grant)
            hstate.pending = deferred
            for priority, s, h, url in chosen:
                selected.append(Candidate(url_hash=h, url=url, surt=s,
                                          host=host, priority=priority))

    # 4. schedule: per url-hash shard priority order, assign seq
    rows: List[OrderRow] = []
    contribs: List[Tuple[str, int, int, float]] = []
    for shard, seq, c in schedule(selected, config):
        rows.append((state.round, shard, seq, c.url_hash, c.url, c.host,
                     c.priority))
        # 5. simulated fetch + link extraction
        html = fetch(c.url)
        if html is None:
            state.counters["misses"] += 1
        else:
            state.counters["fetched"] += 1
            links = link_fn(html)
            state.counters["discovered"] += len(links)
            contribs.extend(outlink_contributions(
                shard, seq, c.priority, links, config))

    # 6. aggregate contributions -> next round's candidates
    state.candidates = aggregate_contributions(contribs)
    state.order.extend(rows)
    state.round += 1
    return rows


def has_work(state: CrawlState) -> bool:
    if state.candidates:
        return True
    return any(st.pending for shard in state.hosts.values()
               for st in shard.values())


def crawl_reference(seeds: Sequence[Tuple[str, float]], fetch: FetchFn,
                    config: Optional[CrawlConfig] = None,
                    robots_fn: Optional[RobotsFn] = None) -> CrawlState:
    """Run the full reference crawl to completion (or max_rounds)."""
    config = config or CrawlConfig()
    state = CrawlState.create(config, seeds)
    while state.round < config.max_rounds and has_work(state):
        crawl_step(state, fetch, robots_fn)
    return state
