"""Pure round-step functions shared by the single-node reference crawl
and the distributed crawl.

Determinism contract (SURVEY §7): every ordering decision is a pure
function of (seed list, round, shard, priority, seq) — never of arrival
time. Both implementations call THESE functions for canonicalization,
contribution aggregation, seen-ordering, politeness selection and
scheduling, so crawl order and the final seen-set are bit-identical by
construction; the distributed version only changes where state lives.

Float determinism: OPIC cash contributions to a url are summed in sorted
(src_shard, src_seq) order, so the floating-point sum is bitwise
reproducible regardless of which worker computed which contribution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

from warcio_ray.frontier.surt import host_of, surt, url_hash64


@dataclass(frozen=True)
class Candidate:
    url_hash: int
    url: str          # canonicalized
    surt: str
    host: str
    priority: float


@dataclass
class CrawlConfig:
    num_shards: int = 8            # url-hash shards (seen-set + scheduler)
    num_host_shards: int = 4       # politeness shards (host-hash keyed)
    max_rounds: int = 10
    host_capacity: float = 4.0     # token bucket capacity (fetches/round)
    host_refill: float = 4.0
    damping: float = 0.85          # OPIC cash share passed to outlinks
    seed_priority: float = 1.0
    seen_expected: int = 1 << 16   # per-shard filter sizing (fixed up front)
    seen_seed: int = 7
    max_fetches_per_round: Optional[int] = None  # safety valve, None = off
    # virtual seconds one round represents: robots Crawl-delay:N caps a
    # host to floor(round_seconds / N) fetches per round (min 1) —
    # deterministic, no wall clock
    round_seconds: float = 60.0

    def shard_of(self, url_hash: int) -> int:
        return url_hash % self.num_shards

    def host_shard_of(self, host: str) -> int:
        return url_hash64(host) % self.num_host_shards


def make_candidate(url: str, priority: float) -> Optional[Candidate]:
    """Canonicalize one discovered url; None if not crawlable."""
    s = surt(url)
    if s is None:
        return None
    from warcio_ray.frontier.surt import canonicalize
    canon = canonicalize(url)
    host = host_of(canon)
    if not host:
        return None
    return Candidate(url_hash=url_hash64(s), url=canon, surt=s,
                     host=host, priority=priority)


def seeds_to_candidates(seeds: Sequence[Tuple[str, float]]) -> List[Candidate]:
    """Seed list -> candidates, first occurrence wins (seed order is part
    of the determinism contract)."""
    out: List[Candidate] = []
    taken: set = set()
    for url, priority in seeds:
        c = make_candidate(url, priority)
        if c is not None and c.url_hash not in taken:
            taken.add(c.url_hash)
            out.append(c)
    return out


# a canonicalized contribution row:
# (url_hash, url, surt, host, src_shard, src_seq, cash)
CanonContrib = Tuple[int, str, str, str, int, int, float]


def canonicalize_contributions(
        contribs: Iterable[Tuple[str, int, int, float]]) -> List[CanonContrib]:
    """(dst_url, src_shard, src_seq, cash) -> canonical rows (the
    parallelizable half of aggregation — runs inside fetch workers)."""
    out: List[CanonContrib] = []
    for dst_url, src_shard, src_seq, cash in contribs:
        c = make_candidate(dst_url, 0.0)
        if c is None:
            continue
        out.append((c.url_hash, c.url, c.surt, c.host,
                    src_shard, src_seq, cash))
    return out


def aggregate_canonical(rows: Iterable[CanonContrib]) -> List[Candidate]:
    """Group canonical contributions by dst hash; sum cash EXACTLY
    (math.fsum — order-independent, so every execution order and every
    partitioning yields bitwise-identical priorities); output sorted by
    hash. The (src_shard, src_seq) sort only picks the deterministic
    representative row."""
    import math

    by_dst: Dict[int, List[CanonContrib]] = {}
    for row in rows:
        by_dst.setdefault(row[0], []).append(row)
    out: List[Candidate] = []
    for h in sorted(by_dst):
        grp = sorted(by_dst[h], key=lambda r: (r[4], r[5]))
        total = math.fsum(r[6] for r in grp)
        first = grp[0]
        out.append(Candidate(url_hash=h, url=first[1], surt=first[2],
                             host=first[3], priority=total))
    return out


def aggregate_contributions(
        contribs: Iterable[Tuple[str, int, int, float]]) -> List[Candidate]:
    """(dst_url, src_shard, src_seq, cash) -> one candidate per dst."""
    return aggregate_canonical(canonicalize_contributions(contribs))


def seen_order(candidates: Iterable[Candidate],
               config: CrawlConfig) -> List[Candidate]:
    """Deterministic order in which candidates hit the seen-set filters:
    (shard, -priority, surt). Filter state mutation follows this order in
    BOTH implementations."""
    return sorted(candidates,
                  key=lambda c: (config.shard_of(c.url_hash),
                                 -c.priority, c.surt))


def politeness_select(pool: List[Tuple[float, str, int, str]],
                      budget: int) -> Tuple[List[Tuple[float, str, int, str]],
                                            List[Tuple[float, str, int, str]]]:
    """Select up to ``budget`` entries of one host's pool by
    (-priority, surt); rest is deferred. Pool entries are
    (priority, surt, url_hash, url)."""
    ordered = sorted(pool, key=lambda e: (-e[0], e[1]))
    return ordered[:budget], ordered[budget:]


def schedule(selected: Iterable[Candidate],
             config: CrawlConfig) -> List[Tuple[int, int, Candidate]]:
    """Assign (shard, seq) fetch order: within each url-hash shard, order
    by (-priority, surt); seq counts from 0 per shard per round."""
    by_shard: Dict[int, List[Candidate]] = {}
    for c in selected:
        by_shard.setdefault(config.shard_of(c.url_hash), []).append(c)
    out: List[Tuple[int, int, Candidate]] = []
    for shard in sorted(by_shard):
        ordered = sorted(by_shard[shard], key=lambda c: (-c.priority, c.surt))
        for seq, c in enumerate(ordered):
            out.append((shard, seq, c))
    return out


def outlink_contributions(src_shard: int, src_seq: int, priority: float,
                          links: Sequence[str],
                          config: CrawlConfig) -> List[Tuple[str, int, int, float]]:
    """OPIC: a fetched page passes priority*damping, split evenly, to its
    outlinks."""
    if not links:
        return []
    cash = (priority * config.damping) / len(links)
    return [(u, src_shard, src_seq, cash) for u in links]
