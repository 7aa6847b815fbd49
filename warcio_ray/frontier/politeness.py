"""Per-host politeness: robots.txt rules + deterministic token buckets.

The reference repo has no frontier (warcio is the ingest codec of the
crawl stack); per the north-star this politeness layer is built from
scratch. Everything is round-based virtual time — no wall clock — so
budget decisions are pure functions of (host, round), which is what makes
crawl order reproducible across parallelism levels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class RobotsRules:
    """Minimal robots.txt: User-agent:* groups, Allow/Disallow prefixes,
    Crawl-delay. Longest-prefix-match wins; Allow wins ties (Google rule).
    """

    rules: List[Tuple[bool, str]] = field(default_factory=list)  # (allow, prefix)
    crawl_delay: Optional[float] = None

    @classmethod
    def parse(cls, body: Optional[str]) -> "RobotsRules":
        out = cls()
        if not body:
            return out
        applies = False          # current group includes User-agent: *
        reading_agents = False   # inside the UA-line run that opens a group
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, value = line.split(":", 1)
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not reading_agents:  # a new group starts
                    applies = False
                    reading_agents = True
                if value == "*":
                    applies = True
                continue
            reading_agents = False
            if key in ("allow", "disallow") and applies and value:
                out.rules.append((key == "allow", value))
            elif key == "crawl-delay" and applies:
                try:
                    out.crawl_delay = float(value)
                except ValueError:
                    pass
        return out

    def per_round_cap(self, round_seconds: float) -> Optional[int]:
        """Crawl-delay:N -> at most floor(round_seconds / N) fetches per
        round (min 1); None when no delay is set. Round-based virtual
        time keeps this deterministic at any parallelism."""
        if not self.crawl_delay or self.crawl_delay <= 0:
            return None
        return max(1, int(round_seconds // self.crawl_delay))

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for allow, prefix in self.rules:
            if path.startswith(prefix) and (
                    len(prefix) > best_len
                    or (len(prefix) == best_len and allow)):
                best_len = len(prefix)
                best_allow = allow
        return best_allow


@dataclass
class TokenBucket:
    """Round-based token bucket: ``refill`` tokens per round up to
    ``capacity``; starts full. Deterministic by construction."""

    capacity: float = 4.0
    refill: float = 4.0
    tokens: float = 4.0

    def start_round(self) -> None:
        self.tokens = min(self.capacity, self.tokens + self.refill)

    def take(self, n: int) -> int:
        grant = min(n, int(self.tokens))
        self.tokens -= grant
        return grant

    def budget(self) -> int:
        return int(self.tokens)


@dataclass
class HostState:
    """Per-host politeness state: bucket + robots + deferred queue."""

    bucket: TokenBucket
    robots: RobotsRules
    # deferred candidates: (priority, surt, url_hash, url) kept sorted lazily
    pending: List[Tuple[float, str, int, str]] = field(default_factory=list)


def path_of_url(url: str) -> str:
    """Path+query portion for robots matching."""
    i = url.find("://")
    if i == -1:
        return url
    j = url.find("/", i + 3)
    return url[j:] if j != -1 else "/"
