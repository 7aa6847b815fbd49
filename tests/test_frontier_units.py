"""Unit tests: SURT canonicalization + deterministic membership filters."""

import random

from warcio_ray.frontier.filters import CountingBloom, CuckooFilter, SeenSet
from warcio_ray.frontier.surt import (
    canonicalize,
    host_of,
    surt,
    url_hash64,
    url_to_hash64,
)


def test_canonicalize():
    assert canonicalize("HTTP://Example.COM:80/a/../b/./c?z=1&a=2#frag") == \
        "http://example.com/b/c?a=2&z=1"
    assert canonicalize("https://example.com:443/") == "https://example.com/"
    assert canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert canonicalize("http://example.com") == "http://example.com/"
    # %7e decodes to ~ (unreserved); %2e%2e becomes .. and pops the segment
    assert canonicalize("http://example.com/%7euser/%2e%2e") == \
        "http://example.com/"
    assert canonicalize("http://example.com/%7euser") == \
        "http://example.com/~user"
    assert canonicalize("no-scheme/path") is None
    # opaque URIs keep their form (and are not crawlable -> surt None)
    assert canonicalize("dns:example.com") == "dns:example.com"
    assert surt("dns:example.com") is None


def test_surt():
    assert surt("http://www.Example.com/Path?b=2&a=1") == \
        "com,example)/Path?a=1&b=2"
    assert surt("http://sub.www.example.com/") == "com,example,www,sub)/"
    assert surt("http://www.example.com:8080/x") == "com,example:8080)/x"
    # www stripped only when enough labels remain
    assert surt("http://www.com/") == "com,www)/"


def test_hash_stability():
    # stable across calls and processes (no PYTHONHASHSEED dependence)
    assert url_hash64("com,example)/") == url_hash64("com,example)/")
    h = url_to_hash64("http://www.example.com/")
    assert h == url_to_hash64("http://EXAMPLE.com:80/")
    assert isinstance(h, int) and 0 <= h < 2 ** 64


def test_host_of():
    assert host_of("http://User@WWW.Foo.COM:8080/x") == "www.foo.com"
    assert host_of("garbage") is None


def test_counting_bloom_roundtrip():
    bloom = CountingBloom(m_bits=1 << 14, k=4, seed=42)
    keys = [url_hash64(f"com,h{i})/") for i in range(1000)]
    for k in keys:
        bloom.add(k)
    assert all(bloom.might_contain(k) for k in keys)
    other = [url_hash64(f"org,x{i})/") for i in range(1000)]
    fp = sum(bloom.might_contain(k) for k in other)
    assert fp < 100  # ~sane false-positive rate
    blob = bloom.to_bytes()
    back = CountingBloom.from_bytes(blob)
    assert back.to_bytes() == blob
    bloom.remove(keys[0])
    # removal decrements but other keys still resolve
    assert all(bloom.might_contain(k) for k in keys[1:])


def test_cuckoo_roundtrip_and_determinism():
    def build():
        f = CuckooFilter(n_buckets=1 << 12, seed=7)
        for i in range(8000):
            f.add(url_hash64(f"com,h{i})/"))
        return f

    a, b = build(), build()
    assert a.to_bytes() == b.to_bytes()  # same sequence -> same bits
    assert a.n_failed == 0
    assert all(a.contains(url_hash64(f"com,h{i})/")) for i in range(8000))
    back = CuckooFilter.from_bytes(a.to_bytes())
    assert back.to_bytes() == a.to_bytes()
    assert a.remove(url_hash64("com,h0)/"))
    assert not a.contains(url_hash64("com,h0)/"))


def test_seen_set_contract():
    s = SeenSet.create(expected_items=5000, seed=3)
    rng = random.Random(42)
    keys = [rng.getrandbits(64) for _ in range(3000)]
    first = [s.add_if_new(k) for k in keys]
    assert all(first)  # all new on first sight (no FP at this density)
    again = [s.add_if_new(k) for k in keys]
    assert not any(again)  # all seen on second sight (no false negatives)
    blob = s.to_bytes()
    back = SeenSet.from_bytes(blob)
    assert back.to_bytes() == blob
    assert all(k in back for k in keys)


def test_crawl_delay_caps_per_round():
    """Crawl-delay:N limits a host to floor(round_seconds/N) fetches per
    round (min 1), enforced identically by both engines."""
    from warcio_ray.frontier.politeness import RobotsRules
    from warcio_ray.frontier.reference import crawl_reference
    from warcio_ray.frontier.rounds import CrawlConfig

    r = RobotsRules.parse("User-agent: *\nCrawl-delay: 20\n")
    assert r.per_round_cap(60.0) == 3
    assert r.per_round_cap(10.0) == 1        # min 1, never starves
    assert RobotsRules.parse(None).per_round_cap(60.0) is None

    # ten same-host urls, big token budget: without delay all 10 fetch
    # in round 0; with Crawl-delay:20 only 3 per round
    pages = {f"http://slow.example/p{i}": b"<html></html>" for i in range(10)}
    seeds = [(u, 1.0) for u in pages]
    cfg = CrawlConfig(max_rounds=6, num_shards=2, num_host_shards=1,
                      host_capacity=100.0, host_refill=100.0,
                      round_seconds=60.0)
    fast = crawl_reference(seeds, pages.get, cfg)
    assert [r0 for (r0, *_rest) in fast.order][:10] == [0] * 10

    robots = {"slow.example": "User-agent: *\nCrawl-delay: 20\n"}
    slow = crawl_reference(seeds, pages.get, cfg,
                           robots_fn=lambda h: robots.get(h))
    rounds = [row[0] for row in slow.order]
    from collections import Counter

    per_round = Counter(rounds)
    assert per_round[0] == 3 and per_round[1] == 3
    assert sum(per_round.values()) == 10


def test_crawl_delay_distributed_matches_reference(ray_session):
    from warcio_ray.frontier.distributed import crawl_distributed
    from warcio_ray.frontier.reference import crawl_reference
    from warcio_ray.frontier.rounds import CrawlConfig

    pages = {f"http://slow.example/p{i}": b"<html></html>" for i in range(10)}
    seeds = [(u, 1.0) for u in pages]
    cfg = CrawlConfig(max_rounds=6, num_shards=2, num_host_shards=1,
                      host_capacity=100.0, host_refill=100.0)
    robots = {"slow.example": "User-agent: *\nCrawl-delay: 20\n"}
    ref = crawl_reference(seeds, pages.get, cfg,
                          robots_fn=lambda h: robots.get(h))
    dist = crawl_distributed(seeds, pages, cfg, robots_bodies=robots,
                             track_order=True)
    assert dist.order == ref.order
    assert dist.counters == ref.counters


def test_apportion_budget(ray_session):
    """Hamilton apportionment: quotas sum exactly to the budget, match
    an in-process largest-remainder reference, are partitioning-
    invariant, and bad weights raise."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from warcio_ray.frontier.budget import apportion_budget

    rng = np.random.RandomState(11)
    hosts = [f"h{i:03d}" for i in range(200)]
    w = rng.randint(1, 5000, size=200).astype("int64")
    df = pd.DataFrame({"host": hosts, "w": w})

    out = apportion_budget(ray.data.from_pandas(df), budget=137) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    out2 = apportion_budget(ray.data.from_pandas(df).repartition(13),
                            budget=137) \
        .to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)

    assert out["quota"].sum() == 137
    # in-process largest-remainder reference
    W = int(w.sum())
    base = 137 * w // W
    rem = 137 * w % W
    order = sorted(range(200), key=lambda i: (-rem[i], hosts[i]))
    leftover = 137 - int(base.sum())
    want = base.copy()
    for i in order[:leftover]:
        want[i] += 1
    assert (out["quota"].to_numpy() == want).all()

    with pytest.raises(ValueError, match="positive weights"):
        apportion_budget(ray.data.from_pandas(
            pd.DataFrame({"host": ["a", "b"], "w": [0, 7]})),
            budget=5).to_pandas()
    # empty input: typed empty result
    empty = apportion_budget(ray.data.from_pandas(
        pd.DataFrame({"host": pd.Series(dtype="object"),
                      "w": pd.Series(dtype="int64")})), budget=5) \
        .to_pandas()
    assert len(empty) == 0


def test_apportion_budget_huge_weights_no_overflow(ray_session):
    """Weights near 2^63/budget with budget < n_buckets: the old
    rem * n_buckets bucket multiply wrapped negative (ADVICE r3);
    the divide form must keep sum(quota) == budget exact."""
    import numpy as np
    import pandas as pd
    import ray.data

    from warcio_ray.frontier.budget import apportion_budget

    budget = 100
    # total_w close to (2^63-1)//budget — passes the budget*W guard,
    # but rem values reach ~W, so rem * 1024 would overflow int64
    big = (2 ** 63 - 1) // budget // 4 - 3
    w = np.array([big, big + 1, big + 2, big // 3 + 5], dtype="int64")
    hosts = [f"h{i}" for i in range(len(w))]
    out = apportion_budget(
        ray.data.from_pandas(pd.DataFrame({"host": hosts, "w": w})),
        budget=budget).to_pandas().sort_values("host") \
        .reset_index(drop=True)
    assert int(out["quota"].sum()) == budget
    assert (out["quota"] >= 0).all()
    # largest-remainder reference (Python big ints: no overflow)
    W = int(w.sum())
    base = [budget * int(x) // W for x in w]
    rem = [budget * int(x) % W for x in w]
    order = sorted(range(len(w)), key=lambda i: (-rem[i], hosts[i]))
    want = list(base)
    for i in order[:budget - sum(base)]:
        want[i] += 1
    assert out["quota"].tolist() == want


def test_recrawl_schedule(ray_session):
    """Adaptive revisit policy: halve on change (min clamp), double on
    no-change (max clamp), base for added, 0 tombstone for removed."""
    import pandas as pd
    import ray.data

    from warcio_ray.frontier.budget import recrawl_schedule

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "status": ["changed", "changed", "unchanged", "unchanged",
                   "added", "removed"],
        "prev_days": [8, 1, 40, 64, 99, 16]})
    out = recrawl_schedule(ray.data.from_pandas(df)) \
        .to_pandas().sort_values("doc_id")
    assert out["next_days"].tolist() == [4, 1, 64, 64, 7, 0]

    # without prev_days every row starts from the base interval
    out2 = recrawl_schedule(ray.data.from_pandas(
        df[["doc_id", "status"]])).to_pandas().sort_values("doc_id")
    assert out2["next_days"].tolist() == [3, 3, 14, 14, 7, 0]


def test_robots_tie_allow_wins():
    """Equal-length Allow/Disallow prefixes: Allow wins regardless of
    listing order (Google's least-restrictive tie rule), longer rules
    still dominate."""
    from warcio_ray.frontier.politeness import RobotsRules

    r = RobotsRules.parse(
        "User-agent: *\nDisallow: /q\nAllow: /q\n")
    assert r.allowed("/q/page")
    r2 = RobotsRules.parse(
        "User-agent: *\nAllow: /q\nDisallow: /q\n")
    assert r2.allowed("/q/page")
    # a LONGER disallow still beats the tied allow
    r3 = RobotsRules.parse(
        "User-agent: *\nAllow: /q\nDisallow: /q\nDisallow: /q/p\n")
    assert not r3.allowed("/q/page")
    assert r3.allowed("/q/x")


def test_sitemap_parse_edge_cases():
    """urlset/sitemapindex/no-namespace/invalid/missing-loc handling."""
    from warcio_ray.frontier.sitemap import parse_sitemap

    ns = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    kind, e = parse_sitemap(
        f"<urlset{ns}><url><loc> https://a/1 </loc>"
        "<lastmod>2024-01-02</lastmod></url>"
        "<url><lastmod>2024-01-03</lastmod></url>"  # no loc: skipped
        "<url><loc>https://a/2</loc></url></urlset>")
    assert kind == "urlset"
    assert e == [("https://a/1", "2024-01-02"), ("https://a/2", "")]

    kind, e = parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
        "</sitemap></sitemapindex>")  # no namespace
    assert kind == "sitemapindex"
    assert e == [("https://a/s1.xml", "")]

    assert parse_sitemap("<urlset></urlset>") == ("urlset", [])
    assert parse_sitemap("not xml <<") == ("invalid", [])
    assert parse_sitemap(None) == ("invalid", [])
    assert parse_sitemap("<rss><item/></rss>") == ("invalid", [])


def test_sitemap_entries_ds(ray_session):
    """Dataset explode: entries flatten with ids, invalid rows stay
    observable."""
    import pandas as pd
    import ray.data

    from warcio_ray.frontier.sitemap import sitemap_entries

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "xml": ["<urlset><url><loc>https://a/1</loc></url>"
                "<url><loc>https://a/2</loc></url></urlset>",
                "broken"]})
    out = sitemap_entries(ray.data.from_pandas(df)).to_pandas() \
        .sort_values(["doc_id", "loc"]).reset_index(drop=True)
    assert out["kind"].tolist() == ["urlset", "urlset", "invalid"]
    assert out["loc"].tolist() == ["https://a/1", "https://a/2", ""]
