"""Reference (single-node) crawl: determinism, politeness, robots,
checkpoint/resume. No Ray needed — pages come straight from parquet."""

import collections

import pyarrow.parquet as pq
import pytest

from warcio_ray.frontier.politeness import RobotsRules
from warcio_ray.frontier.reference import (
    CrawlState,
    crawl_reference,
    crawl_step,
    has_work,
)
from warcio_ray.frontier.rounds import CrawlConfig
from warcio_ray.html import render_page
from warcio_ray.pages import links_for, url_for

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def page_lookup():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    n = t.num_rows
    pages = {}
    for doc_id, text, lang in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["lang"].to_pylist()):
        url = url_for(doc_id)
        pages[url] = render_page(text, url, lang, doc_id,
                                 links_for(doc_id, n))
    return pages


def seeds():
    return [(url_for(i), 1.0) for i in range(8)]


def run(page_lookup, config=None, robots_fn=None):
    return crawl_reference(seeds(), page_lookup.get,
                           config or CrawlConfig(max_rounds=6),
                           robots_fn=robots_fn)


def test_crawl_runs_and_is_deterministic(page_lookup):
    a = run(page_lookup)
    b = run(page_lookup)
    assert a.order == b.order
    assert a.admitted == b.admitted
    assert a.counters == b.counters
    assert len(a.order) > 20
    assert a.counters["fetched"] > 0
    # crawl order rows are (round, shard, seq, ...) strictly increasing
    assert a.order == sorted(a.order, key=lambda r: (r[0], r[1], r[2]))


def test_politeness_budget_respected(page_lookup):
    config = CrawlConfig(max_rounds=6, host_capacity=2.0, host_refill=2.0)
    state = run(page_lookup, config)
    per_round_host = collections.Counter()
    for rnd, shard, seq, h, url, host, priority in state.order:
        per_round_host[(rnd, host)] += 1
    assert max(per_round_host.values()) <= 2
    # tighter budget -> more rounds needed / deferrals happen
    loose = run(page_lookup, CrawlConfig(max_rounds=6))
    tight_r1 = sum(1 for r in state.order if r[0] == 0)
    loose_r1 = sum(1 for r in loose.order if r[0] == 0)
    assert tight_r1 <= loose_r1


def test_robots_rules():
    rules = RobotsRules.parse(
        "User-agent: other\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /doc/1\nAllow: /doc/12\nCrawl-delay: 2\n")
    assert rules.allowed("/doc/2")
    assert not rules.allowed("/doc/1")
    assert not rules.allowed("/doc/13")   # prefix match
    assert rules.allowed("/doc/12")       # longest-prefix Allow wins
    assert rules.crawl_delay == 2.0


def test_robots_denial_in_crawl(page_lookup):
    def robots_fn(host):
        return "User-agent: *\nDisallow: /doc/1\n"

    state = run(page_lookup, robots_fn=robots_fn)
    assert state.counters["robots_denied"] > 0
    for rnd, shard, seq, h, url, host, priority in state.order:
        assert not url.split(".example")[1].startswith("/doc/1")


def test_checkpoint_resume_identical(page_lookup):
    config = CrawlConfig(max_rounds=6)
    full = run(page_lookup, config)

    state = CrawlState.create(config, seeds())
    crawl_step(state, page_lookup.get)
    crawl_step(state, page_lookup.get)
    blob = state.snapshot()

    resumed = CrawlState.restore(blob)
    while resumed.round < config.max_rounds and has_work(resumed):
        crawl_step(resumed, page_lookup.get)
    assert resumed.order == full.order
    assert resumed.admitted == full.admitted
    assert resumed.counters == full.counters


def test_seen_set_no_refetch(page_lookup):
    state = run(page_lookup)
    fetched = [r[3] for r in state.order]
    assert len(fetched) == len(set(fetched))  # every url fetched at most once
