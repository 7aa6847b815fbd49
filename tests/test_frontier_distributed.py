"""Distributed crawl == single-node reference crawl, bit-identical.

The north-rule determinism gate: same seed list + politeness budget =>
identical crawl order and URL-seen set, plus kill/resume equivalence.
"""

import pyarrow.parquet as pq
import pytest

from warcio_ray.frontier.distributed import crawl_distributed
from warcio_ray.frontier.reference import crawl_reference
from warcio_ray.frontier.rounds import CrawlConfig
from warcio_ray.html import render_page
from warcio_ray.pages import links_for, url_for

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    n = t.num_rows
    out = {}
    for doc_id, text, lang in zip(t["doc_id"].to_pylist(),
                                  t["text"].to_pylist(),
                                  t["lang"].to_pylist()):
        url = url_for(doc_id)
        out[url] = render_page(text, url, lang, doc_id, links_for(doc_id, n))
    return out


def seeds():
    return [(url_for(i), 1.0) for i in range(8)]


ROBOTS = {"site3.example": "User-agent: *\nDisallow: /doc/3\n"}


def config(max_rounds=5):
    return CrawlConfig(max_rounds=max_rounds, num_shards=4,
                       num_host_shards=2, host_capacity=3.0, host_refill=3.0)


def test_distributed_matches_reference(ray_session, pages):
    ref = crawl_reference(seeds(), pages.get, config(),
                          robots_fn=lambda h: ROBOTS.get(h))
    dist = crawl_distributed(seeds(), pages, config(),
                             robots_bodies=ROBOTS, track_order=True)
    assert dist.order == ref.order          # identical crawl order (bitwise)
    assert dist.admitted == ref.admitted    # identical URL-seen set
    assert dist.counters == ref.counters
    assert len(dist.order) > 20


def test_parallelism_invariance(ray_session, pages):
    """Crawl order + seen set must not depend on the worker count — the
    sandbox stand-in for N-node vs 4N-node cluster equivalence."""
    a = crawl_distributed(seeds(), pages, config(), robots_bodies=ROBOTS,
                          fetch_concurrency=1, track_order=True)
    b = crawl_distributed(seeds(), pages, config(), robots_bodies=ROBOTS,
                          fetch_concurrency=4, track_order=True)
    assert a.order == b.order
    assert a.admitted == b.admitted
    assert a.counters == b.counters


def test_order_dir_parquet(ray_session, pages, tmp_path):
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    odir = str(tmp_path / "order")
    res = crawl_distributed(seeds(), pages, config(3), robots_bodies=ROBOTS,
                            order_dir=odir, track_order=True)
    files = sorted(glob.glob(odir + "/round=*.parquet"))
    assert len(files) == res.rounds
    rows = pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)
    assert len(rows) == len(res.order)
    # parquet order record matches the in-memory order exactly
    got = list(rows.itertuples(index=False, name=None))
    want = [(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in res.order]
    assert got == want


def test_distributed_checkpoint_resume(ray_session, pages, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    full = crawl_distributed(seeds(), pages, config(5), robots_bodies=ROBOTS,
                             track_order=True)

    # "crash" after 2 rounds, then resume to completion
    crawl_distributed(seeds(), pages, config(2), robots_bodies=ROBOTS,
                      checkpoint_dir=ckpt, track_order=True)
    resumed = crawl_distributed(seeds(), pages, config(5),
                                robots_bodies=ROBOTS,
                                checkpoint_dir=ckpt, resume=True,
                                track_order=True)
    assert resumed.order == full.order
    assert resumed.admitted == full.admitted
    assert resumed.counters == full.counters


def test_scan_mode_matches_reference(ray_session, pages):
    """The bucketed-scan fetch (the 100-TB path) produces the same crawl
    as the reference and the broadcast mode (VERDICT r1 item 1)."""
    from warcio_ray.pages import build_pages_bucketed

    bucketed = build_pages_bucketed(SF)
    ref = crawl_reference(seeds(), pages.get, config(),
                          robots_fn=lambda h: ROBOTS.get(h))
    dist = crawl_distributed(seeds(), bucketed, config(),
                             robots_bodies=ROBOTS, track_order=True)
    assert dist.order == ref.order
    assert dist.admitted == ref.admitted
    assert dist.counters == ref.counters


def test_scan_per_round_fetch_matches_reference(ray_session, pages):
    """Forcing resident_fetch_max_bytes=0 routes crawl_distributed
    through the per-round bucket semi-join (the at-scale default above
    the threshold): the crawl must stay bit-identical."""
    from warcio_ray.pages import build_pages_bucketed
    from warcio_ray.pipelines.crawl import ScanFetcher, make_fetcher

    bucketed = build_pages_bucketed(SF)
    # threshold 0 -> ScanFetcher selected for any corpus
    assert isinstance(make_fetcher(bucketed, config(),
                                   resident_fetch_max_bytes=0), ScanFetcher)
    ref = crawl_reference(seeds(), pages.get, config(),
                          robots_fn=lambda h: ROBOTS.get(h))
    dist = crawl_distributed(seeds(), bucketed, config(),
                             robots_bodies=ROBOTS, track_order=True,
                             resident_fetch_max_bytes=0)
    assert dist.order == ref.order
    assert dist.admitted == ref.admitted
    assert dist.counters == ref.counters


def test_make_fetcher_regimes(ray_session):
    """Fetch strategy by corpus size: unbounded cache below 1/4 of the
    threshold, LRU-bounded cache in the mid regime, per-round scan
    above the threshold."""
    from warcio_ray.pages import build_pages_bucketed
    from warcio_ray.pipelines.crawl import (
        BucketedFetcher,
        ScanFetcher,
        layout_nbytes,
        make_fetcher,
    )

    bucketed = build_pages_bucketed(SF)
    nbytes = layout_nbytes(bucketed)
    small = make_fetcher(bucketed, config(),
                         resident_fetch_max_bytes=nbytes * 8)
    assert isinstance(small, BucketedFetcher) and small.max_resident is None
    mid = make_fetcher(bucketed, config(),
                       resident_fetch_max_bytes=nbytes * 2)
    assert isinstance(mid, BucketedFetcher) and mid.max_resident >= 1
    big = make_fetcher(bucketed, config(),
                       resident_fetch_max_bytes=nbytes // 2)
    assert isinstance(big, ScanFetcher)


def test_bucketed_fetcher_lru_bound(ray_session, pages):
    """max_resident_groups LRU-bounds the cached group refs while the
    crawl stays identical to the unbounded fetcher."""
    from warcio_ray.pages import build_pages_bucketed
    from warcio_ray.pipelines.crawl import BucketedFetcher

    bucketed = build_pages_bucketed(SF)
    unbounded = crawl_distributed(seeds(), bucketed, config(),
                                  robots_bodies=ROBOTS, track_order=True)

    import warcio_ray.frontier.distributed as distmod
    import warcio_ray.pipelines.crawl as crawlmod

    orig = crawlmod.make_fetcher

    def bounded_fetcher(root, cfg, resident_fetch_max_bytes=None):
        return BucketedFetcher(root, cfg, max_resident_groups=2)

    crawlmod.make_fetcher = bounded_fetcher
    try:
        bounded = crawl_distributed(seeds(), bucketed, config(),
                                    robots_bodies=ROBOTS, track_order=True)
    finally:
        crawlmod.make_fetcher = orig
    assert bounded.order == unbounded.order
    assert bounded.counters == unbounded.counters


def test_crawl_pages_auto_matches_scan(ray_session):
    """fetch_mode='auto' (in-process at this corpus size) returns the
    byte-identical order DataFrame the distributed scan mode returns."""
    import pandas as pd

    from warcio_ray.pipelines.crawl import crawl_pages

    cfg = config(4)
    auto = crawl_pages(SF, cfg, n_seeds=8)
    scan = crawl_pages(SF, cfg, n_seeds=8, fetch_mode="scan")
    pd.testing.assert_frame_equal(auto, scan)
    assert len(auto) > 20


def test_untracked_order_stays_empty_but_parquet_complete(
        ray_session, pages, tmp_path):
    """Default mode: driver memory stays bounded (no order/admitted
    lists); the parquet stream is the full record."""
    import glob

    import pandas as pd

    odir = str(tmp_path / "order")
    res = crawl_distributed(seeds(), pages, config(3), robots_bodies=ROBOTS,
                            order_dir=odir)
    assert res.order == [] and res.admitted == []
    tracked = crawl_distributed(seeds(), pages, config(3),
                                robots_bodies=ROBOTS, track_order=True)
    files = sorted(glob.glob(odir + "/round=*.parquet"))
    rows = pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)
    got = list(rows.itertuples(index=False, name=None))
    want = [tuple(r) for r in tracked.order]
    assert got == want


def test_aggregate_partition_sweep_matches_inprocess(ray_session):
    """The big-round Dataset partition-sweep fold is bitwise-identical
    to the in-process aggregate_canonical path, for both list and
    Dataset inputs, across partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data

    from warcio_ray.frontier import distributed as D
    from warcio_ray.frontier.rounds import CrawlConfig

    rng = np.random.RandomState(7)
    n = 5000
    hashes = rng.randint(0, 400, size=n).astype(np.uint64)
    rows = [(int(h), f"http://h{h}.example/p", f"surt-{h}", f"h{h}",
             int(rng.randint(0, 4)), int(rng.randint(0, 50)),
             float(rng.rand()) / 7.0) for h in hashes]
    cfg = CrawlConfig(num_shards=4)
    want = D._aggregate(list(rows), cfg)

    old = D.AGG_DATASET_THRESHOLD
    D.AGG_DATASET_THRESHOLD = 100  # force the sweep path
    try:
        got_list = D._aggregate(list(rows), cfg)
        df = pd.DataFrame(rows, columns=["url_hash", "url", "surt",
                                         "host", "src_shard", "src_seq",
                                         "cash"])
        df["url_hash"] = df["url_hash"].astype("uint64")
        for nparts in (1, 5):
            ds = ray.data.from_pandas(df).repartition(nparts)
            got_ds = D._aggregate(ds.materialize(), cfg)
            pd.testing.assert_frame_equal(
                got_ds.reset_index(drop=True), want.reset_index(drop=True),
                check_dtype=False)
    finally:
        D.AGG_DATASET_THRESHOLD = old
    pd.testing.assert_frame_equal(got_list.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)
    # priorities must be BITWISE identical (fsum contract), not approx
    assert list(map(float, got_list["priority"])) == \
        list(map(float, want["priority"]))
