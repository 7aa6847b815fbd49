"""Revisit dedup pipeline, req/resp pairing, scan-fetch equivalence."""

import pandas as pd
import pytest

from warcio_ray.codec import ParseOptions, parse_archive_bytes, serialize_record
from warcio_ray.codec.build import build_record
from warcio_ray.codec.headers import HeaderBlock
from warcio_ray.sinks.warc import pair_request_response

FIXED_ID = "<urn:uuid:12345678-feb0-11e6-8f83-68a86d1772ce>"


def _fixed_id():
    return FIXED_ID


def _fixed_date(use_micros=False):
    return "2000-01-01T00:00:00Z"


def _response(url, payload, date="2000-01-01T00:00:00Z"):
    http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                       pairs=[("Content-Type", "text/plain")])
    return build_record(url, "response", payload=payload, http_headers=http,
                        id_fn=_fixed_id, date_fn=lambda m, d=date: d)


def test_revisit_dedup_pipeline(ray_session, tmp_path):
    import glob
    import os

    from warcio_ray.pipelines.revisit import (
        find_revisit_targets,
        rewrite_duplicates_as_revisits,
    )
    from warcio_ray.sources.warc import read_warc

    # corpus: 3 urls sharing one payload + 1 unique
    recs = [
        _response("http://a.example/1", b"same payload",
                  "2000-01-01T00:00:00Z"),
        _response("http://a.example/2", b"same payload",
                  "2000-01-02T00:00:00Z"),
        _response("http://a.example/3", b"same payload",
                  "2000-01-03T00:00:00Z"),
        _response("http://a.example/u", b"unique payload"),
    ]
    path = str(tmp_path / "dup.warc.gz")
    with open(path, "wb") as f:
        for r in recs:
            f.write(serialize_record(r, gzip=True))

    ds = read_warc([path])
    targets = find_revisit_targets(ds)
    assert len(targets) == 1
    assert targets.iloc[0]["refers_to_uri"] == "http://a.example/1"

    # note: id_fn must be worker-importable (the default uuid fn is);
    # test-module functions aren't on worker sys.path
    out = rewrite_duplicates_as_revisits(read_warc([path])).to_pandas()
    by_type = out["rec_type"].value_counts().to_dict()
    assert by_type == {"response": 2, "revisit": 2}
    revs = out[out["rec_type"] == "revisit"]
    assert set(revs["url"]) == {"http://a.example/2", "http://a.example/3"}
    # revisit rows carry the shared digest + refers-to headers
    hdrs = {h["name"]: h["value"] for h in revs.iloc[0]["warc_headers"]}
    assert hdrs["WARC-Refers-To-Target-URI"] == "http://a.example/1"
    assert hdrs["WARC-Payload-Digest"].startswith("sha1:")
    assert "revisit/identical-payload-digest" in hdrs["WARC-Profile"]


def test_revisit_dedup_high_dup_rate(ray_session, tmp_path):
    """Every payload x4 (a worse-than-real 75% dup rate): the rewrite
    must stay correct with NO driver-built winner dict — the instruction
    side-channel holds the (filename, offset) -> refers-to map bucketed
    on disk and the driver only ever sees row counts."""
    import os

    from warcio_ray.pipelines.revisit import rewrite_duplicates_as_revisits
    from warcio_ray.sources.warc import read_warc

    n_docs, n_copies = 40, 4
    paths = []
    for shard in range(4):
        recs = []
        for i in range(shard * (n_docs // 4), (shard + 1) * (n_docs // 4)):
            for c in range(n_copies):
                recs.append(_response(
                    f"http://dup.example/{i}?c={c}",
                    f"payload body {i}".encode(),
                    f"2000-01-0{c + 1}T00:00:00Z"))
        p = str(tmp_path / f"dup-{shard}.warc.gz")
        with open(p, "wb") as f:
            for r in recs:
                f.write(serialize_record(r, gzip=True))
        paths.append(p)

    instr_dir = str(tmp_path / "instr")
    out = rewrite_duplicates_as_revisits(
        read_warc(paths), instr_dir=instr_dir, num_buckets=8).to_pandas()
    by_type = out["rec_type"].value_counts().to_dict()
    assert by_type == {"revisit": n_docs * (n_copies - 1),
                       "response": n_docs}
    # the winner (earliest date, c=0) survived per digest
    survivors = set(out.loc[out["rec_type"] == "response", "url"])
    assert survivors == {f"http://dup.example/{i}?c=0"
                         for i in range(n_docs)}
    # instructions really went through the bucketed side-channel (each
    # invocation writes into a unique run-* subdir of the given dir)
    import glob

    buckets = glob.glob(os.path.join(instr_dir, "run-*", "bucket=*"))
    assert buckets
    # every revisit points at its winner
    revs = out[out["rec_type"] == "revisit"]
    for _, row in revs.head(5).iterrows():
        hdrs = {h["name"]: h["value"] for h in row["warc_headers"]}
        assert hdrs["WARC-Refers-To-Target-URI"].endswith("?c=0")


def test_revisit_winner_tie_same_url_same_date(ray_session, tmp_path):
    """Two records with the SAME url and SAME WARC-Date (1 s resolution)
    sharing a payload: winner identity must be (filename, offset), not
    (url, date) — the offset tie-breaker picks exactly one winner and
    the other copy becomes a revisit."""
    from warcio_ray.pipelines.revisit import rewrite_duplicates_as_revisits
    from warcio_ray.sources.warc import read_warc

    recs = [
        _response("http://tie.example/x", b"tie payload",
                  "2000-01-01T00:00:00Z"),
        _response("http://tie.example/x", b"tie payload",
                  "2000-01-01T00:00:00Z"),
    ]
    path = str(tmp_path / "tie.warc.gz")
    with open(path, "wb") as f:
        for r in recs:
            f.write(serialize_record(r, gzip=True))

    out = rewrite_duplicates_as_revisits(read_warc([path])).to_pandas()
    by_type = out["rec_type"].value_counts().to_dict()
    assert by_type == {"response": 1, "revisit": 1}
    # the surviving response is the LOWER offset (the sort tie-breaker)
    resp = out[out["rec_type"] == "response"].iloc[0]
    rev = out[out["rec_type"] == "revisit"].iloc[0]
    assert resp["offset"] < rev["offset"]


def test_pair_request_response_round_trip():
    resp = _response("http://x.example/p", b"hello")
    http_req = HeaderBlock(protocol="GET", statusline="/p HTTP/1.0",
                           pairs=[("Host", "x.example")])
    req = build_record("http://other/", "request", http_headers=http_req,
                       id_fn=_fixed_id, date_fn=_fixed_date)
    pair_request_response(req, resp)
    assert req.warc_headers.get("WARC-Target-URI") == "http://x.example/p"
    assert req.warc_headers.get("WARC-Concurrent-To") == FIXED_ID
    blob = serialize_record(resp, gzip=True) + serialize_record(req, gzip=True)
    back = parse_archive_bytes(blob, ParseOptions(check_digests=True))
    assert [r.rec_type for r in back.records] == ["response", "request"]
    assert back.records[1].url == "http://x.example/p"


def test_scan_fetch_matches_broadcast_fetch(ray_session):
    """fetch_round_via_scan == FetchActor.fetch for the same schedule."""
    import ray

    from warcio_ray.frontier.distributed import _actor_classes
    from warcio_ray.frontier.rounds import CrawlConfig
    from warcio_ray.pipelines.crawl import (
        fetch_round_via_scan,
        load_pages_dict,
    )
    from warcio_ray.pages import url_for

    sf = "/root/testdata/sf0.001"
    pages = load_pages_dict(sf)
    config = CrawlConfig(num_shards=4)
    sched = pd.DataFrame({
        "shard": [0, 1, 2],
        "seq": [0, 0, 1],
        "url_hash": [1, 2, 3],
        "url": [url_for(3), url_for(7), url_for(123)],
        "host": ["h", "h", "h"],
        "priority": [1.0, 0.5, 0.25],
    })
    _, _, FetchActor = _actor_classes()
    actor = FetchActor.remote(ray.put(pages), config)
    rows = list(sched[["shard", "seq", "url_hash", "url", "host",
                       "priority"]].itertuples(index=False, name=None))
    hits_b, disc_b, canon_b = ray.get(actor.fetch.remote(rows))
    ray.kill(actor)

    from warcio_ray.pages import build_pages_bucketed

    bucketed = build_pages_bucketed(sf)
    hits_s, disc_s, canon_ds = fetch_round_via_scan(bucketed, sched, config)
    canon_s = [tuple(r) for r in canon_ds.to_pandas()[
        ["url_hash", "url", "surt", "host", "src_shard", "src_seq",
         "cash"]].itertuples(index=False, name=None)]
    assert hits_s == hits_b
    assert disc_s == disc_b
    assert sorted(canon_s) == sorted(canon_b)
