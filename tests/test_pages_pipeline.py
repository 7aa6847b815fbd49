"""End-to-end slice: documents -> pages synthesis -> text extraction.

Verifies the self-hosted byte-identity contract: the distributed
extract_text stage reproduces the golden ``text`` column exactly.
"""

import pyarrow.compute as pc
import pytest

from warcio_ray.html import extract_links, extract_text, render_page
from warcio_ray.pages import build_pages, read_pages, url_for
from warcio_ray.stages.text import (
    add_host_stage,
    extract_links_stage,
    extract_text_stage,
    verify_text_stage,
)

SF = "/root/testdata/sf0.001"


def test_render_extract_inverse():
    text = "Hello <world> & friends\nsecond line\n\nfourth"
    html = render_page(text, "http://site0.example/doc/1", "en", 1,
                       links=["http://site1.example/doc/2"])
    out = extract_text(html)
    # extraction strips markup & normalizes whitespace deterministically
    assert "Hello <world> & friends" in out
    assert "<p>" not in out and "script" not in out
    assert extract_text(html) == out  # deterministic
    assert extract_links(html) == ["http://site1.example/doc/2"]


def test_pages_build_and_verify(ray_session):
    out = build_pages(SF, force=True)
    ds = read_pages(SF)
    n = ds.count()
    assert n == 500
    schema = ds.schema()
    assert schema.names == ["url", "warc_ts", "html", "text", "lang"]

    # distributed extraction == golden text, byte-identical, every row
    verdict = ds.map_batches(verify_text_stage, batch_format="pyarrow") \
        .to_pandas().sum()
    assert int(verdict["mismatch_count"]) == 0
    assert int(verdict["match_count"]) == n


def test_extract_text_stage_and_links(ray_session):
    ds = read_pages(SF)
    out = ds.map_batches(extract_text_stage, batch_format="pyarrow")
    row = out.take(1)[0]
    assert row["text_extracted"] == row["text"]

    edges = ds.map_batches(extract_links_stage, batch_format="pyarrow")
    edf = edges.to_pandas()
    assert len(edf) > 0
    # every dst is a valid synthesized url
    assert edf["dst_url"].str.match(r"http://site\d+\.example/doc/\d+").all()


def test_host_stage(ray_session):
    ds = read_pages(SF).map_batches(add_host_stage, batch_format="pyarrow")
    hosts = ds.to_pandas()["host"]
    assert hosts.str.match(r"site\d+\.example").all()
    # zipf-ish skew: site0 is the biggest host (~30%)
    counts = hosts.value_counts()
    assert counts.index[0] == "site0.example"
    assert counts.iloc[0] >= 0.25 * len(hosts)


def test_url_determinism():
    assert url_for(0) == "http://site0.example/doc/0"
    assert url_for(31) == "http://site1.example/doc/31"
    assert url_for(99) == "http://site99.example/doc/99"
