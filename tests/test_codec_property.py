"""Property-based codec tests (hypothesis): build -> serialize -> parse
-> re-serialize byte identity across random records, plus timeutil and
digest-compare vectors (the reference has no property tests; this goes
beyond its strategy)."""

import base64
import string
from datetime import datetime

import pytest
from hypothesis import given, settings, strategies as st

from warcio_ray.codec import (
    ParseOptions,
    build_record,
    parse_archive_bytes,
    serialize_record,
)
from warcio_ray.codec.digest import digests_match, sha1_b32
from warcio_ray.codec.headers import HeaderBlock
from warcio_ray.codec.timeutil import (
    datetime_to_iso_date,
    iso_date_to_datetime,
    iso_date_to_timestamp14,
    pad_timestamp,
    timestamp14_to_datetime,
    timestamp14_to_iso_date,
)

FIXED = dict(id_fn=lambda: "<urn:uuid:00000000-0000-0000-0000-000000000000>",
             date_fn=lambda m: "2001-02-03T04:05:06Z")

# header-safe text: printable ascii without CR/LF/colon-leading tricks
header_value = st.text(
    alphabet=string.ascii_letters + string.digits + " -_.;=/",
    min_size=1, max_size=30).map(lambda s: s.strip()).filter(bool)
header_name = st.text(alphabet=string.ascii_letters + "-",
                      min_size=1, max_size=20)


@settings(max_examples=40, deadline=None)
@given(
    payload=st.binary(min_size=0, max_size=2048),
    headers=st.lists(st.tuples(header_name, header_value), max_size=6),
    rec_type=st.sampled_from(["response", "resource", "metadata"]),
    gzip=st.booleans(),
)
def test_build_serialize_parse_roundtrip(payload, headers, rec_type, gzip):
    http = None
    if rec_type == "response":
        http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                           pairs=[("Content-Type", "text/plain")] + headers)
    rec = build_record("http://h.example/p", rec_type, payload=payload,
                       http_headers=http, **FIXED)
    blob = serialize_record(rec, gzip=gzip)
    result = parse_archive_bytes(blob, ParseOptions(check_digests=True))
    assert len(result.records) == 1
    back = result.records[0]
    assert back.rec_type == rec_type
    assert back.payload == payload
    assert back.digest_passed is True or (
        back.digest_passed is None and rec_type in ("warcinfo",))
    if http is not None:
        assert back.http_headers.pairs == http.pairs
    # second serialization is byte-identical (fixpoint)
    blob2 = serialize_record(back, gzip=gzip)
    assert blob2 == blob


@settings(max_examples=40, deadline=None)
@given(payloads=st.lists(st.binary(min_size=0, max_size=512),
                         min_size=1, max_size=8),
       gzip=st.booleans())
def test_multi_record_stream_roundtrip(payloads, gzip):
    blobs = []
    for i, p in enumerate(payloads):
        rec = build_record(f"http://h.example/{i}", "resource", payload=p,
                           warc_content_type="application/octet-stream",
                           **FIXED)
        blobs.append(serialize_record(rec, gzip=gzip))
    stream = b"".join(blobs)
    result = parse_archive_bytes(stream, ParseOptions(check_digests=True))
    assert [r.payload for r in result.records] == payloads
    assert all(r.digest_passed for r in result.records)
    out = b"".join(serialize_record(r, gzip=gzip) for r in result.records)
    assert out == stream


@settings(max_examples=60, deadline=None)
@given(dt=st.datetimes(min_value=datetime(1900, 1, 1),
                       max_value=datetime(2999, 12, 31)))
def test_timeutil_roundtrips(dt):
    dt = dt.replace(microsecond=0)
    iso = datetime_to_iso_date(dt)
    assert iso_date_to_datetime(iso) == dt
    ts = iso_date_to_timestamp14(iso)
    assert timestamp14_to_datetime(ts) == dt
    assert timestamp14_to_iso_date(ts) == iso


def test_timeutil_lenient_parsing():
    # ported reference doctest vectors (timeutils.py:225-320)
    assert timestamp14_to_datetime("2014122609501011") == \
        datetime(2014, 12, 26, 9, 50, 10)
    assert timestamp14_to_datetime("2014122609501") == \
        datetime(2014, 12, 26, 9, 50, 59)
    assert timestamp14_to_datetime("20141226095") == \
        datetime(2014, 12, 26, 9, 59, 59)
    assert timestamp14_to_datetime("2014122") == \
        datetime(2014, 12, 31, 23, 59, 59)
    assert timestamp14_to_datetime("201410") == \
        datetime(2014, 10, 31, 23, 59, 59)
    assert timestamp14_to_datetime("2") == \
        datetime(2999, 12, 31, 23, 59, 59)
    assert timestamp14_to_datetime("") == \
        datetime(2999, 12, 31, 23, 59, 59)
    assert timestamp14_to_datetime("20131709005601") == \
        datetime(2013, 12, 9, 0, 56, 1)
    assert timestamp14_to_datetime("40001965252477") == \
        datetime(2999, 12, 31, 23, 24, 59)
    assert timestamp14_to_datetime("2010abc") == \
        datetime(2010, 12, 31, 23, 59, 59)
    assert pad_timestamp("20") == "209912"
    assert iso_date_to_datetime("2013-12-26T10:11:12.30Z") == \
        datetime(2013, 12, 26, 10, 11, 12, 300000)
    assert iso_date_to_datetime("2013-12-26T10:11:12.0000001Z") == \
        datetime(2013, 12, 26, 10, 11, 12)


def test_digest_compare_vectors():
    """b16/b64/b64url stored digests normalize to b32 (ported from
    test_digestverifyingreader.py:7-26 semantics)."""
    raw = sha1_b32(b"hello digest")
    _, b32val = raw.split(":", 1)
    binary = base64.b32decode(b32val)
    b16 = "sha1:" + base64.b16encode(binary).decode()
    b64 = "sha1:" + base64.b64encode(binary).decode()
    b64url = "sha1:" + base64.urlsafe_b64encode(binary).decode()
    for variant in (raw, b16, b64, b64url):
        assert digests_match(raw, variant) is True
    assert digests_match(raw, "sha1:" + "A" * 32) is False
    assert digests_match(raw, None) is None
    assert digests_match(None, raw) is None
