"""Golden conformance tests for the pure-Python codec.

Fixtures under tests/golden/ were produced by RUNNING the reference
implementation (tools/gen_golden.py); these tests assert that warcio_ray's
codec reproduces the reference byte-for-byte without importing it.
Mirrors the reference test strategy: test_writer.py golden record strings,
test_archiveiterator.py rec-type/offset sequences, test_cli.py index lines.
"""

import base64
import json
import os

import pytest

from warcio_ray.codec import (
    ArchiveFormatError,
    ParseOptions,
    build_record,
    build_revisit,
    build_warcinfo,
    parse_archive_bytes,
    serialize_record,
)
from warcio_ray.codec.headers import HeaderBlock

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

FIXED_ID = "<urn:uuid:12345678-feb0-11e6-8f83-68a86d1772ce>"
FIXED_DATE = "2000-01-01T00:00:00Z"
FIXED_DATE_MICROS = "2000-01-01T00:00:00.123456Z"


def fixed_id():
    return FIXED_ID


def fixed_date(use_micros=False):
    return FIXED_DATE_MICROS if use_micros else FIXED_DATE


FIXED = dict(id_fn=fixed_id, date_fn=fixed_date)


def load(name):
    with open(os.path.join(GOLDEN, "files", name), "rb") as f:
        return f.read()


def load_expected():
    with open(os.path.join(GOLDEN, "expected", "parses.json")) as f:
        return json.load(f)


EXPECTED = load_expected()


# ---------------------------------------------------------------------------
# Builder/serializer golden bytes (ported from test_writer.py:41-310 style)
# ---------------------------------------------------------------------------

def my_response(url="http://example.com/", payload=b"some\ntext"):
    http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                       pairs=[("Content-Type", 'text/plain; charset="UTF-8"'),
                              ("Custom-Header", "somevalue")])
    return build_record(url, "response", payload=payload, http_headers=http,
                        **FIXED)


def my_request(url="http://example.com/"):
    http = HeaderBlock(protocol="GET", statusline="/ HTTP/1.0",
                       pairs=[("User-Agent", "foo"), ("Host", "example.com")])
    return build_record(url, "request", http_headers=http, **FIXED)


def build_case(name):
    if name == "warcinfo":
        return build_warcinfo("testfile.warc.gz",
                              {"software": "recorder test",
                               "format": "WARC File Format 1.0",
                               "json-metadata": json.dumps({"foo": "bar"})},
                              **FIXED)
    if name == "response":
        return my_response()
    if name == "request":
        return my_request()
    if name == "revisit_empty":
        return build_revisit("http://example.com/",
                             "sha1:B6QJ6BNJ3R4B23XXMRKZKHLPGJY2VE4O",
                             "http://example.com/foo", "1999-01-01T00:00:00Z",
                             **FIXED)
    if name == "revisit_http":
        http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                           pairs=[("Content-Type", 'text/plain; charset="UTF-8"')])
        return build_revisit("http://example.com/",
                             "sha1:B6QJ6BNJ3R4B23XXMRKZKHLPGJY2VE4O",
                             "http://example.com/foo", "1999-01-01T00:00:00Z",
                             http_headers=http, **FIXED)
    if name == "resource":
        return build_record("ftp://example.com/file.txt", "resource",
                            payload=b"some\ntext",
                            warc_content_type="text/plain", **FIXED)
    if name == "metadata":
        return build_record("http://example.com/", "metadata",
                            payload=b'{"a": 1}',
                            warc_content_type="application/json", **FIXED)
    if name == "dns_response":
        return build_record("dns:example.com", "response",
                            payload=b"20170509000739\nexample.com. 10 IN A 127.0.0.1",
                            warc_content_type="text/dns", **FIXED)
    if name == "response_unicode":
        http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                           pairs=[("Content-Type", 'text/plain; charset="UTF-8"'),
                                  ("Unicode-Header", "\U0001f4c1 text \U0001f5c4️")])
        return build_record("http://example.com/", "response",
                            payload=b"some\ntext", http_headers=http, **FIXED)
    if name == "response_warc11":
        http = HeaderBlock(protocol="HTTP/1.0", statusline="200 OK",
                           pairs=[("Content-Type", 'text/plain; charset="UTF-8"'),
                                  ("Custom-Header", "somevalue")])
        return build_record("http://example.com/", "response",
                            payload=b"some\ntext", http_headers=http,
                            warc_version="WARC/1.1", **FIXED)
    raise KeyError(name)


SERIALIZE_CASES = ["warcinfo", "response", "request", "revisit_empty",
                   "revisit_http", "resource", "metadata", "dns_response",
                   "response_unicode", "response_warc11"]


@pytest.mark.parametrize("name", SERIALIZE_CASES)
def test_serialize_golden_plain(name):
    expected = open(os.path.join(GOLDEN, "records", name + ".bin"), "rb").read()
    got = serialize_record(build_case(name), gzip=False)
    assert got == expected


@pytest.mark.parametrize("name", [c for c in SERIALIZE_CASES
                                  if c != "response_warc11"])
def test_serialize_golden_gzip(name):
    expected = open(os.path.join(GOLDEN, "records", name + ".gz.bin"), "rb").read()
    got = serialize_record(build_case(name), gzip=True)
    assert got == expected


# ---------------------------------------------------------------------------
# Parser conformance vs reference parse results
# ---------------------------------------------------------------------------

PARSE_FILES = [n for n in EXPECTED if "load_failed" not in EXPECTED[n]["plain"]]


@pytest.mark.parametrize("name", sorted(PARSE_FILES))
def test_parse_matches_reference(name):
    exp = EXPECTED[name]["plain"]
    result = parse_archive_bytes(load(name), ParseOptions(check_digests=True))
    assert len(result.records) == len(exp["records"])
    assert result.err_count == exp["err_count"]
    for mine, ref in zip(result.records, exp["records"]):
        assert mine.rec_type == ref["rec_type"]
        assert mine.format == ref["format"]
        if mine.format == "arc":
            # plain ARC has no WARC-Target-URI header; the engine exposes
            # the ARC uri field as url (the reference keeps it internal)
            assert mine.url == mine.warc_headers.get("uri")
        else:
            assert mine.url == ref["url"]
        assert mine.offset == ref["offset"]
        assert mine.record_length == ref["length"]
        assert [list(p) for p in mine.warc_headers.pairs] == ref["warc_headers"]
        if ref["http_headers"] is None:
            assert mine.http_headers is None
        else:
            assert mine.http_headers is not None
            assert mine.http_headers.statusline == ref["http_statusline"]
            assert mine.http_headers.protocol == ref["http_protocol"]
            assert [list(p) for p in mine.http_headers.pairs] == ref["http_headers"]
        assert mine.content() == base64.b64decode(ref["content_b64"])
        assert mine.digest_passed == ref["digest_passed"]
        assert mine.digest_problems == ref["digest_problems"]


def test_non_chunked_gzip_rejected():
    assert "load_failed" in EXPECTED["bad-non-chunked.warc.gz"]["plain"]
    with pytest.raises(ArchiveFormatError):
        parse_archive_bytes(load("bad-non-chunked.warc.gz"), ParseOptions())


def test_non_chunked_gzip_lenient():
    """The recompress fallback parses the single-member file fully."""
    res = parse_archive_bytes(load("bad-non-chunked.warc.gz"),
                              ParseOptions(lenient=True))
    assert len(res.records) == len(EXPECTED["valid.warc"]["plain"]["records"])


# ---------------------------------------------------------------------------
# Round-trip byte identity (test_writer.py:571-600 / 827-845 analogue)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["valid.warc", "chunked.warc",
                                  "content-gzip.warc", "uri-mutants.warc",
                                  "bad-digest.warc"])
def test_round_trip_bytes(name):
    original = load(name)
    res = parse_archive_bytes(original, ParseOptions())
    out = b"".join(serialize_record(r, gzip=False) for r in res.records)
    if name == "uri-mutants.warc":
        # the parser normalizes the mutated URIs, so re-serialization
        # produces the *clean* form, not the mutant bytes
        assert b"<http://" not in out
        assert b"/some file" not in out
        return
    assert out == original


def test_round_trip_gzip_members():
    """gzip round-trip: member-split, parse, re-gzip -> identical file."""
    original = load("valid.warc.gz")
    res = parse_archive_bytes(original, ParseOptions())
    out = b"".join(serialize_record(r, gzip=True) for r in res.records)
    assert out == original


# ---------------------------------------------------------------------------
# Index projection (test_cli.py:29-65 analogue)
# ---------------------------------------------------------------------------

def test_index_lines_match_reference():
    with open(os.path.join(GOLDEN, "expected", "index.json")) as f:
        idx_expected = json.load(f)
    from warcio_ray.pipelines.index import index_records

    for name, lines in idx_expected.items():
        res = parse_archive_bytes(
            load(name), ParseOptions(arc2warc=True, id_fn=fixed_id))
        fields = "offset,length,warc-type,warc-target-uri,http:status,http:content-type"
        mine = index_records(res.records, fields.split(","))
        for m, ref in zip(mine, lines):
            ref.pop("warc-record-id", None)
            assert m == ref, (name, m, ref)
