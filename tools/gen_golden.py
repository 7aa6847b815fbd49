#!/usr/bin/env python
"""Generate golden WARC/ARC fixtures by RUNNING the reference implementation
(warcio 1.8.1 at /root/reference, imported read-only).

The committed outputs under tests/golden/ are data, not code: byte-exact
record serializations, archive files (valid / chunked / truncated /
bad-digest / non-chunked-gzip / ARC / uri-mutants), and the reference's own
parse results (rec-type sequences, offsets, index NDJSON, digest-check
verdicts) as JSON. The test suite then asserts that warcio_ray's codec
reproduces all of them without ever importing the reference.

Run:  python tools/gen_golden.py
"""

import base64
import io
import json
import os
import sys
import zlib

sys.path.insert(0, "/root/reference")

from warcio.archiveiterator import ArchiveIterator  # noqa: E402
from warcio.exceptions import ArchiveLoadFailed  # noqa: E402
from warcio.recordbuilder import RecordBuilder  # noqa: E402
from warcio.statusandheaders import StatusAndHeaders  # noqa: E402
from warcio.warcwriter import BufferWARCWriter  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

FIXED_ID = "<urn:uuid:12345678-feb0-11e6-8f83-68a86d1772ce>"
FIXED_DATE = "2000-01-01T00:00:00Z"
FIXED_DATE_MICROS = "2000-01-01T00:00:00.123456Z"


class FixedMixin:
    @classmethod
    def _make_warc_id(cls, id_=None):
        return FIXED_ID

    @classmethod
    def _make_warc_date(cls, use_micros=False):
        return FIXED_DATE_MICROS if use_micros else FIXED_DATE


class FixedWriter(FixedMixin, BufferWARCWriter):
    pass


class FixedBuilder(FixedMixin, RecordBuilder):
    pass


def sample_response(writer, url="http://example.com/", payload=b"some\ntext"):
    headers_list = [("Content-Type", 'text/plain; charset="UTF-8"'),
                    ("Custom-Header", "somevalue")]
    http_headers = StatusAndHeaders("200 OK", headers_list, protocol="HTTP/1.0")
    return writer.create_warc_record(url, "response",
                                     payload=io.BytesIO(payload),
                                     length=len(payload),
                                     http_headers=http_headers)


def sample_request(writer, url="http://example.com/"):
    headers_list = [("User-Agent", "foo"), ("Host", "example.com")]
    http_headers = StatusAndHeaders("GET / HTTP/1.0", headers_list,
                                    is_http_request=True)
    return writer.create_warc_record(url, "request", http_headers=http_headers)


def build_cases(writer):
    cases = {}
    cases["warcinfo"] = writer.create_warcinfo_record(
        "testfile.warc.gz",
        {"software": "recorder test", "format": "WARC File Format 1.0",
         "json-metadata": json.dumps({"foo": "bar"})})
    cases["response"] = sample_response(writer)
    cases["request"] = sample_request(writer)
    cases["revisit_empty"] = writer.create_revisit_record(
        "http://example.com/", "sha1:B6QJ6BNJ3R4B23XXMRKZKHLPGJY2VE4O",
        refers_to_uri="http://example.com/foo",
        refers_to_date="1999-01-01T00:00:00Z")
    http_headers = StatusAndHeaders(
        "200 OK", [("Content-Type", 'text/plain; charset="UTF-8"')],
        protocol="HTTP/1.0")
    cases["revisit_http"] = writer.create_revisit_record(
        "http://example.com/", "sha1:B6QJ6BNJ3R4B23XXMRKZKHLPGJY2VE4O",
        refers_to_uri="http://example.com/foo",
        refers_to_date="1999-01-01T00:00:00Z", http_headers=http_headers)
    cases["resource"] = writer.create_warc_record(
        "ftp://example.com/file.txt", "resource",
        payload=io.BytesIO(b"some\ntext"), warc_content_type="text/plain")
    cases["metadata"] = writer.create_warc_record(
        "http://example.com/", "metadata",
        payload=io.BytesIO(b'{"a": 1}'), warc_content_type="application/json")
    dns_payload = (b"20170509000739\nexample.com. 10 IN A 127.0.0.1")
    cases["dns_response"] = writer.create_warc_record(
        "dns:example.com", "response", payload=io.BytesIO(dns_payload),
        warc_content_type="text/dns")
    # unicode header value -> %-encoding path
    uh = StatusAndHeaders("200 OK",
                          [("Content-Type", 'text/plain; charset="UTF-8"'),
                           ("Unicode-Header", "\U0001f4c1 text \U0001f5c4️")],
                          protocol="HTTP/1.0")
    payload = b"some\ntext"
    cases["response_unicode"] = writer.create_warc_record(
        "http://example.com/", "response", payload=io.BytesIO(payload),
        length=len(payload), http_headers=uh)
    # WARC/1.1 with microsecond date
    w11 = FixedWriter(gzip=False, warc_version="1.1")
    cases["response_warc11"] = sample_response(w11)
    return cases


def record_bytes(case_builder, gzip):
    writer = FixedWriter(gzip=gzip)
    rec = case_builder(writer)
    writer.write_record(rec)
    return writer.get_contents()


def parse_expected(path, **iter_kwargs):
    """Reference parse result for one archive file."""
    out = {"records": [], "err_count": 0}
    with open(path, "rb") as fh:
        it = ArchiveIterator(fh, **iter_kwargs)
        try:
            for rec in it:
                content = rec.content_stream().read()
                entry = {
                    "rec_type": rec.rec_type,
                    "format": rec.format,
                    "url": rec.rec_headers.get_header("WARC-Target-URI"),
                    "offset": it.get_record_offset(),
                    "length": it.get_record_length(),
                    "warc_headers": list(rec.rec_headers.headers),
                    "http_statusline": rec.http_headers.statusline if rec.http_headers else None,
                    "http_protocol": rec.http_headers.protocol if rec.http_headers else None,
                    "http_headers": list(rec.http_headers.headers) if rec.http_headers else None,
                    "content_b64": base64.b64encode(content).decode(),
                    "digest_passed": rec.digest_checker.passed if rec.digest_checker else None,
                    "digest_problems": list(rec.digest_checker.problems) if rec.digest_checker else [],
                }
                out["records"].append(entry)
        except ArchiveLoadFailed as e:
            out["load_failed"] = str(e)[:100]
        out["err_count"] = it.err_count if it.record or True else 0
        out["err_count"] = it.err_count
    return out


def main():
    os.makedirs(os.path.join(GOLDEN, "records"),exist_ok=True)
    os.makedirs(os.path.join(GOLDEN, "files"), exist_ok=True)
    os.makedirs(os.path.join(GOLDEN, "expected"), exist_ok=True)

    # 1. per-record golden bytes (plain + gzip member)
    builders = {
        "warcinfo": lambda w: build_cases(w)["warcinfo"],
        "response": lambda w: build_cases(w)["response"],
        "request": lambda w: build_cases(w)["request"],
        "revisit_empty": lambda w: build_cases(w)["revisit_empty"],
        "revisit_http": lambda w: build_cases(w)["revisit_http"],
        "resource": lambda w: build_cases(w)["resource"],
        "metadata": lambda w: build_cases(w)["metadata"],
        "dns_response": lambda w: build_cases(w)["dns_response"],
        "response_unicode": lambda w: build_cases(w)["response_unicode"],
    }
    for name, fn in builders.items():
        with open(os.path.join(GOLDEN, "records", name + ".bin"), "wb") as f:
            f.write(record_bytes(fn, gzip=False))
        with open(os.path.join(GOLDEN, "records", name + ".gz.bin"), "wb") as f:
            f.write(record_bytes(fn, gzip=True))
    # WARC/1.1 record (micros date)
    w11 = FixedWriter(gzip=False, warc_version="1.1")
    rec = sample_response(w11)
    w11.write_record(rec)
    with open(os.path.join(GOLDEN, "records", "response_warc11.bin"), "wb") as f:
        f.write(w11.get_contents())

    # 2. multi-record archive files
    def multi(gzip):
        w = FixedWriter(gzip=gzip)
        w.write_record(w.create_warcinfo_record(
            "valid.warc.gz", {"software": "recorder test"}))
        for i in range(5):
            w.write_record(sample_response(
                w, url=f"http://example.com/page/{i}",
                payload=f"page {i}\ncontent".encode()))
            w.write_record(sample_request(w, url=f"http://example.com/page/{i}"))
        w.write_record(w.create_revisit_record(
            "http://example.com/page/0", "sha1:B6QJ6BNJ3R4B23XXMRKZKHLPGJY2VE4O",
            refers_to_uri="http://example.com/page/0",
            refers_to_date=FIXED_DATE))
        return w.get_contents()

    files = {}
    files["valid.warc"] = multi(gzip=False)
    files["valid.warc.gz"] = multi(gzip=True)

    # chunked transfer-encoding payload
    w = FixedWriter(gzip=False)
    chunked_body = b"3\r\nABC\r\n6\r\nDEFGHI\r\n0\r\n\r\n"
    http = StatusAndHeaders("200 OK",
                            [("Content-Type", "text/plain"),
                             ("Transfer-Encoding", "chunked")],
                            protocol="HTTP/1.0")
    w.write_record(w.create_warc_record(
        "http://example.com/chunked", "response",
        payload=io.BytesIO(chunked_body), length=len(chunked_body),
        http_headers=http))
    files["chunked.warc"] = w.get_contents()

    # gzip content-encoding payload
    w = FixedWriter(gzip=False)
    comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS + 16)
    gz_body = comp.compress(b"hello gzip world") + comp.flush()
    http = StatusAndHeaders("200 OK",
                            [("Content-Type", "text/plain"),
                             ("Content-Encoding", "gzip")],
                            protocol="HTTP/1.0")
    w.write_record(w.create_warc_record(
        "http://example.com/gzipped", "response",
        payload=io.BytesIO(gz_body), length=len(gz_body), http_headers=http))
    files["content-gzip.warc"] = w.get_contents()

    # truncated file: cut the valid.warc mid-payload of last record
    files["trunc.warc"] = files["valid.warc"][:-40]

    # bad digests: flip the first response's payload digest and the second
    # response's block digest (revisit digests are never checked, so avoid
    # touching those)
    import re as _re

    def flip_first(blob, header):
        rx = _re.compile(header + rb": sha1:([A-Z2-7]{8})")
        return rx.sub(header + rb": sha1:AAAAAAAB", blob, count=1)

    bad = flip_first(files["valid.warc"], rb"WARC-Payload-Digest")
    # second block digest (first is warcinfo's, whose payload check is absent)
    parts = bad.split(b"WARC-Block-Digest: sha1:")
    parts[2] = b"AAAAAAAB" + parts[2][8:]
    files["bad-digest.warc"] = b"WARC-Block-Digest: sha1:".join(parts)

    # non-chunked gzip: whole valid.warc as ONE gzip member
    comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS + 16)
    files["bad-non-chunked.warc.gz"] = comp.compress(files["valid.warc"]) + comp.flush()

    # uri mutants: wget <uri> wrapping + space in uri
    w = FixedWriter(gzip=False)
    rec = sample_response(w, url="http://example.com/some file")
    w.write_record(rec)
    mut = w.get_contents().replace(
        b"WARC-Target-URI: http://example.com/some%20file",
        b"WARC-Target-URI: http://example.com/some file")
    w2 = FixedWriter(gzip=False)
    rec2 = sample_response(w2, url="WRAPPED")
    w2.write_record(rec2)
    mut2 = w2.get_contents().replace(
        b"WARC-Target-URI: WRAPPED",
        b"WARC-Target-URI: <http://example.com/wrapped>")
    files["uri-mutants.warc"] = mut + mut2

    # legacy ARC (hand-rolled 5-field headers, one record + filedesc)
    arc_body = b"HTTP/1.0 200 OK\r\nContent-Type: text/plain\r\n\r\nhello arc"
    arc_rec = b"http://example.com/arc 127.0.0.1 20000101000000 text/plain " + \
        str(len(arc_body)).encode() + b"\n" + arc_body + b"\n"
    arc_filedesc_body = b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"
    arc_header = b"filedesc://test.arc 127.0.0.1 20000101000000 text/plain " + \
        str(len(arc_filedesc_body)).encode() + b"\n" + arc_filedesc_body + b"\n"
    files["legacy.arc"] = arc_header + arc_rec
    gz_members = b""
    for blob in (arc_header, arc_rec):
        comp = zlib.compressobj(9, zlib.DEFLATED, zlib.MAX_WBITS + 16)
        gz_members += comp.compress(blob) + comp.flush()
    files["legacy.arc.gz"] = gz_members

    for name, data in files.items():
        with open(os.path.join(GOLDEN, "files", name), "wb") as f:
            f.write(data)

    # 3. expected parse results from the reference
    expected = {}
    for name in files:
        path = os.path.join(GOLDEN, "files", name)
        kwargs = {"check_digests": True}
        if name.startswith("legacy"):
            expected[name] = {
                "plain": parse_expected(path, **kwargs),
                "arc2warc": None,  # arc2warc synthesizes uuids; checked structurally
            }
        else:
            expected[name] = {"plain": parse_expected(path, **kwargs)}
    with open(os.path.join(GOLDEN, "expected", "parses.json"), "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)

    # 4. index-style NDJSON from the reference indexer fields
    from warcio.indexer import Indexer

    class MemIndexer(Indexer):
        def __init__(self, fields, inputs):
            super().__init__(fields, inputs, None)
            self.lines = []

        def _write_line(self, out, index, record, filename):
            self.lines.append(index)

    idx_expected = {}
    for name in ("valid.warc", "valid.warc.gz", "legacy.arc"):
        path = os.path.join(GOLDEN, "files", name)
        ix = MemIndexer("offset,length,warc-type,warc-target-uri,http:status,http:content-type", [path])
        with open(path, "rb") as fh:
            ix.process_one(fh, None, path)
        idx_expected[name] = ix.lines
    with open(os.path.join(GOLDEN, "expected", "index.json"), "w") as f:
        json.dump(idx_expected, f, indent=1, sort_keys=True)

    print("golden fixtures written to", os.path.abspath(GOLDEN))


if __name__ == "__main__":
    main()
