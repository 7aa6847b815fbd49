"""CLI + extract point-lookup pipelines."""

import json
import os

from warcio_ray.codec import ParseOptions, parse_archive_bytes
from warcio_ray.pipelines.extract import extract_bytes, extract_record

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "files")


def golden(name):
    return os.path.join(GOLDEN, name)


def test_extract_record_gzip():
    data = open(golden("valid.warc.gz"), "rb").read()
    res = parse_archive_bytes(data, ParseOptions())
    target = res.records[3]
    rec = extract_record(golden("valid.warc.gz"), target.offset)
    assert rec.rec_type == target.rec_type
    assert rec.url == target.url
    assert rec.payload == target.payload
    assert rec.record_length == target.record_length


def test_extract_record_plain():
    data = open(golden("valid.warc"), "rb").read()
    res = parse_archive_bytes(data, ParseOptions())
    target = res.records[2]
    rec = extract_record(golden("valid.warc"), target.offset)
    assert rec.rec_type == target.rec_type
    assert rec.payload == target.payload


def test_extract_bytes_modes():
    data = open(golden("valid.warc.gz"), "rb").read()
    res = parse_archive_bytes(data, ParseOptions())
    resp = next(r for r in res.records if r.rec_type == "response")
    payload = extract_bytes(golden("valid.warc.gz"), resp.offset,
                            payload_only=True)
    assert payload == resp.content()
    headers = extract_bytes(golden("valid.warc.gz"), resp.offset,
                            headers_only=True)
    assert headers.startswith(b"WARC/1.0\r\n")
    assert b"HTTP/1.0 200 OK" in headers
    assert payload not in headers


def test_cli_index_and_check(ray_session, capsys, tmp_path):
    from warcio_ray.cli import main

    out_file = str(tmp_path / "index.ndjson")
    rc = main(["index", golden("valid.warc.gz"),
               "-f", "offset,length,warc-type", "-o", out_file])
    assert rc == 0
    lines = [json.loads(l) for l in open(out_file)]
    assert len(lines) == 12
    assert lines[0]["warc-type"] == "warcinfo"

    assert main(["check", golden("valid.warc.gz")]) == 0
    assert main(["check", golden("bad-digest.warc")]) == 1
    captured = capsys.readouterr()
    assert "digest failed" in captured.out


def test_cli_wet_wat(ray_session, capsys, tmp_path):
    from warcio_ray.cli import main
    from warcio_ray.sources.warc import read_warc

    wet_dir, wat_dir = str(tmp_path / "wet"), str(tmp_path / "wat")
    assert main(["wet", golden("valid.warc.gz"), wet_dir]) == 0
    assert main(["wat", golden("valid.warc.gz"), wat_dir]) == 0
    out = capsys.readouterr().out
    assert "WET shard" in out and "WAT shard" in out

    import glob
    wet = read_warc(sorted(glob.glob(wet_dir + "/*.warc.gz"))).to_pandas()
    wat = read_warc(sorted(glob.glob(wat_dir + "/*.warc.gz"))).to_pandas()
    assert (wet.rec_type == "conversion").all() and len(wet) > 0
    assert (wat.rec_type == "metadata").all() and len(wat) == len(wet)


def test_cli_cdxj(ray_session, capsys, tmp_path):
    from warcio_ray.cli import main

    layout = str(tmp_path / "cdxj")
    assert main(["cdxj", golden("valid.warc.gz"), layout]) == 0
    assert os.path.exists(os.path.join(layout, "manifest.json"))
    captured = capsys.readouterr()
    assert "built CDXJ layout" in captured.out

    assert main(["cdxj", golden("valid.warc.gz"), layout,
                 "--lookup", "com,example)/page/1"]) == 0
    captured = capsys.readouterr()
    lines = [l for l in captured.out.splitlines() if l.strip()]
    assert lines and all(
        l.startswith("com,example)/page/1 ") for l in lines)
    assert "valid.warc.gz" in lines[0]
