"""Capstone integration: one slice through the WHOLE engine —

    pages -> per-shard WARC serialization -> distributed parse with
    digest verification -> text extraction parity against the golden
    text column -> quality/dedup/shuffle/pack export FROM THE ARCHIVE
    -> resumable shard sink -> read-back equal to the export computed
    straight from the source table.

The archive path and the table path must agree EXACTLY: the WARC
codec round-trip is byte-faithful, so downstream curation cannot tell
which input it ran on.
"""
import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def test_full_engine_end_to_end(ray_session, tmp_path):
    import ray.data

    from warcio_ray.codec.build import build_record, serialize_record
    from warcio_ray.codec.headers import HeaderBlock
    from warcio_ray.codec.records import ParseOptions
    from warcio_ray.html import extract_text_array
    from warcio_ray.pages import build_pages, read_pages
    from warcio_ray.pipelines.export import export_packed
    from warcio_ray.pipelines.shards import (read_training_shards,
                                             write_training_shards)
    from warcio_ray.sources.warc import read_warc

    sf = "/root/testdata/sf0.001"
    build_pages(sf)
    pages = read_pages(sf, columns=["url", "html"])
    warc_dir = str(tmp_path / "warc")
    os.makedirs(warc_dir)

    # 1. archive the crawl: one .warc.gz shard per pages block
    def write_shard(batch: pa.Table) -> pa.Table:
        blobs = []
        for row in batch.to_pylist():
            rid = "<urn:uuid:" + hashlib.md5(
                row["url"].encode()).hexdigest() + ">"
            rec = build_record(
                row["url"], "response", payload=row["html"],
                http_headers=HeaderBlock(
                    protocol="HTTP/1.0", statusline="200 OK",
                    pairs=[("Content-Type", "text/html; charset=UTF-8")]),
                id_fn=lambda rid=rid: rid,
                date_fn=lambda m: "2024-01-01T00:00:00Z")
            blobs.append(serialize_record(rec, gzip=True))
        name = hashlib.md5(
            batch["url"][0].as_py().encode()).hexdigest()[:12]
        with open(os.path.join(warc_dir, f"s-{name}.warc.gz"), "wb") as f:
            f.write(b"".join(blobs))
        return pa.table({"n": pa.array([len(blobs)], pa.int64())})

    n_pages = pages.count()
    n_written = int(pages.map_batches(
        write_shard, batch_format="pyarrow",
        batch_size=None).to_pandas()["n"].sum())
    assert n_written == n_pages

    # 2. distributed parse + digest verify + per-batch text parity
    paths = [os.path.join(warc_dir, f)
             for f in sorted(os.listdir(warc_dir))]
    recs = read_warc(paths, ParseOptions(check_digests=True))

    def to_docs(batch: pa.Table) -> pa.Table:
        ok = pc.all(batch["digest_passed"]).as_py()
        assert ok, "digest verification failed inside the archive path"
        text = extract_text_array(batch["payload"])
        ex = pc.extract_regex(pc.cast(batch["url"], pa.large_string()),
                              r"/doc/(?P<id>\d+)$")
        return pa.table({
            "doc_id": pc.cast(pc.struct_field(ex, "id"), pa.int64()),
            "text": pc.cast(text, pa.string())})

    docs_from_archive = recs.map_batches(to_docs, batch_format="pyarrow")

    # 3. text parity against the golden PAGES text column (the text
    # contract is defined at synthesis: pages.text = extract(html))
    def pages_docs(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(pc.cast(batch["url"], pa.large_string()),
                              r"/doc/(?P<id>\d+)$")
        return pa.table({
            "doc_id": pc.cast(pc.struct_field(ex, "id"), pa.int64()),
            "text": pc.cast(batch["text"], pa.string())})

    golden = read_pages(sf, columns=["url", "text"]) \
        .map_batches(pages_docs, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    got = docs_from_archive.to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, golden)

    # 4. curation export FROM THE ARCHIVE == export from the table
    seg_archive = export_packed(docs_from_archive, window=256) \
        .to_pandas().sort_values(["shuffle_rank", "bin_id"]) \
        .reset_index(drop=True)
    seg_table = export_packed(
        read_pages(sf, columns=["url", "text"])
        .map_batches(pages_docs, batch_format="pyarrow"),
        window=256).to_pandas() \
        .sort_values(["shuffle_rank", "bin_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(seg_archive, seg_table)

    # 5. resumable sink round-trip + token-mass conservation
    out_dir = str(tmp_path / "shards")
    write_training_shards(
        ray.data.from_pandas(seg_archive), out_dir, bins_per_shard=8)
    back = read_training_shards(out_dir).to_pandas()
    assert int(back["n_tok"].sum()) == int(seg_table["n_tok"].sum())
    assert len(back) == len(seg_table)
