"""Index pipeline: archive files -> NDJSON-style field projection.

Field semantics match the reference Indexer (indexer.py:64-81):
``offset``/``length`` are the record's byte provenance, ``http:status``
only for response/revisit records with http headers, ``http:<hdr>`` pulls
an HTTP header, anything else pulls a WARC header.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

from warcio_ray.codec.records import ParsedRecord


def index_record(record: ParsedRecord, fields: Iterable[str],
                 filename: str = "") -> Dict[str, str]:
    entry: Dict[str, str] = {}
    for field in fields:
        value: Optional[str] = None
        if field == "offset":
            value = str(record.offset)
        elif field == "length":
            value = str(record.record_length)
        elif field == "filename":
            value = os.path.basename(filename)
        elif field == "http:status":
            if record.rec_type in ("response", "revisit") and record.http_headers:
                value = record.http_headers.statuscode()
        elif field.startswith("http:"):
            if record.http_headers:
                value = record.http_headers.get(field[5:])
        else:
            value = record.warc_headers.get(field)
        if value is not None:
            entry[field] = value
    return entry


def index_records(records: Iterable[ParsedRecord], fields: Iterable[str],
                  filename: str = "") -> List[Dict[str, str]]:
    fields = list(fields)
    return [index_record(r, fields, filename) for r in records]


# ---------------------------------------------------------------------------
# Dataset-level index: projection over the T2 warc_records table
# ---------------------------------------------------------------------------

DEFAULT_FIELDS = ("offset", "warc-type", "warc-target-uri")


def _project_batch(batch, fields):
    """Vectorized-ish projection of index fields from T2 columns.

    offset/length/filename come straight from columns; header fields need
    a per-row scan of the ordered header lists (cheap: few headers each).
    """
    import pyarrow as pa

    n = len(batch)
    out = {}
    warc_headers = batch["warc_headers"].to_pylist()
    http_headers = batch["http_headers"].to_pylist()
    for field in fields:
        if field == "offset":
            out[field] = [str(v) if v is not None else None
                          for v in batch["offset"].to_pylist()]
        elif field == "length":
            out[field] = [str(v) if v is not None else None
                          for v in batch["length"].to_pylist()]
        elif field == "filename":
            out[field] = [os.path.basename(f) if f else None
                          for f in batch["filename"].to_pylist()]
        elif field == "http:status":
            rec_types = batch["rec_type"].to_pylist()
            lines = batch["http_statusline"].to_pylist()
            out[field] = [
                (line.split(" ", 1)[0] if line and rt in ("response", "revisit")
                 else None)
                for rt, line in zip(rec_types, lines)]
        elif field.startswith("http:"):
            want = field[5:].lower()
            vals = []
            for hdrs in http_headers:
                v = None
                if hdrs:
                    for h in hdrs:
                        if h["name"].lower() == want:
                            v = h["value"]
                            break
                vals.append(v)
            out[field] = vals
        else:
            want = field.lower()
            vals = []
            for hdrs in warc_headers:
                v = None
                if hdrs:
                    for h in hdrs:
                        if h["name"].lower() == want:
                            v = h["value"]
                            break
                vals.append(v)
            out[field] = vals
    return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})


def index_dataset(paths, fields=DEFAULT_FIELDS, verify_http: bool = False):
    """Archives -> dataset of index projections (write_json for NDJSON).

    Skips http parsing when no http: field is requested, exactly like the
    reference indexer's fast path (indexer.py:19).
    """
    from warcio_ray.codec.records import ParseOptions
    from warcio_ray.sources.warc import read_warc

    fields = list(fields)
    record_parse = any(f.startswith("http:") for f in fields)
    opts = ParseOptions(no_record_parse=not record_parse,
                        verify_http=verify_http, arc2warc=True)
    # the index never needs the sha1 dedup keys (indexer.py fast path)
    ds = read_warc(paths, parse_options=opts, compute_digests=False)
    return ds.map_batches(_project_batch, batch_format="pyarrow",
                          fn_kwargs={"fields": fields})


# ---------------------------------------------------------------------------
# CDXJ-style sorted capture index
# ---------------------------------------------------------------------------

def cdxj_index(paths, rec_types=("response", "revisit", "resource")):
    """Archives -> globally sorted CDXJ-style capture index: one row per
    capture with ``surt_key`` (SURT-canonicalized URL, the pywb/CDX sort
    key convention) and ``ts14`` (14-digit WARC-Date), sorted by
    (surt_key, ts14, filename, offset).

    The reference indexer (indexer.py:64-81) emits fields in file order;
    the CDX(J) convention the web-archive ecosystem consumes is the
    SAME projection globally sorted — which on Ray Data is a distributed
    range-partitioned sort over ONLY the narrow projection (payloads are
    never read: no_record_parse + compute_digests=False fast path, and
    only 6 scalar columns enter the shuffle).
    """
    import pandas as pd

    from warcio_ray.codec.records import ParseOptions
    from warcio_ray.sources.warc import read_warc

    opts = ParseOptions(no_record_parse=True, arc2warc=True)
    ds = read_warc(paths, parse_options=opts, compute_digests=False)
    keep = set(rec_types)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        from warcio_ray.frontier.surt import surt
        batch = batch[batch["rec_type"].isin(keep) & batch["url"].notna()]
        # records without a WARC-Date sort first under an all-zero ts14
        # (never NaN: a float column would poison the string schema)
        ts = pd.to_datetime(batch["warc_date"]).dt.strftime("%Y%m%d%H%M%S") \
            .fillna("00000000000000")
        return pd.DataFrame({
            "surt_key": [surt(u) for u in batch["url"]],
            "ts14": ts.to_numpy(),
            "url": batch["url"].to_numpy(),
            "rec_type": batch["rec_type"].to_numpy(),
            "filename": [os.path.basename(f) if f else ""
                         for f in batch["filename"]],
            "offset": batch["offset"].to_numpy(),
        })

    proj = ds.map_batches(project, batch_format="pandas")
    return proj.sort(["surt_key", "ts14", "filename", "offset"])


# ---------------------------------------------------------------------------
# persisted CDXJ layout + pruned-read lookup (the pywb replay query path)
# ---------------------------------------------------------------------------

def _shard_writer(out_dir: str, tag: str = ""):
    """Batch -> atomically-renamed parquet shard under
    ``out_dir/shards`` named by a content hash (first key, last key,
    row count), prefixed with ``tag`` to keep append generations from
    ever colliding with base-build shards. Returns the manifest row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_shard(batch: pa.Table) -> pa.Table:
        import hashlib
        keys = batch["surt_key"].to_pylist()
        if not keys:
            return pa.table({"path": pa.array([], pa.string()),
                             "min_key": pa.array([], pa.string()),
                             "max_key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # hash the FULL row content, not (first, last, count): two
        # single-key batches from a sort split collided under the old
        # rule, the second overwrote the first and the manifest
        # double-referenced it (one capture duplicated, one lost).
        # With full-content names a collision implies byte-identical
        # batches — double-referencing one file then reproduces the
        # duplicate rows exactly, so it stays correct.
        h = hashlib.md5()
        for col in batch.column_names:
            h.update("\x1f".join(
                map(str, batch[col].to_pylist())).encode("utf-8"))
            h.update(b"\x1e")
        name = h.hexdigest()[:12]
        final = os.path.join(out_dir, "shards",
                             f"part-{tag}{name}.parquet")
        tmp = final + ".tmp"
        pq.write_table(batch, tmp)
        os.replace(tmp, final)
        return pa.table({"path": [final], "min_key": [min(keys)],
                         "max_key": [max(keys)],
                         "n": pa.array([len(keys)], pa.int64())})

    return write_shard


def build_cdxj_layout(paths, out_dir: str, force: bool = False) -> str:
    """Persist the globally sorted CDXJ index (cdxj_index above) as
    range-partitioned parquet shards plus a tiny ``manifest.json`` of
    per-shard (min, max) SURT-key ranges — the layout a replay/lookup
    service (pywb's CDX server role) reads.  Because the index is
    range-sorted before writing, each shard covers a contiguous key
    range and a prefix lookup prunes to the few shards whose range
    overlaps — O(result) IO at any archive size, the text sibling of
    the IVF / postings layouts.  ``_DONE`` marker makes rebuilds
    skippable; shard writes are atomic-rename so a killed build never
    leaves a torn shard visible."""
    import json

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        return out_dir
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)

    manifest = cdxj_index(paths) \
        .map_batches(_shard_writer(out_dir), batch_format="pyarrow") \
        .to_pandas()
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest.to_dict(orient="records"), f)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def append_cdxj_layout(paths, layout_dir: str) -> str:
    """Append NEW archives' captures to a standing CDXJ layout — the
    incremental-index maintenance a continuous crawl needs (Common
    Crawl publishes its CDX index per crawl generation the same way;
    the reference indexer only ever writes a fresh full index).

    LSM-style: only the DELTA is indexed and sorted (O(new captures),
    never O(archive)); existing shards are untouched. Appended
    generations may overlap base shards' key ranges — lookup
    correctness is unchanged because ``plan_cdxj_files`` prunes each
    shard independently and ``cdxj_lookup`` merge-sorts the survivors.

    Idempotent per append batch: a fingerprint of the archive basenames
    is logged in ``appends.json``; re-appending the same batch is a
    no-op. Crash-safe: shards land via atomic rename first, then the
    manifest, then the log — a torn append is invisible (manifest never
    references its shards) and the retry rewrites identical files."""
    import hashlib
    import json

    if not os.path.exists(os.path.join(layout_dir, "_DONE")):
        raise FileNotFoundError(
            f"append_cdxj_layout: no built layout at {layout_dir} "
            "(run build_cdxj_layout first)")
    paths = list(paths)
    fp = hashlib.md5("\n".join(
        sorted(os.path.basename(str(p)) for p in paths))
        .encode()).hexdigest()
    log_path = os.path.join(layout_dir, "appends.json")
    log = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            log = json.load(f)
    if fp in log or not paths:
        return layout_dir
    gen = len(log) + 1

    new_rows = cdxj_index(paths) \
        .map_batches(_shard_writer(layout_dir, tag=f"g{gen}-"),
                     batch_format="pyarrow").to_pandas()

    man_path = os.path.join(layout_dir, "manifest.json")
    with open(man_path) as f:
        manifest = json.load(f)
    manifest.extend(new_rows.to_dict(orient="records"))
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)

    log.append(fp)
    tmp = log_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f)
    os.replace(tmp, log_path)
    return layout_dir


def compact_cdxj_layout(layout_dir: str) -> str:
    """Merge ALL standing shards (base + every append generation) into
    one freshly range-sorted shard set — the LSM compaction that
    restores the non-overlapping-range property appends erode (each
    append generation's shards may overlap base ranges, so prefix
    lookups read more shards per probe as generations pile up; after
    compaction pruning is minimal again). Observationally a no-op:
    ``cdxj_lookup`` merge-sorts survivors either way, so results are
    bit-identical before and after.

    Commit protocol: fresh ``c<N>-`` shards land via the same
    atomic-rename writer the builds use, then ONE atomic
    ``manifest.json`` rewrite installs the new shard list — a torn
    compaction is invisible (unreferenced files) and a retry rewrites
    identical content-hash names. ``appends.json`` is untouched, so
    batch idempotency survives compaction. Absorbed shard files are
    deleted best-effort AFTER the commit. Single writer assumed, like
    the appends."""
    import json
    import re

    import ray.data

    if not os.path.exists(os.path.join(layout_dir, "_DONE")):
        raise FileNotFoundError(
            f"compact_cdxj_layout: no built layout at {layout_dir} "
            "(run build_cdxj_layout first)")
    man_path = os.path.join(layout_dir, "manifest.json")
    with open(man_path) as f:
        manifest = json.load(f)
    if len(manifest) <= 1:
        return layout_dir  # zero/one shard: nothing to merge
    old_paths = [row["path"] for row in manifest]

    prev_c = max((int(m.group(1)) for row in manifest
                  if (m := re.search(r"part-c(\d+)-",
                                     os.path.basename(row["path"])))),
                 default=0)
    new_rows = ray.data.read_parquet(old_paths) \
        .sort(["surt_key", "ts14", "filename", "offset"]) \
        .map_batches(_shard_writer(layout_dir, tag=f"c{prev_c + 1}-"),
                     batch_format="pyarrow").to_pandas()

    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_rows.to_dict(orient="records"), f)
    os.replace(tmp, man_path)

    for p in old_paths:  # absorbed; manifest no longer references them
        try:
            os.remove(p)
        except OSError:
            pass
    return layout_dir


def plan_cdxj_files(manifest, prefixes):
    """Shard paths whose [min, max] key range can contain a key with
    any of the given SURT prefixes (the single place the range-overlap
    rule lives, so tests can observe pruning)."""
    picked = []
    for row in manifest:
        for p in prefixes:
            upper = p + "\U0010ffff"
            if row["max_key"] >= p and row["min_key"] < upper:
                picked.append(row["path"])
                break
    return picked


def cdxj_lookup(layout_dir: str, prefixes) -> "pd.DataFrame":
    """All captures whose SURT key starts with any probe prefix,
    reading ONLY the overlapping range shards. Returns rows sorted in
    CDX order (surt_key, ts14, filename, offset)."""
    import json

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    with open(os.path.join(layout_dir, "manifest.json")) as f:
        manifest = json.load(f)
    prefixes = sorted(set(map(str, prefixes)))
    files = plan_cdxj_files(manifest, prefixes)
    cols = ["surt_key", "ts14", "url", "rec_type", "filename", "offset"]
    if not files:
        return pd.DataFrame({c: pd.Series(
            dtype="int64" if c == "offset" else "object")
            for c in cols})

    def keep(batch):
        m = pc.starts_with(batch["surt_key"], pattern=prefixes[0])
        for p in prefixes[1:]:
            m = pc.or_(m, pc.starts_with(batch["surt_key"], pattern=p))
        return batch.filter(m)

    out = ray.data.read_parquet(files) \
        .map_batches(keep, batch_format="pyarrow").to_pandas()
    return out[cols].sort_values(
        ["surt_key", "ts14", "filename", "offset"],
        kind="mergesort").reset_index(drop=True)


def collapse_captures(captures, key_col: str = "urlkey",
                      ts_col: str = "ts_us", digest_col: str = "digest",
                      num_partitions: Optional[int] = None):
    """CDX-style capture collapse: many captures of the same URL ->
    ONE summary row per urlkey carrying the LATEST capture's fields
    plus capture statistics (the pywb/cdx `collapse=urlkey` + digest
    summary used to pick a replay canonical and to spot unchanged
    recrawls; the reference's indexer has no aggregation layer — this
    is the Ray-native extension over it, cf. indexer.py:64-81 for the
    per-record fields).

    Output: (key_col, ts_col = max ts, every other capture column from
    the winning row, n_captures, n_digests). Ties on ts keep the
    lexicographically-largest digest row (deterministic).

    Scale shape: ONE narrow key-hash shuffle (the partition-sweep
    idiom, cf. ops/dedup.candidate_pairs): every capture row of a key
    lands in the same partition, and the kernel computes counts,
    distinct digests and the lexicographic (ts, digest, rest) winner
    with vectorized pandas groupbys — no joins, no per-key Python
    calls, nothing corpus-sized on the driver. Text/html payloads
    should NOT be in `captures` (project them out; join summaries
    back by urlkey)."""
    import zlib

    import numpy as np
    import pandas as pd
    import ray

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        col = batch[key_col]
        if pd.api.types.is_integer_dtype(col):
            h = col.to_numpy().astype(np.uint64, copy=False)
        else:
            # batch-stable string hash (see dedup._col_hash for why
            # not hash_pandas_object)
            h = np.fromiter(
                (zlib.crc32(str(v).encode("utf-8")) for v in col),
                dtype=np.uint64, count=len(col))
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def summarize(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_part"])
        g = part.groupby(key_col, sort=False)
        n_captures = g.size()
        n_digests = g[digest_col].nunique()
        # winner: lexicographic max over (ts, digest, remaining
        # columns) — deterministic under any row arrival order
        order = [key_col, ts_col, digest_col] + [
            c for c in part.columns
            if c not in (key_col, ts_col, digest_col)]
        win = part.sort_values(order, kind="mergesort") \
            .groupby(key_col, sort=False).tail(1)
        win = win.set_index(key_col)
        win["n_captures"] = n_captures.astype("int64")
        win["n_digests"] = n_digests.astype("int64")
        return win.reset_index()

    return captures.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(summarize, batch_format="pandas")
