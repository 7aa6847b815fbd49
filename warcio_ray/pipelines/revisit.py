"""Payload-digest dedup -> revisit records (the reference's dedup
primitive, recordbuilder.py:62-80 + README.rst:259-273 filter_func).

Semantics: within a warc_records dataset, the FIRST record per payload
digest (by (warc_date, url, offset) order — deterministic) stays a full
response; every later duplicate becomes a ``revisit`` record carrying
WARC-Profile + WARC-Refers-To-Target-URI/Date + the shared payload
digest, exactly the records warcio's capture filter_func writes.

Scale shape (real crawls run 30-60% payload-duplicate, so the winner
map is O(corpus) — it must never be driver-resident or broadcast):

  1. winner selection: only (digest, url, date, offset) KEY rows move
     through a groupby; payloads stay put.
  2. rewrite instructions: key rows hash-JOIN the winners Dataset on
     payload_digest (all-primitive columns — Arrow's acero join rejects
     nested non-key fields, so the full T2 table never joins) and
     non-winner duplicates become (filename, offset) -> refers-to rows.
  3. the instructions are spilled to a filename-hash-BUCKETED parquet
     side-channel; the rewrite ``map_batches`` loads only the buckets
     its batch's files hash into (file-per-task read fusion keeps a
     batch nearly single-file) through a small per-worker LRU. Driver
     memory stays O(1), worker memory O(bucket), and the corpus-sized
     table itself is never shuffled.
"""

from __future__ import annotations

import os
import uuid
import zlib
from collections import OrderedDict
from typing import Callable, Dict, Optional, Tuple

import pandas as pd
import pyarrow as pa

from warcio_ray.codec.build import build_revisit, default_warc_id
from warcio_ray.codec.timeutil import datetime_to_iso_date

# instruction side-channel: buckets per corpus. At 100 TB set this to
# ~the archive file count so one bucket ≈ one file's duplicate set and
# the rewrite task for a file reads ~its own instructions only.
NUM_INSTR_BUCKETS = 64

# per-worker LRU of loaded instruction buckets (a worker's read tasks
# revisit the same few buckets under file-per-task fusion)
_INSTR_CACHE_CAP = 8


def _response_keys(ds):
    """Project the corpus to the primitive response key rows
    (payload_digest, url, warc_date, offset, filename) — everything the
    winner groupby AND the instruction join need, so the expensive parse
    runs ONCE for both."""

    def keys_only(batch: pa.Table) -> pa.Table:
        t = batch.select(["payload_digest", "url", "warc_date",
                          "offset", "filename", "rec_type"]).filter(
            pa.compute.equal(batch["rec_type"], "response"))
        return t.drop_columns(["rec_type"])

    return ds.map_batches(keys_only, batch_format="pyarrow")


def _winners_from_keys(keys_ds):
    """Key rows -> one row per duplicated digest: (payload_digest,
    refers_to_uri, refers_to_date, winner_filename, winner_offset).
    Winner = first by (warc_date, url, offset); the (filename, offset)
    pair is the winner's IDENTITY for the instruction join — (url,
    warc_date) equality alone cannot distinguish the winner from a
    same-url same-second duplicate (WARC-Date is 1 s resolution).
    Returns a Dataset — only key rows shuffle."""

    def pick_winner(grp: pd.DataFrame) -> pd.DataFrame:
        cols = ["payload_digest", "refers_to_uri", "refers_to_date",
                "winner_filename", "winner_offset"]
        if len(grp) < 2:
            return pd.DataFrame({c: [] for c in cols})
        grp = grp.sort_values(["warc_date", "url", "offset"],
                              kind="mergesort")
        first = grp.iloc[0]
        return pd.DataFrame([{
            "payload_digest": first["payload_digest"],
            "refers_to_uri": first["url"],
            "refers_to_date": first["warc_date"],
            "winner_filename": first["filename"],
            "winner_offset": first["offset"],
        }])

    return keys_ds.groupby("payload_digest") \
        .map_groups(pick_winner, batch_format="pandas")


def find_revisit_targets_ds(ds):
    """warc_records dataset -> winner rows per duplicated digest
    (public shape: payload_digest, refers_to_uri, refers_to_date)."""
    return _winners_from_keys(_response_keys(ds)) \
        .select_columns(["payload_digest", "refers_to_uri",
                         "refers_to_date"])


def find_revisit_targets(ds, max_rows: int = 5_000_000) -> pd.DataFrame:
    """Driver-side convenience wrapper (small corpora / tests) —
    size-guarded: at corpus scale use ``find_revisit_targets_ds``."""
    from warcio_ray.ops.blocks import guarded_to_pandas

    return guarded_to_pandas(find_revisit_targets_ds(ds),
                             "find_revisit_targets",
                             "find_revisit_targets_ds", max_rows)


def _instr_bucket_of(filename: str, num_buckets: int) -> int:
    return zlib.crc32((filename or "").encode("utf-8")) % num_buckets


def _build_instructions(ds, instr_dir: str, num_buckets: int,
                        num_partitions: int = 16) -> int:
    """Key rows ⋈ winners -> bucketed instruction parquet; returns the
    number of instruction (rewrite) rows written.

    The key rows are MATERIALIZED once (tiny primitive columns; the
    object store spills them if needed) so the expensive archive parse
    feeds both the winner groupby and the join side with a single
    corpus pass — the whole revisit pipeline then costs two parse
    passes total (keys + rewrite), same as the pre-side-channel shape."""
    keys = _response_keys(ds).materialize()
    targets = _winners_from_keys(keys)
    joined = keys.join(targets, join_type="inner",
                       num_partitions=num_partitions,
                       on=("payload_digest",))

    def write_bucketed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        # the winner row itself keeps its full response; identity is
        # (filename, offset) — unique per record, unlike (url, date)
        is_winner = pc.and_(
            pc.equal(batch["filename"], batch["winner_filename"]),
            pc.equal(batch["offset"], batch["winner_offset"]))
        dup = batch.filter(pc.invert(pc.fill_null(is_winner, False)))
        if dup.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        df = dup.select(["filename", "offset", "refers_to_uri",
                         "refers_to_date"]).to_pandas()
        df["bucket"] = [_instr_bucket_of(f, num_buckets)
                        for f in df["filename"]]
        for b, grp in df.groupby("bucket"):
            d = os.path.join(instr_dir, f"bucket={int(b)}")
            os.makedirs(d, exist_ok=True)
            frag = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(pa.Table.from_pandas(
                grp.drop(columns=["bucket"]), preserve_index=False),
                frag + ".tmp")
            os.replace(frag + ".tmp", frag)
        return pa.table({"n": pa.array([len(df)], pa.int64())})

    counts = joined.map_batches(write_bucketed,
                                batch_format="pyarrow").to_pandas()
    return int(counts["n"].sum()) if "n" in counts.columns else 0


def _load_instr_bucket(instr_dir: str, bucket: int
                       ) -> Dict[Tuple[str, int], Tuple[str, object]]:
    import glob

    import pyarrow.parquet as pq

    out: Dict[Tuple[str, int], Tuple[str, object]] = {}
    for f in sorted(glob.glob(
            os.path.join(instr_dir, f"bucket={bucket}", "*.parquet"))):
        t = pq.read_table(f)
        for fn, off, uri, date in zip(t["filename"].to_pylist(),
                                      t["offset"].to_pylist(),
                                      t["refers_to_uri"].to_pylist(),
                                      t["refers_to_date"].to_pylist()):
            out[(fn, int(off))] = (uri, date)
    return out


# worker-process-global LRU: bucket id -> instruction dict
_INSTR_CACHE: "OrderedDict[Tuple[str, int], dict]" = OrderedDict()


def _instructions_for(instr_dir: str, bucket: int) -> dict:
    key = (instr_dir, bucket)
    hit = _INSTR_CACHE.get(key)
    if hit is not None:
        _INSTR_CACHE.move_to_end(key)
        return hit
    d = _load_instr_bucket(instr_dir, bucket)
    _INSTR_CACHE[key] = d
    while len(_INSTR_CACHE) > _INSTR_CACHE_CAP:
        _INSTR_CACHE.popitem(last=False)
    return d


def rewrite_duplicates_as_revisits(
        ds, id_fn: Callable[[], str] = default_warc_id,
        instr_dir: Optional[str] = None,
        num_buckets: int = NUM_INSTR_BUCKETS,
        num_partitions: int = 16):
    """Rewrite pass: responses whose (filename, offset) appears in the
    instruction side-channel become revisit rows; everything else passes
    through rebuilt in the same T2 schema.

    Returns a dataset in the T2 schema with duplicates rewritten.
    ``instr_dir`` (default: a fresh tempdir under /tmp) holds the
    bucketed instruction parquet between the two passes. On a
    multi-node cluster the default is only correct if /tmp is shared;
    pass a path on the shared filesystem / object-store mount every
    worker can read (the same assumption the bucketed pages layout and
    the persisted IVF layout already make).
    """
    from warcio_ray.sinks.warc import row_to_record
    from warcio_ray.sources.warc import records_to_table

    import tempfile

    if instr_dir is None:
        instr_dir = tempfile.mkdtemp(prefix="revisit-instr-",
                                     dir="/tmp")
    else:
        os.makedirs(instr_dir, exist_ok=True)
    # every invocation gets its OWN subdirectory: a reused caller dir
    # must neither mix fragments from an earlier run nor hit long-lived
    # workers' bucket cache for the old run (the cache key is
    # (dir, bucket), so a fresh dir is a fresh cache namespace)
    instr_dir = tempfile.mkdtemp(prefix="run-", dir=instr_dir)
    n_instr = _build_instructions(ds, instr_dir, num_buckets,
                                  num_partitions=num_partitions)
    if n_instr == 0:
        return ds

    def rewrite(batch: pa.Table) -> pa.Table:
        records = []
        filenames = []
        for row in batch.to_pylist():
            fn = row.get("filename") or ""
            winners = _instructions_for(
                instr_dir, _instr_bucket_of(fn, num_buckets))
            target = winners.get((fn, int(row.get("offset") or 0))) \
                if row.get("rec_type") == "response" else None
            if target is None:
                records.append(row_to_record(row))
            else:
                uri, date = target
                date_str = datetime_to_iso_date(date) if date is not None else ""
                rec = build_revisit(
                    row.get("url") or "", row.get("payload_digest"),
                    uri, date_str,
                    id_fn=id_fn,
                    date_fn=lambda m, d=row.get("warc_date"): (
                        datetime_to_iso_date(d) if d is not None
                        else "1970-01-01T00:00:00Z"))
                # revisit rows keep the byte provenance of the record
                # they replace
                rec.offset = row.get("offset") or 0
                rec.record_length = row.get("length") or 0
                records.append(rec)
            # batches can coalesce blocks from different files: carry the
            # filename per ROW, never stamp the batch with the first one
            filenames.append(fn)
        return records_to_table(records, "", filenames=filenames)

    return ds.map_batches(rewrite, batch_format="pyarrow")
