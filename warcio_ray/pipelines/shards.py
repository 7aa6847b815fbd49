"""Resumable partitioned training-shard writer — the last-mile sink of
the export flagship, built to the brief's resume rule: one directory
per bin-range shard, written atomically, so a crashed 100-TB export
reruns at the cost of only its MISSING shards (never one giant file,
never a rewrite of finished work).

Layout:
    out_dir/
      shard=K/            K = bin_id // bins_per_shard
        part.parquet      rows sorted by (bin_id, doc_off) — byte-
                          deterministic per shard
        _DONE             marker, written AFTER the data

Commit protocol per shard (same discipline as the layout appenders in
ops/search.py:155 / ops/ivf.py:321): write into a hidden tmp dir ->
one atomic ``os.rename`` to ``shard=K`` -> touch ``_DONE``. A torn
write leaves only a tmp dir (cleared on retry); a dir without its
marker is rewritten from scratch (rename was atomic, but cheap rewrite
beats proving the edge). Rerun cost is O(missing shards): finished
shards are SKIPPED — their group kernel returns a manifest row without
touching the data files.

Shape: one hash shuffle on the shard key, then each shard's rows land
in exactly one ``map_groups`` kernel that owns its directory — no
cross-task write races, no driver-side loop over shards.
"""
from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pandas as pd

SEGMENT_COLS = ["doc_id", "shuffle_rank", "bin_id",
                "doc_off", "bin_off", "n_tok"]


def write_training_shards(segments, out_dir: str,
                          bins_per_shard: int = 64):
    """Packed-segment Dataset (export_packed schema) -> shard dirs
    under ``out_dir`` + a small manifest DataFrame
    (shard, n_rows, n_bins, skipped) sorted by shard.

    Idempotent: rerunning over an existing out_dir rewrites ONLY the
    shards whose ``_DONE`` marker is missing."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[SEGMENT_COLS].copy()
        out["shard"] = (out["bin_id"].to_numpy(np.int64)
                        // np.int64(bins_per_shard))
        return out

    def write_one(grp: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        shard = int(grp["shard"].iloc[0])
        sdir = os.path.join(out_dir, f"shard={shard}")
        marker = os.path.join(sdir, "_DONE")
        row = {"shard": np.array([shard], dtype="int64"),
               "n_rows": np.array([len(grp)], dtype="int64"),
               "n_bins": np.array([grp["bin_id"].nunique()],
                                  dtype="int64")}
        if os.path.exists(marker):
            row["skipped"] = np.array([True])
            return pd.DataFrame(row)
        # complete-but-unmarked dirs (crash between rename and marker)
        # are rewritten; tmp dirs of torn writes are orphaned garbage
        # under a unique name and never read
        shutil.rmtree(sdir, ignore_errors=True)
        tmp = os.path.join(out_dir, f".tmp-shard={shard}-{uuid.uuid4().hex}")
        os.makedirs(tmp)
        body = grp[SEGMENT_COLS].sort_values(
            ["bin_id", "doc_off"], kind="mergesort").reset_index(drop=True)
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False),
                       os.path.join(tmp, "part.parquet"))
        os.rename(tmp, sdir)
        with open(marker, "w"):
            pass
        row["skipped"] = np.array([False])
        return pd.DataFrame(row)

    manifest = segments.map_batches(add_shard, batch_format="pandas") \
        .groupby("shard").map_groups(write_one, batch_format="pandas") \
        .to_pandas()
    if not len(manifest):
        return pd.DataFrame({"shard": pd.Series(dtype="int64"),
                             "n_rows": pd.Series(dtype="int64"),
                             "n_bins": pd.Series(dtype="int64"),
                             "skipped": pd.Series(dtype="bool")})
    return manifest.sort_values("shard").reset_index(drop=True)


def read_training_shards(out_dir: str):
    """Read back every COMMITTED shard (marker present) as one
    Dataset (segment columns; derive shard as bin_id//bins_per_shard
    if needed — it is a pure function of the row)."""
    import ray.data

    paths = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        sdir = os.path.join(out_dir, name)
        if os.path.exists(os.path.join(sdir, "_DONE")):
            paths.append(sdir)
    if not paths:
        return ray.data.from_pandas(pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in SEGMENT_COLS}))
    return ray.data.read_parquet(paths, file_extensions=["parquet"])
