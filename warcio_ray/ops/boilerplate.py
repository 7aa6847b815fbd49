"""Cross-document boilerplate line removal (RefinedWeb / CCNet line
dedup): within each group (a host / source), any non-blank line that
appears in at least ``min_docs`` DISTINCT documents is boilerplate —
nav bars, footers, cookie banners — and every occurrence is removed;
each document's surviving lines re-join in their original order.

Unlike ``dedup.paragraph_dedup`` (keep FIRST occurrence corpus-wide),
the frequency rule here deletes ALL occurrences of a popular line, and
the popularity universe is per group, not global.

Scale shape: lines explode to (h, k) rows where h is a 128-bit blake2b
of (group, line) and k packs (doc_id << 20 | position) — text never
enters the wide exchange. Distinct-doc counting needs NO pre-shuffle
dedup pass: a (h, doc) pair can only originate from the single batch
holding that document row, so a per-batch ``drop_duplicates`` makes
pairs globally unique and ONE ``groupby(h).count()`` is the exact
distinct-document count. Removals join back to the narrow exploded
rows; the only join touching document text is the final id-keyed one,
where text moves exactly once (the paragraph_dedup precedent,
``dedup.py:1016``).

No reference counterpart (warcio has no text-cleaning layer); operator
family SURVEY §2.7.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["remove_boilerplate_lines", "boilerplate_lines"]

_LINE_POS_BITS = 20  # positions per doc packed into the low bits of k


def remove_boilerplate_lines(ds, min_docs: int = 3,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             group_col: str = "source",
                             num_partitions: Optional[int] = None):
    """Remove every occurrence of lines shared by >= ``min_docs``
    distinct docs within the same ``group_col`` value. Blank /
    whitespace-only lines never count and are never removed. Returns a
    Dataset of (id_col, text_col, n_removed) with stable row count.
    """
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a line needs at least "
                         "two distinct docs to be boilerplate)")
    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    cap = 1 << _LINE_POS_BITS

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").astype(str)
        parts = texts.str.split("\n", regex=False)
        lens = parts.str.len().to_numpy(dtype="int64")
        ids = batch[id_col].to_numpy(dtype="int64")
        if len(lens) and int(lens.max()) >= cap:
            raise ValueError(
                f"doc with >= 2^{_LINE_POS_BITS} lines; raise "
                "_LINE_POS_BITS (k packs id and position in one int64)")
        if len(ids) and int(ids.max()) >= (1 << (62 - _LINE_POS_BITS)):
            raise ValueError(f"{id_col} too large to pack with "
                             f"{_LINE_POS_BITS} position bits")
        rep_ids = np.repeat(ids, lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(int(lens.sum()), dtype="int64") - starts
        groups = np.repeat(batch[group_col].astype(str).to_numpy(
            dtype=object), lens)
        lines = [ln for lst in parts for ln in lst]
        # blank = empty after stripping ASCII spaces — the one charset
        # DuckDB's default trim() and str.strip(' ') agree on exactly
        keep = np.fromiter((bool(ln.strip(" ")) for ln in lines),
                           dtype=bool, count=len(lines))
        h = [hashlib.blake2b(
                (g + "\x1f" + ln).encode("utf-8"),
                digest_size=16).hexdigest()
             for g, ln, f in zip(groups, lines, keep) if f]
        k = rep_ids * cap + pos
        return pd.DataFrame({"h": h, "k": k[keep]})

    exploded = ds.map_batches(explode, batch_format="pandas")

    def batch_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        # (h, doc) pairs are globally unique after a PER-BATCH dedup:
        # each doc row lives in exactly one explode batch, so all of a
        # doc's lines (hence all its (h, doc) pairs) are local to it
        d = pd.DataFrame({"h": batch["h"],
                          "d": batch["k"].to_numpy(dtype="int64") // cap})
        return d.drop_duplicates()

    counts = arrow_blocks(
        exploded.map_batches(batch_distinct, batch_format="pandas")) \
        .groupby("h").aggregate(Count(alias_name="nd"))
    boiler = counts.filter(
        expr=f"nd >= {int(min_docs)}").select_columns(["h"])

    def to_removals(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["k"].to_numpy(dtype="int64")
        return pd.DataFrame({id_col: k // cap, "pos": k % cap})

    removals = safe_join(exploded, boiler, "inner", num_partitions,
                         ("h",)) \
        .map_batches(to_removals, batch_format="pandas")

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_part"] = (batch[id_col] % num_partitions).astype("int32")
        return batch

    def csv_partition(grp: pd.DataFrame) -> pd.DataFrame:
        # one group per partition: docs fold inside with a pandas agg
        # (per-group dispatch costs ~ms — the paragraph_dedup lesson)
        grp = grp.sort_values([id_col, "pos"], kind="mergesort")
        out = grp.assign(_s=grp["pos"].astype(str)) \
            .groupby(id_col, sort=False)["_s"] \
            .agg(",".join).reset_index(name="drop_csv")
        out[id_col] = out[id_col].astype("int64")
        return out

    drop_csv = removals.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(csv_partition, batch_format="pandas")
    joined = safe_join(ds.select_columns([id_col, text_col]), drop_csv,
                       "left_outer", num_partitions, (id_col,))

    def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
        out, removed = [], []
        for text, csv in zip(batch[text_col].fillna(""),
                             batch["drop_csv"]):
            if not isinstance(csv, str):
                out.append(text)
                removed.append(0)
            else:
                drop = {int(x) for x in csv.split(",")}
                parts = text.split("\n")
                out.append("\n".join(
                    p for i, p in enumerate(parts) if i not in drop))
                removed.append(len(drop))
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            text_col: out,
            "n_removed": np.asarray(removed, dtype="int64")})

    return joined.map_batches(rebuild, batch_format="pandas")


def boilerplate_lines(ds, pct: int = 60, host_col: str = "host",
                      id_col: str = "doc_id", text_col: str = "text"):
    """Per-host boilerplate line DETECTION — the audit companion to
    ``remove_boilerplate_lines`` above (which removes by absolute
    distinct-doc count): a line is boilerplate for a host when it
    appears in at least ``pct`` PERCENT of that host's documents
    (integer-exact: n_docs * 100 >= host_docs * pct), the CCNet-style
    document-frequency ratio rule.

    Scale shape: one map-side explode to per-doc DISTINCT (host,
    line) rows, ONE hash aggregate counting docs per (host, line),
    host doc totals via a bounded combiner tree (hosts are a small
    key space) broadcast into a stateless threshold filter. Returns a
    Dataset of (host, line, n_docs, host_docs)."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    def host_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(host_col, sort=False)[id_col].count()
        return pd.DataFrame({"host": g.index.to_numpy(dtype="int64"),
                             "n": g.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        ds.map_batches(host_partial, batch_format="pandas"),
        ["host"], sums=("n",))
    tot_hosts = totals["host"].to_numpy(dtype="int64")
    tot_n = totals["n"].to_numpy(dtype="int64")
    order = np.argsort(tot_hosts)
    tref = ray.put((tot_hosts[order], tot_n[order]))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch[text_col].str.split("\n")
        n = lines.str.len().to_numpy(dtype="int64")
        host = np.repeat(batch[host_col].to_numpy(dtype="int64"), n)
        doc = np.repeat(batch[id_col].to_numpy(dtype="int64"), n)
        flat = np.concatenate(lines.to_numpy()) if len(batch) \
            else np.array([], dtype=object)
        out = pd.DataFrame({"host": host, "doc_id": doc,
                            "line": flat})
        # per-doc distinct: a line repeated within one document still
        # counts that document once
        return out.drop_duplicates()

    counts = arrow_blocks(
        ds.map_batches(explode, batch_format="pandas")) \
        .groupby(["host", "line"]).aggregate(Count(alias_name="n_docs"))

    def threshold(batch: pd.DataFrame) -> pd.DataFrame:
        th, tn = ray.get(tref)
        host = batch["host"].to_numpy(dtype="int64")
        hd = tn[np.searchsorted(th, host)]
        keep = batch["n_docs"].to_numpy(dtype="int64") * 100 \
            >= hd * pct
        out = batch.loc[keep, ["host", "line", "n_docs"]].copy()
        out["host_docs"] = hd[keep]
        return out.astype({"host": "int64", "n_docs": "int64",
                           "host_docs": "int64"})

    return counts.map_batches(threshold, batch_format="pandas")
