"""Repeated-span scrubbing: remove word k-grams that recur across the
corpus (the word-granular approximation of repeated-substring removal,
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"). No warcio counterpart — LLM-pipeline operator per the build
brief.

Shape at scale:
  pass 1 (combiner): per-batch distinct-gram doc counts -> ONE
    groupby(gram_hash).sum -> filter ``n_docs >= min_docs``. Only
    O(per-batch distinct grams) rows shuffle, never O(tokens).
  pass 2: if the repeated set is small enough to broadcast
    (``<= broadcast_max`` grams) it ships ONCE via ray.put and the
    rewrite is a single stateless scan (no further shuffle). Above the
    bound, the corpus explodes to (doc_id, pos, gram_hash) rows and
    hash-joins against the repeated set — O(tokens) rows through one
    join, then a partition sweep packs per-doc hit positions and a
    doc_id join attaches them back to the text for the rewrite.

Gram identity is the high 60 bits of md5(gram) (15 hex chars — fits a
signed int64, no unsigned-dtype schema flapping) so an external SQL engine
can recompute the whole chain exactly (same trick as the winnowing
fingerprints in ``textstats``). At larger scales, hashing token ids
instead of building gram strings would cut the tokenize cost; the
current form keeps the oracle byte-exact.
"""
from __future__ import annotations

import hashlib
from collections import Counter
from typing import List, Optional

import numpy as np
import pandas as pd


def _gram_hash64(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)


def _doc_grams(text: Optional[str], k: int) -> List[str]:
    toks = (text or "").split()
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _scrub_one(text: Optional[str], k: int,
               starts: np.ndarray) -> "tuple[str, int]":
    """Drop every token covered by a repeated k-gram starting at one of
    ``starts`` (0-based token positions). Returns (clean_text,
    n_tokens_removed)."""
    toks = (text or "").split()
    if not len(starts) or not toks:
        return " ".join(toks), 0
    covered = np.zeros(len(toks), dtype=bool)
    for s in starts:
        covered[int(s):int(s) + k] = True
    kept = [t for t, c in zip(toks, covered) if not c]
    return " ".join(kept), int(covered.sum())


def repeated_gram_counts(ds, k: int = 3):
    """(doc_id, text) Dataset -> (gram_h uint64, n_docs int64) Dataset
    of per-gram DISTINCT-document counts. Each doc is a single row, so
    batch-local distinct + a Sum aggregate is an exact distinct-doc
    count — the classic combiner: only distinct grams leave a batch."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for text in batch["text"]:
            for g in set(_doc_grams(text, k)):
                c[_gram_hash64(g)] += 1
        if not c:
            return pd.DataFrame({
                "gram_h": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "gram_h": np.fromiter(c.keys(), dtype=np.int64, count=len(c)),
            "n_docs": np.fromiter(c.values(), dtype=np.int64, count=len(c))})

    from warcio_ray.ops.blocks import arrow_blocks

    return arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby("gram_h").aggregate(Sum("n_docs", alias_name="n_docs"))


def repeated_span_scrub(ds, k: int = 3, min_docs: int = 3,
                        broadcast_max: int = 1_000_000,
                        num_partitions: int = 32):
    """Remove every word k-gram span occurring in >= ``min_docs``
    distinct documents. Returns a (doc_id int64, clean_text string,
    n_removed int64) Dataset, one row per input doc (untouched docs pass
    through with n_removed == 0).

    ``broadcast_max`` bounds the repeated-gram set a worker may hold;
    above it the join path runs (one O(tokens) hash join + a doc_id
    join), below it the set broadcasts once and the rewrite is a single
    scan. Both paths are output-identical (tested)."""
    import ray

    from warcio_ray.ops.blocks import safe_join

    rep = repeated_gram_counts(ds, k=k) \
        .filter(expr=f"n_docs >= {int(min_docs)}") \
        .select_columns(["gram_h"]).materialize()
    n_rep = rep.count()

    if n_rep == 0:
        def passthrough(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "clean_text": [" ".join((t or "").split())
                               for t in batch["text"]],
                "n_removed": np.zeros(len(batch), dtype="int64")})
        return ds.map_batches(passthrough, batch_format="pandas")

    if n_rep <= broadcast_max:
        rep_ref = ray.put(frozenset(
            int(h) for h in rep.to_pandas()["gram_h"].to_numpy()))

        def scrub(batch: pd.DataFrame) -> pd.DataFrame:
            rs = ray.get(rep_ref)
            ids, cleans, removed = [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                starts = np.array(
                    [i for i, g in enumerate(_doc_grams(text, k))
                     if _gram_hash64(g) in rs], dtype=np.int64)
                clean, n = _scrub_one(text, k, starts)
                ids.append(int(doc_id))
                cleans.append(clean)
                removed.append(n)
            return pd.DataFrame({
                "doc_id": np.array(ids, dtype="int64"),
                "clean_text": cleans,
                "n_removed": np.array(removed, dtype="int64")})

        return ds.map_batches(scrub, batch_format="pandas")

    # --- join path: repeated set too large to broadcast ---------------
    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, poss, hs = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            for i, g in enumerate(_doc_grams(text, k)):
                ids.append(int(doc_id))
                poss.append(i)
                hs.append(_gram_hash64(g))
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype="int64"),
            "pos": np.array(poss, dtype="int64"),
            "gram_h": np.array(hs, dtype="int64")})

    exploded = ds.select_columns(["doc_id", "text"]) \
        .map_batches(explode, batch_format="pandas")
    matched = safe_join(exploded, rep, "inner", num_partitions,
                        on=("gram_h",))

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (batch["doc_id"].to_numpy().astype(np.uint64)
                          % np.uint64(num_partitions)).astype("int32")
        return batch

    def pack_partition(grp: pd.DataFrame) -> pd.DataFrame:
        ids, blobs = [], []
        for doc_id, sub in grp.groupby("doc_id", sort=True):
            ids.append(int(doc_id))
            blobs.append(np.unique(
                sub["pos"].to_numpy().astype(np.int64)).tobytes())
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype="int64"),
            "starts": pd.Series(blobs, dtype="object")})

    packed = matched.map_batches(add_part, batch_format="pandas") \
        .groupby("_part").map_groups(pack_partition, batch_format="pandas")

    docs = ds.select_columns(["doc_id", "text"])
    joined = safe_join(docs, packed, "left_outer", num_partitions,
                       on=("doc_id",))

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        has_starts = "starts" in batch.columns
        ids, cleans, removed = [], [], []
        for _, row in batch.iterrows():
            blob = row["starts"] if has_starts else None
            starts = (np.frombuffer(blob, dtype=np.int64)
                      if isinstance(blob, (bytes, bytearray))
                      else np.array([], dtype=np.int64))
            clean, n = _scrub_one(row["text"], k, starts)
            ids.append(int(row["doc_id"]))
            cleans.append(clean)
            removed.append(n)
        return pd.DataFrame({
            "doc_id": np.array(ids, dtype="int64"),
            "clean_text": cleans,
            "n_removed": np.array(removed, dtype="int64")})

    return joined.map_batches(rewrite, batch_format="pandas")


def novelty_scores(ds, k: int = 3, min_docs: int = 2,
                   broadcast_max: int = 5_000_000):
    """Per-document novelty: of a doc's word k-gram OCCURRENCES, how
    many belong to grams seen in >= ``min_docs`` distinct documents —
    the inverse prize signal curation pipelines use to favor novel
    content over recombined boilerplate (complement of the
    repeated-span mass `repeated_span_scrub` removes; same gram
    machinery). Returns (doc_id, n_grams, n_repeated) for EVERY doc
    (short docs score 0/0).

    Shape: the repeated-gram set from the distinct-per-batch combiner
    (only grams with df >= min_docs survive — the small side by
    construction) broadcasts once and scoring is a stateless re-scan;
    above ``broadcast_max`` repeated grams, the JOIN path runs instead
    (occurrence explode ⋈ repeated set on gram hash + per-doc count
    aggregates — O(tokens) narrow rows through one hash join, never a
    worker-resident gram set). Both paths output-identical (tested)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    rep = repeated_gram_counts(ds, k=k) \
        .filter(expr=f"n_docs >= {int(min_docs)}") \
        .select_columns(["gram_h"]).materialize()
    n_rep = rep.count()

    if n_rep <= broadcast_max:
        rep_ref = ray.put(frozenset(
            int(h) for h in rep.to_pandas()["gram_h"].to_numpy())
            if n_rep else frozenset())

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            repset = ray.get(rep_ref)
            n_grams, n_repeated = [], []
            for text in batch["text"]:
                grams = _doc_grams(text, k)
                n_grams.append(len(grams))
                n_repeated.append(sum(
                    1 for g in grams if _gram_hash64(g) in repset))
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "n_grams": np.array(n_grams, dtype="int64"),
                "n_repeated": np.array(n_repeated, dtype="int64")})

        return ds.map_batches(score, batch_format="pandas")

    # ---- join path: per-batch (doc, gram_h-occurrence) partials ----
    def occ_partials(batch: pd.DataFrame) -> pd.DataFrame:
        docs, hashes, counts = [], [], []
        for doc, text in zip(batch["doc_id"].astype("int64"),
                             batch["text"]):
            c: Counter = Counter(
                _gram_hash64(g) for g in _doc_grams(text, k))
            docs.extend([int(doc)] * len(c))
            hashes.extend(c.keys())
            counts.extend(c.values())
        return pd.DataFrame({
            "doc_id": np.array(docs, dtype="int64"),
            "gram_h": np.array(hashes, dtype="int64"),
            "occ": np.array(counts, dtype="int64")})

    occ = ds.map_batches(occ_partials, batch_format="pandas") \
        .materialize()
    num_partitions = min(
        32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    totals = arrow_blocks(occ).groupby("doc_id") \
        .aggregate(Sum("occ", alias_name="n_grams"))
    rep_counts = arrow_blocks(
        safe_join(occ, rep, "inner", num_partitions, ("gram_h",))) \
        .groupby("doc_id").aggregate(Sum("occ", alias_name="n_repeated"))

    joined = safe_join(
        safe_join(ds.select_columns(["doc_id"]), totals, "left_outer",
                  num_partitions, ("doc_id",)),
        rep_counts, "left_outer", num_partitions, ("doc_id",))

    def fill(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_grams": batch["n_grams"].fillna(0).astype("int64"),
            "n_repeated": batch["n_repeated"].fillna(0).astype("int64")})

    return joined.map_batches(fill, batch_format="pandas")
