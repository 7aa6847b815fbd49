"""Corpus card: the one-call dataset datasheet a curation pipeline
publishes next to a training corpus (doc counts, token mass, length
median, language spread, exact-duplicate mass).

Every metric is a combiner-shaped aggregate — per-batch partials of a
few int64s, merged by Dataset.sum / tree_aggregate — so the whole card
costs two narrow scans of the text column and O(1) driver memory at
any corpus size. All metrics are INTEGERS (counts, an exact histogram
median, md5-distinct counts), so the card is bit-reproducible at any
parallelism and recomputable in SQL — no float means whose sum order
would differ between engines.

No reference counterpart (warcio has no reporting layer).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["corpus_card"]


def corpus_card(ds, text_col: str = "text",
                lang_col: str = "lang") -> pd.DataFrame:
    """-> (metric, value) int64 rows, ordered by metric name:

    - ``dup_docs``: docs whose exact text (md5) appeared before —
      corpus minus distinct-text count
    - ``n_docs``, ``n_langs``
    - ``p50_tokens``: exact histogram median token count (rank rule
      (50*n + 99) // 100, same as ops/quantile.py)
    - ``total_chars``, ``total_tokens``
    """
    from warcio_ray.ops.blocks import tree_aggregate

    def partials_small(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].astype("string")
        n_tok = text.str.count(r"\S+").fillna(0).astype("int64")
        rows = {"kind": [], "key": [], "c": []}
        # scalar partials ride kind 0 (key encodes which scalar)
        for key, val in ((0, len(batch)),
                         (1, int(n_tok.sum())),
                         (2, int(text.str.len().fillna(0).sum()))):
            rows["kind"].append(0)
            rows["key"].append(key)
            rows["c"].append(val)
        # token-count histogram cells (kind 1) for the exact median
        vc = n_tok.value_counts()
        rows["kind"].extend([1] * len(vc))
        rows["key"].extend(vc.index.to_numpy(dtype="int64"))
        rows["c"].extend(vc.to_numpy(dtype="int64"))
        # distinct NON-NULL langs (kind 3): SQL COUNT(DISTINCT lang)
        # ignores NULLs, so this must too
        ls = {int(hashlib.md5(str(lv).encode("utf-8")).hexdigest()[:15],
                  16) for lv in batch[lang_col] if pd.notna(lv)}
        rows["kind"].extend([3] * len(ls))
        rows["key"].extend(ls)
        rows["c"].extend([1] * len(ls))
        return pd.DataFrame({"kind": np.array(rows["kind"], dtype="int64"),
                             "key": np.array(rows["key"], dtype="int64"),
                             "c": np.array(rows["c"], dtype="int64")})

    def partials_hash(batch: pd.DataFrame) -> pd.DataFrame:
        # distinct text hashes per batch (combiner before the shuffle);
        # a SEPARATE scan from partials_small so the per-doc md5 work
        # runs once, not once per consuming branch
        hs = {int(hashlib.md5((t if t is not None else "")
                              .encode("utf-8")).hexdigest()[:15], 16)
              for t in batch[text_col]}
        keys = np.fromiter(hs, dtype="int64", count=len(hs))
        return pd.DataFrame({"key": keys,
                             "bucket": keys % 4096})

    # NOTE the key space: kinds 0/1/3 are bounded (tree_aggregate);
    # kind 2 (text md5) is O(distinct docs) — an exact dup count needs
    # that shuffle, but NOT a per-key Ray group (3 ms of Python each):
    # bucket the hashes into 4096 bounded groups and nunique inside
    # each with vectorized pandas, then sum the 4096 counts.
    small = tree_aggregate(
        ds.map_batches(partials_small, batch_format="pandas"),
        ["kind", "key"], sums=("c",))
    if len(small) == 0:  # empty corpus: all-zero card
        small = pd.DataFrame({"kind": pd.Series(dtype="int64"),
                              "key": pd.Series(dtype="int64"),
                              "c": pd.Series(dtype="int64")})

    def bucket_nunique(grp: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"nd": [np.int64(grp["key"].nunique())]})

    nd = ds.map_batches(partials_hash, batch_format="pandas") \
        .groupby("bucket").map_groups(bucket_nunique,
                                      batch_format="pandas").to_pandas()
    n_distinct_text = int(nd["nd"].sum()) if len(nd) else 0

    scal = {int(k): int(c) for k, c in
            zip(small[small["kind"] == 0]["key"],
                small[small["kind"] == 0]["c"])}
    n_docs = scal.get(0, 0)
    hist = small[small["kind"] == 1].sort_values("key")
    p50 = 0
    if n_docs:
        rank = (50 * n_docs + 99) // 100
        cum = hist["c"].to_numpy(dtype="int64").cumsum()
        p50 = int(hist["key"].to_numpy(dtype="int64")[
            int(np.searchsorted(cum, rank))])
    card = {
        "dup_docs": n_docs - int(n_distinct_text),
        "n_docs": n_docs,
        "n_langs": int((small["kind"] == 3).sum()),
        "p50_tokens": p50,
        "total_chars": scal.get(2, 0),
        "total_tokens": scal.get(1, 0),
    }
    return pd.DataFrame(sorted(card.items()),
                        columns=["metric", "value"]) \
        .astype({"value": "int64"})
