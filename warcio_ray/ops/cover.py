"""Greedy maximum-coverage selection (the classic (1 - 1/e)
submodular greedy, Nemhauser et al. 1978) — pick the k sources/hosts
whose documents jointly cover the most distinct vocabulary. The
coverage-style data-curation primitive (corpus down-selection that
keeps breadth, seed-list construction, eval-suite picking) next to the
geometric coresets (ops/coreset.py picks by distance, this picks by
set cover).

Determinism / oracle: terms become md5-derived 60-bit ints (hash once
per distinct token per worker, the _hash_memo pattern), the universe
is the DISTINCT (key, term-hash) pair set, and each greedy round picks
max marginal gain with ties broken by key ascending — fully replayable
in SQL as a MATERIALIZED-CTE unroll.

Scale shape: the pair set is built by per-batch distinct collapse +
one groupby (O(sum of per-key vocabularies) rows, text never moves),
materialized once and re-scanned k times. Each round broadcasts the
covered-hash array via ``ray.put`` (sorted int64, membership =
np.isin) and folds per-key uncovered counts through a bounded
groupby; only the single winner's uncovered hashes are pulled to the
driver, so driver state is O(covered vocabulary), never O(corpus).
At web scale the covered set stays compact because vocabularies
saturate (Heaps' law); for truly unbounded universes swap the exact
hash set for a fixed-width bitmap at the same call sites.

No reference counterpart (warcio has no curation layer).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["greedy_max_coverage"]

_hash_memo: dict = {}


def _hash_terms(terms) -> np.ndarray:
    memo = _hash_memo
    out = np.empty(len(terms), dtype=np.int64)
    for i, t in enumerate(terms):
        h = memo.get(t)
        if h is None:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            memo[t] = h
        out[i] = h
    return out


def greedy_max_coverage(ds, key_col: str, text_col: str = "text",
                        k: int = 8):
    """Greedily select ``k`` keys maximizing covered distinct term
    hashes. Returns a pandas DataFrame (pick_rank, key, gain) where
    ``gain`` is the exact marginal number of newly covered terms —
    rank 1 is the largest vocabulary outright. Already-picked keys
    leave the candidate pool; a round with an all-zero gain still
    picks (smallest candidate key), keeping exactly k rows whenever
    k distinct keys exist."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        keys_out, hashes = [], []
        for key, text in zip(batch[key_col].astype(str),
                             batch[text_col]):
            toks = set((text or "").split())
            if not toks:
                continue
            keys_out.extend([key] * len(toks))
            hashes.append(_hash_terms(sorted(toks)))
        if not keys_out:
            return pd.DataFrame({"key": pd.Series(dtype="object"),
                                 "h": pd.Series(dtype="int64")})
        out = pd.DataFrame({"key": keys_out,
                            "h": np.concatenate(hashes)})
        return out.drop_duplicates()  # local collapse pre-shuffle

    pairs = arrow_blocks(ds.map_batches(explode, batch_format="pandas")) \
        .groupby(["key", "h"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()

    picked: list = []
    covered = np.empty(0, dtype=np.int64)  # kept sorted
    rows = []
    for rank in range(1, k + 1):
        cref = ray.put(covered)
        done = tuple(picked)

        def gains(batch: pd.DataFrame, _cref=cref, _done=done
                  ) -> pd.DataFrame:
            cov = ray.get(_cref)
            b = batch[~batch["key"].isin(_done)]
            if not len(b):
                return pd.DataFrame({"key": pd.Series(dtype="object"),
                                     "g": pd.Series(dtype="int64")})
            fresh = b[~np.isin(b["h"].to_numpy(dtype="int64"), cov,
                               assume_unique=False)]
            g = fresh.groupby("key", sort=False).size() \
                .reset_index(name="g")
            # keys whose every term is covered still need a 0 row so
            # the zero-gain tie-break can see them
            allk = pd.DataFrame({"key": b["key"].unique()})
            g = allk.merge(g, on="key", how="left").fillna(0)
            return g.astype({"g": "int64"})

        per_key = pairs.map_batches(gains, batch_format="pandas") \
            .groupby("key").sum("g").to_pandas()
        if not len(per_key):
            break
        per_key = per_key.rename(columns={"sum(g)": "g"})
        per_key = per_key.sort_values(["g", "key"],
                                      ascending=[False, True],
                                      kind="mergesort")
        win_key = per_key.iloc[0]["key"]
        win_gain = int(per_key.iloc[0]["g"])
        picked.append(win_key)
        rows.append((rank, win_key, win_gain))
        if win_gain:
            wref = win_key

            def pull(batch: pd.DataFrame, _w=wref) -> pd.DataFrame:
                return batch[batch["key"] == _w][["h"]]

            won = pairs.map_batches(pull, batch_format="pandas") \
                .to_pandas()["h"].to_numpy(dtype="int64")
            covered = np.unique(np.concatenate([covered, won]))

    return pd.DataFrame(rows, columns=["pick_rank", "key", "gain"]) \
        .astype({"pick_rank": "int64", "gain": "int64"})
