"""Collocation / phrase mining over a text corpus: pointwise mutual
information of adjacent whitespace-token bigrams (Church & Hanks 1990,
"Word Association Norms, Mutual Information, and Lexicography") — the
classic tokenizer-prep signal for merging multiword units ("new york",
"machine learning") before BPE training, and a corpus-quality probe
(boilerplate corpora show degenerate high-PMI tails).

No warcio counterpart — LLM-pipeline operator per the build brief.

Shape at scale (two combiner scans + two hash joins, all bounded):
  pass 1: per-batch partial adjacent-bigram counts (vectorized
    explode + shift with doc-boundary masks — no per-token Python) ->
    one groupby(w1, w2) sum over batch-distinct partials, then the
    ``min_count`` filter bounds the candidate pair table before
    anything wide happens.
  pass 2: per-batch partial unigram counts -> groupby(term) sum; the
    corpus token total is a Dataset.sum over the already-reduced
    unigram table (no third corpus scan).
  join: the FILTERED pair table hash-joins the unigram table on w1
    then on w2 — O(candidate pairs) rows through each shuffle, never a
    driver-side vocabulary and no broadcast of an unbounded map.

PMI uses word counts for both marginals (Church & Hanks):
``pmi = ln(c12 * N / (c1 * c2))`` with N = total token count. Counts
are exact int64; only the final pmi value is floating (rounded by
callers for cross-engine compares). Output rows are the candidate
pairs themselves (sorted by (w1, w2) at the caller) — ranking by pmi
is the caller's choice, so no float-ordering tie hazard is baked in.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def _bigram_partial(batch: pd.DataFrame, text_col: str,
                    window: int = 1) -> pd.DataFrame:
    """Batch -> exact partial (w1, w2, c12) ordered co-occurrence
    counts at token distances 1..window (window=1: classic adjacent
    bigrams). Vectorized: one split/explode, one shift compare per
    distance for doc boundaries, one pandas groupby."""
    s = batch[text_col].fillna("").str.split()
    ex = s.explode().dropna()
    empty = pd.DataFrame({"w1": pd.Series(dtype="object"),
                          "w2": pd.Series(dtype="object"),
                          "c12": pd.Series(dtype="int64")})
    if len(ex) < 2:
        return empty
    idx = ex.index.to_numpy()
    w = ex.to_numpy()
    lefts, rights = [], []
    for d in range(1, window + 1):
        if len(w) <= d:
            break
        m = idx[d:] == idx[:-d]  # distance-d tokens of the SAME doc
        if m.any():
            lefts.append(w[:-d][m])
            rights.append(w[d:][m])
    if not lefts:
        return empty
    df = pd.DataFrame({"w1": np.concatenate(lefts),
                       "w2": np.concatenate(rights)})
    out = df.groupby(["w1", "w2"], sort=False).size().reset_index(
        name="c12")
    return out.astype({"c12": "int64"})


def _unigram_partial(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Batch -> exact partial (term, c) token counts."""
    ex = batch[text_col].fillna("").str.split().explode().dropna()
    if not len(ex):
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "c": pd.Series(dtype="int64")})
    out = ex.groupby(ex.values).size().reset_index()
    out.columns = ["term", "c"]
    return out.astype({"c": "int64"})


def pmi_collocations(ds, min_count: int = 2, text_col: str = "text",
                     num_partitions=None, window: int = 1):
    """(.., text) Dataset -> (w1, w2, c12, c1, c2, pmi) Dataset of all
    ordered co-occurrence pairs within ``window`` token distances with
    c12 >= ``min_count`` (window=1: classic adjacent-bigram
    collocations; window>1: the skipgram/word2vec co-occurrence
    statistic — pair mass grows ~window x tokens, still collapsed
    per batch before the shuffle). Unordered; callers sort (by
    (w1, w2) for compares, by pmi DESC for mining)."""
    import ray
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    pairs = arrow_blocks(
        ds.map_batches(_bigram_partial, batch_format="pandas",
                       fn_kwargs={"text_col": text_col,
                                  "window": int(window)})) \
        .groupby(["w1", "w2"]).aggregate(Sum("c12", alias_name="c12")) \
        .filter(expr=f"c12 >= {int(min_count)}")

    uni = arrow_blocks(
        ds.map_batches(_unigram_partial, batch_format="pandas",
                       fn_kwargs={"text_col": text_col})) \
        .groupby("term").aggregate(Sum("c", alias_name="c")) \
        .materialize()

    n_total = int(uni.sum("c") or 0)
    if n_total == 0:
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            "w1": pd.Series(dtype="object"),
            "w2": pd.Series(dtype="object"),
            "c12": pd.Series(dtype="int64"),
            "c1": pd.Series(dtype="int64"),
            "c2": pd.Series(dtype="int64"),
            "pmi": pd.Series(dtype="float64")}))

    def _rename(mapping):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns=mapping)
        return fn

    uni1 = uni.map_batches(_rename({"term": "w1", "c": "c1"}),
                           batch_format="pandas")
    uni2 = uni.map_batches(_rename({"term": "w2", "c": "c2"}),
                           batch_format="pandas")

    j1 = safe_join(pairs, uni1, "inner", num_partitions, ("w1",))
    j2 = safe_join(j1, uni2, "inner", num_partitions, ("w2",))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        c12 = batch["c12"].to_numpy(np.float64)
        c1 = batch["c1"].to_numpy(np.float64)
        c2 = batch["c2"].to_numpy(np.float64)
        pmi = np.log(c12 * float(n_total) / (c1 * c2))
        out = batch[["w1", "w2"]].copy()
        out["c12"] = batch["c12"].to_numpy(np.int64)
        out["c1"] = batch["c1"].to_numpy(np.int64)
        out["c2"] = batch["c2"].to_numpy(np.int64)
        out["pmi"] = pmi
        return out

    return j2.map_batches(score, batch_format="pandas")
