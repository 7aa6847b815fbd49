"""Comparative corpus statistics: "Fightin' Words" log-odds with a
Dirichlet prior (Monroe, Colaresi & Quinn 2008) — which terms
distinguish one document group (a language, a host, a source) from
the rest of the corpus. The raw-ratio and tf-idf variants overweight
rare terms; the Dirichlet-smoothed log-odds delta

    d(w) = ln((y_t(w) + a) / (n_t + a0 - y_t(w) - a))
         - ln((y_r(w) + a) / (n_r + a0 - y_r(w) - a))

(y = term count in target/rest, n = group token totals, a = per-term
prior, a0 = a * V) is the standard corrected contrast. Deltas
quantize to int64 at 2^32 — the ln-equals-libm precedent shared with
bm25/dsir/the LM ladder, since the expression is ONE fixed float tree
over exact integer counts, identical in SQL.

Scale shape: map-side combined (term, in-target) partial counts feed
ONE distributed hash aggregate (O(vocab) rows move, never O(tokens) —
the top_terms combiner pattern); the vocab cut is a distributed
two-key sort + limit, so the UNBOUNDED term space never folds through
the driver (tree_aggregate is for bounded keys only, per its
contract); only the V vocab rows and the two group totals collect.

No reference counterpart — corpus-analytics operator per the build
brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["log_odds_terms"]


def log_odds_terms(ds, target_value: str, group_col: str = "lang",
                   text_col: str = "text", vocab_size: int = 512,
                   alpha: int = 1, topk: int = 20) -> pd.DataFrame:
    """Top-``topk`` terms most characteristic of the docs whose
    ``group_col`` equals ``target_value``, by quantized Dirichlet
    log-odds. Returns (term, y_target, y_rest, delta_q) ordered by
    (delta_q DESC, term)."""
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    def term_counts(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.findall(r"\S+")
        n = toks.str.len().to_numpy(dtype="int64")
        flat = np.concatenate(toks.to_numpy()) if len(batch) \
            else np.array([], dtype=object)
        tgt = np.repeat(
            (batch[group_col] == target_value).to_numpy(), n)
        df = pd.DataFrame({"term": flat, "t": tgt.astype("int64")})
        g = df.groupby(["term", "t"], sort=False).size() \
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    # one distributed hash aggregate over map-side combined cells:
    # O(vocab) rows shuffle, the term space never touches the driver
    cells = arrow_blocks(
        ds.map_batches(term_counts, batch_format="pandas")) \
        .groupby(["term", "t"]).aggregate(Sum("n", alias_name="n")) \
        .materialize()

    # group token totals: bounded fold (key space = {0, 1})
    def t_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("t", sort=False)["n"].sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    gt = tree_aggregate(
        cells.map_batches(t_partial, batch_format="pandas"),
        ["t"], sums=("n",))
    nt = int(gt.loc[gt["t"] == 1, "n"].sum())
    nr = int(gt.loc[gt["t"] == 0, "n"].sum())

    # vocab cut: distributed re-aggregate by term + two-key sort +
    # limit (exact under count ties) — only V rows collect
    def drop_t(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["term", "n"]]

    tot = arrow_blocks(
        cells.map_batches(drop_t, batch_format="pandas")) \
        .groupby("term").aggregate(Sum("n", alias_name="c")) \
        .sort(["c", "term"], descending=[True, False]) \
        .limit(vocab_size).to_pandas()
    vocab = tot["term"].to_numpy(dtype=object)

    # per-vocab-term group counts: broadcast membership filter, then
    # a <= 2V-row collect
    import ray
    vref = ray.put(set(vocab.tolist()))

    def in_vocab(batch: pd.DataFrame) -> pd.DataFrame:
        vs = ray.get(vref)
        return batch[batch["term"].isin(vs)]

    sub = cells.map_batches(in_vocab,
                            batch_format="pandas").to_pandas()
    pv = sub.pivot_table(index="term", columns="t", values="n",
                         aggfunc="sum", fill_value=0)
    yt = pv[1].reindex(vocab, fill_value=0).to_numpy(dtype="int64") \
        if 1 in pv.columns else np.zeros(len(vocab), dtype=np.int64)
    yr = pv[0].reindex(vocab, fill_value=0).to_numpy(dtype="int64") \
        if 0 in pv.columns else np.zeros(len(vocab), dtype=np.int64)

    a = float(alpha)
    a0 = float(alpha * len(vocab))
    # ONE fixed float expression tree (matches the SQL cast-for-cast)
    d = (np.log((yt + a) / (nt + a0 - yt - a))
         - np.log((yr + a) / (nr + a0 - yr - a)))
    dq = np.floor(d * float(np.int64(1) << np.int64(32))
                  + 0.5).astype(np.int64)

    out = pd.DataFrame({"term": vocab, "y_target": yt,
                        "y_rest": yr, "delta_q": dq})
    return out.sort_values(["delta_q", "term"],
                           ascending=[False, True]).head(topk) \
        .reset_index(drop=True)
