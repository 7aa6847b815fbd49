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

Scale shape: vocab = the top-``vocab_size`` terms by corpus count
(the top_terms combiner pattern), then ONE bounded fold of
(term, in-target) count cells (key space 2V) through a combiner tree;
the driver computes V deltas and keeps the top-k. Nothing
corpus-sized leaves the scan.

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
    from warcio_ray.ops.blocks import tree_aggregate

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

    # pass 1+2 fused: one fold keyed (term, in-target); the corpus
    # vocab cut and the group split both read from it
    cells = tree_aggregate(
        ds.map_batches(term_counts, batch_format="pandas"),
        ["term", "t"], sums=("n",))
    tot = cells.groupby("term", sort=False)["n"].sum() \
        .reset_index(name="c")
    tot = tot.sort_values(["c", "term"],
                          ascending=[False, True]).head(vocab_size)
    vocab = tot["term"].to_numpy(dtype=object)

    sub = cells[cells["term"].isin(vocab)]
    pv = sub.pivot_table(index="term", columns="t", values="n",
                         aggfunc="sum", fill_value=0)
    yt = pv[1].reindex(vocab, fill_value=0).to_numpy(dtype="int64") \
        if 1 in pv.columns else np.zeros(len(vocab), dtype=np.int64)
    yr = pv[0].reindex(vocab, fill_value=0).to_numpy(dtype="int64") \
        if 0 in pv.columns else np.zeros(len(vocab), dtype=np.int64)
    # group totals over the FULL token stream, not just the vocab cut
    nt = int(cells.loc[cells["t"] == 1, "n"].sum())
    nr = int(cells.loc[cells["t"] == 0, "n"].sum())

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
