"""Curation-signal evaluation metrics.

``signal_auc`` answers the question every quality-filter pipeline hits
before it trusts a signal: *how well does this score separate the
documents I want from the ones I don't?* — the exact ROC-AUC
(Mann-Whitney U with midrank tie handling) of one or more INTEGER
quality signals against a binary label.

Scale shape (the exact-quantile pattern, see ops/quantile.py):

  1. one stateless ``map_batches`` scan emits per-batch score
     HISTOGRAM partials ``(signal, score, pos_n, neg_n)`` — a combiner,
     so the shuffle carries counts, never documents;
  2. one bounded ``groupby(signal, score)`` sum — distinct rows are
     bounded by the signals' VALUE RANGES, not the corpus size
     (a length-like signal has ~1e5 distinct values at any corpus
     size);
  3. the driver finishes on the tiny histogram: with positives ``p(s)``
     and negatives ``n(s)`` per score and ``below(s)`` the cumulative
     negatives at strictly smaller scores,

         2*U = sum_s p(s) * (2*below(s) + n(s))
         AUC = U / (n_pos * n_neg)

     — exact integers until the final division (``2*U`` fits int64 up
     to ~4e9 documents; beyond that promote to Python ints).

Reference intent: warcio has no evaluation layer; this is part of the
training-data-pipeline extension mandated by the build brief (quality
scoring needs a way to be *validated*, not just computed).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .textstats import lexical_diversity_batch

# signals are columns of lexical_diversity_batch's output — all exact
# integers, so the DuckDB oracle reproduces them bit-for-bit.
DEFAULT_SIGNALS = ("n_chars", "n_words", "uniq_words")


def _auc_partials(batch: pd.DataFrame, signals, pos_label: str,
                  label_col: str) -> pd.DataFrame:
    """Per-batch (signal, score) -> (pos_n, neg_n) histogram combiner."""
    sig = lexical_diversity_batch(batch)
    pos = (batch[label_col].astype(str) == pos_label).to_numpy()
    out = []
    for name in signals:
        scores = sig[name].to_numpy(dtype="int64")
        # key = score*2 + is_pos keeps one np.unique per signal
        key = scores * 2 + pos.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        out.append(pd.DataFrame({
            "signal": name,
            "score": uk >> 1,
            "pos_n": np.where(uk & 1, cnt, 0).astype("int64"),
            "neg_n": np.where(uk & 1, 0, cnt).astype("int64"),
        }))
    if not out:
        return pd.DataFrame({"signal": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype="int64"),
                             "pos_n": pd.Series([], dtype="int64"),
                             "neg_n": pd.Series([], dtype="int64")})
    return pd.concat(out, ignore_index=True)


def signal_auc(ds, signals=DEFAULT_SIGNALS, pos_label: str = "en",
               label_col: str = "lang") -> pd.DataFrame:
    """Exact ROC-AUC of integer quality signals vs a binary label.

    Returns one row per signal: ``(signal, n_pos, n_neg, u2, auc)``
    where ``u2 = 2*U`` (exact int64) and ``auc`` is rounded to 6
    decimals. AUC ~ 0.5 means the signal carries no information about
    the label; the tie-midrank convention makes a constant signal read
    exactly 0.5.
    """
    sigs = tuple(signals)

    hist = ds.map_batches(
        lambda b: _auc_partials(b, sigs, pos_label, label_col),
        batch_format="pandas",
    ).groupby(["signal", "score"]).sum(["pos_n", "neg_n"])

    # bounded collect: rows <= sum of signal value ranges (see module
    # docstring) — the quantile-finishing pattern, never O(corpus).
    h = hist.to_pandas()
    h = h.rename(columns={"sum(pos_n)": "pos_n", "sum(neg_n)": "neg_n"})

    rows = []
    for name in sigs:
        g = h[h["signal"] == name].sort_values("score")
        p = g["pos_n"].to_numpy(dtype="int64")
        n = g["neg_n"].to_numpy(dtype="int64")
        below = np.concatenate(([0], np.cumsum(n)[:-1]))
        u2 = int(np.sum(p * (2 * below + n)))
        n_pos, n_neg = int(p.sum()), int(n.sum())
        auc = round(u2 / (2.0 * n_pos * n_neg), 6) if n_pos and n_neg \
            else 0.5
        rows.append((name, n_pos, n_neg, u2, auc))
    return pd.DataFrame(rows,
                        columns=["signal", "n_pos", "n_neg", "u2", "auc"])


def ann_recall_at_k(ds, queries, centroids, k: int = 10,
                    nprobe: int = 2) -> pd.DataFrame:
    """Recall@k of the APPROXIMATE IVF probe path against exact brute
    force — the acceptance measurement for any nprobe/n_centroids
    setting before trusting it at corpus scale (the similarity-search
    twin of ``lsh_eval`` on the dedup side).

    Runs ``ivf_search`` restricted to each query's ``nprobe`` closest
    of the given ``centroids`` and ``knn_bruteforce`` over the same
    Dataset, then intersects the two toplists per query. Both searches
    stream the corpus (broadcast queries, per-batch partial top-k);
    the intersection runs on 2*Q*k driver rows — small by
    construction at any corpus size. Centroids are passed EXPLICITLY
    so the measurement (and its SQL replay) is independent of any
    trainer. Returns (query_id, n_hits) int64, one row per query,
    n_hits in [0, k]."""
    from warcio_ray.ops.ivf import ivf_search
    from warcio_ray.ops.knn import knn_bruteforce

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    approx = ivf_search(ds, queries, k=k, nprobe=nprobe,
                        centroids=np.asarray(centroids,
                                             dtype=np.float64))
    exact = knn_bruteforce(ds, queries, k=k)
    rows = []
    for qi in range(len(queries)):
        a = set(approx[approx["query_id"] == qi]["vec_id"]
                .astype("int64"))
        e = set(exact[exact["query_id"] == qi]["vec_id"]
                .astype("int64"))
        rows.append((qi, len(a & e)))
    return pd.DataFrame(rows, columns=["query_id", "n_hits"]) \
        .astype("int64")


def kendall_signals(ds, s1: str = "n_words", s2: str = "uniq_words"
                    ) -> pd.DataFrame:
    """Exact Kendall tau-b agreement between two integer quality
    signals — do two filters RANK documents the same way, not just
    split them the same way (the question before replacing an
    expensive signal with a cheap proxy). Complements ``signal_auc``
    (signal vs label) with signal-vs-signal rank correlation.

    Shape at scale: the same bounded-histogram trick as the AUC — one
    stateless scan emits per-batch (s1, s2) CELL counts, one bounded
    combiner-tree sum (cells are bounded by the signals' value ranges,
    never the corpus), and the driver finishes the pair counting on
    the tiny cell table with exact Python ints:

        concordant = sum_{cells c < c'} h_c * h_{c'}   (both strictly)
        discordant = likewise with s2 reversed
        T1/T2/T12  = tie masses from the cell marginals
        tau_b = (C - D) / sqrt((n0 - T1) * (n0 - T2)),  n0 = n(n-1)/2

    Returns ONE row: (n, conc, disc, ties_s1, ties_s2, ties_both,
    tau_b) — every count exact int64, tau_b the only float (rounded
    to 6 decimals, computed from identical integers on both engines).
    """
    from warcio_ray.ops.blocks import tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sig = lexical_diversity_batch(batch)
        a = sig[s1].to_numpy(dtype="int64")
        b = sig[s2].to_numpy(dtype="int64")
        key = a * (int(b.max()) + 1 if len(b) else 1) + b
        uk, cnt = np.unique(key, return_counts=True)
        mb = (int(b.max()) + 1) if len(b) else 1
        return pd.DataFrame({"a": uk // mb, "b": uk % mb,
                             "h": cnt.astype("int64")})

    cells = tree_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["a", "b"], sums=("h",))
    if len(cells) == 0:
        return pd.DataFrame([{"n": 0, "conc": 0, "disc": 0,
                              "ties_s1": 0, "ties_s2": 0,
                              "ties_both": 0, "tau_b": 0.0}])

    a = cells["a"].to_numpy(dtype="int64")
    b = cells["b"].to_numpy(dtype="int64")
    h = cells["h"].to_numpy(dtype="int64")
    n = int(h.sum())
    n0 = n * (n - 1) // 2
    t12 = int((h * (h - 1) // 2).sum())

    def tie_mass(keys):
        tot = pd.Series(h).groupby(pd.Series(keys)).sum() \
            .to_numpy(dtype="int64")
        return int((tot * (tot - 1) // 2).sum())

    t1, t2 = tie_mass(a), tie_mass(b)
    # O(C^2) dominance count over the BOUNDED cell table (chunked to
    # cap the broadcast temp); exact int64 — h*h' sums fit far below
    # 2^63 for any n < 3e9
    conc = disc = 0
    for i0 in range(0, len(a), 2048):
        i1 = min(i0 + 2048, len(a))
        gt_a = a[i0:i1, None] < a[None, :]
        conc += int((h[i0:i1, None] * h[None, :]
                     * (gt_a & (b[i0:i1, None] < b[None, :]))).sum())
        disc += int((h[i0:i1, None] * h[None, :]
                     * (gt_a & (b[i0:i1, None] > b[None, :]))).sum())
    denom = (n0 - t1) * (n0 - t2)
    tau = round((conc - disc) / (denom ** 0.5), 6) if denom > 0 else 0.0
    return pd.DataFrame([{"n": n, "conc": conc, "disc": disc,
                          "ties_s1": t1, "ties_s2": t2,
                          "ties_both": t12, "tau_b": tau}]) \
        .astype({"n": "int64", "conc": "int64", "disc": "int64",
                 "ties_s1": "int64", "ties_s2": "int64",
                 "ties_both": "int64"})


def gains_table(ds, signals=DEFAULT_SIGNALS, pos_label: str = "en",
                label_col: str = "lang", bins: int = 10) -> pd.DataFrame:
    """Decile gains table (the binned companion of ``signal_auc``):
    documents are ranked by each integer signal and cut into
    ``bins`` rank buckets; each bucket reports its size and positive
    count — the lift chart a curation team reads before picking a
    filter threshold (AUC says whether a signal ranks well overall;
    the gains table says WHERE along the score axis the positives
    concentrate).

    Tie-safe exact binning: all documents sharing a score land in the
    bucket of the FIRST rank of that score group,
    bin = (count_of_strictly_smaller_scores * bins) // N — a pure
    function of the bounded (signal, score) histogram, so the whole
    computation is the one histogram shuffle ``signal_auc`` already
    pays, and the driver finishes on the tiny table.

    Returns (signal, bin, n, pos_n) rows, bins with zero mass absent.
    """
    from warcio_ray.ops.blocks import arrow_blocks

    sigs = tuple(signals)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return _auc_partials(batch, sigs, pos_label, label_col)

    from ray.data.aggregate import Sum
    hist = arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby(["signal", "score"]) \
        .aggregate(Sum("pos_n", alias_name="pos_n"),
                   Sum("neg_n", alias_name="neg_n")).to_pandas()
    if len(hist) == 0:
        return pd.DataFrame({"signal": pd.Series(dtype=object),
                             "bin": pd.Series(dtype="int64"),
                             "n": pd.Series(dtype="int64"),
                             "pos_n": pd.Series(dtype="int64")})
    rows = []
    for sig_name, grp in hist.groupby("signal", sort=True):
        grp = grp.sort_values("score", kind="mergesort")
        n_s = (grp["pos_n"] + grp["neg_n"]).to_numpy(dtype="int64")
        pos_s = grp["pos_n"].to_numpy(dtype="int64")
        total = int(n_s.sum())
        prev_cum = np.concatenate([[0], np.cumsum(n_s)[:-1]])
        b = (prev_cum * bins) // total
        for bb in np.unique(b):
            m = b == bb
            rows.append((sig_name, int(bb), int(n_s[m].sum()),
                         int(pos_s[m].sum())))
    return pd.DataFrame(rows, columns=["signal", "bin", "n", "pos_n"]) \
        .astype({"bin": "int64", "n": "int64", "pos_n": "int64"})


def bm25_ndcg(ds, terms, k: int = 10, text_col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    """nDCG@k of the BM25 ranking against the deterministic graded
    relevance rel(doc) = number of distinct query terms present
    (0..len(terms)) — the retrieval-quality eval next to ann_recall
    (vector side) and signal_auc (filter side): does the lexical
    ranker put the most-covered documents first?

    Quantized-exact contract: per-position gain is
    floor((2^rel - 1) * 2^32 / log2(pos + 1) + 0.5) — one fixed float
    expression (the libm-log2 precedent), integer-summed, so DCG and
    the ideal DCG are exact int64 and nDCG the single rounded float.
    The ideal ranking needs only the corpus-level relevance HISTOGRAM
    (positions fill rel-descending), never a global sort.

    Shape at scale: the BM25 pass is bm25_topk (two shuffle-free
    scans); relevance adds one combiner scan emitting the bounded
    (rel, count) histogram plus the broadcast-top-k members' grades.
    Returns ONE row (dcg_q, idcg_q, ndcg, n_rel1, n_rel2, n_rel3).
    """
    import math

    import ray

    from warcio_ray.ops.search import _term_patterns, bm25_topk
    from warcio_ray.ops.blocks import tree_aggregate

    terms = list(terms)
    ranked = bm25_topk(ds, terms, k=k, text_col=text_col,
                       id_col=id_col).to_pandas()
    ranked_ids = [int(i) for i in ranked[id_col]]
    idref = ray.put(frozenset(ranked_ids))
    pats = _term_patterns(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("").astype("string")
        rel = np.zeros(len(batch), dtype="int64")
        for p in pats:
            rel += (text.str.count(p) > 0).to_numpy()
        ids = batch[id_col].to_numpy(dtype="int64")
        member = np.isin(ids, np.fromiter(ray.get(idref), dtype="int64"))
        hist = pd.DataFrame({"kind": 0, "key": rel[rel > 0],
                             "n": np.int64(1)})
        mem = pd.DataFrame({"kind": 1, "key": ids[member],
                            "n": rel[member]})
        out = pd.concat([hist, mem], ignore_index=True)
        return out.groupby(["kind", "key"], sort=False, as_index=False) \
            .agg({"n": "sum"}) \
            .astype({"kind": "int64", "key": "int64", "n": "int64"})

    # kind 0 rows: (rel level, count); kind 1 rows: (doc_id, rel) with
    # n additive-safe because each doc appears in exactly one batch
    folded = tree_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["kind", "key"], sums=("n",))
    hist = {int(r.key): int(r.n) for r in folded.itertuples(index=False)
            if r.kind == 0}
    rel_of = {int(r.key): int(r.n) for r in folded.itertuples(index=False)
              if r.kind == 1}

    def gain(rel: int, pos: int) -> int:
        return int(math.floor((2 ** rel - 1) * 4294967296.0
                              / math.log2(pos + 1) + 0.5))

    dcg = sum(gain(rel_of.get(doc, 0), i + 1)
              for i, doc in enumerate(ranked_ids))
    ideal = []
    for lvl in sorted(hist, reverse=True):
        ideal.extend([lvl] * hist[lvl])
        if len(ideal) >= k:
            break
    idcg = sum(gain(lvl, i + 1) for i, lvl in enumerate(ideal[:k]))
    ndcg = round(dcg / idcg, 6) if idcg > 0 else 0.0
    return pd.DataFrame([{
        "dcg_q": dcg, "idcg_q": idcg, "ndcg": ndcg,
        "n_rel1": hist.get(1, 0), "n_rel2": hist.get(2, 0),
        "n_rel3": hist.get(3, 0)}]) \
        .astype({"dcg_q": "int64", "idcg_q": "int64", "n_rel1": "int64",
                 "n_rel2": "int64", "n_rel3": "int64"})


def kmeans_purity(ds, k: int = 4, iters: int = 3,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  label_col: str = "label",
                  num_partitions=None) -> pd.DataFrame:
    """Cluster purity of the exact-integer k-means against ground
    labels — the unsupervised-vs-labels eval (is the embedding space
    organized the way the labels say?): per cluster, the dominant
    label and its share. Purity = sum(top_n) / sum(size), derivable
    from the returned rows.

    Shape at scale: kmeans_exact's bounded Lloyd machinery, one
    (id, cluster)⋈(id, label) hash join, ONE bounded (cluster, label)
    contingency aggregate; the driver picks per-cluster argmax
    (n desc, label asc) on the tiny table. Returns (cluster, size,
    top_label, top_n)."""
    import ray
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks, safe_join
    from warcio_ray.ops.kmeans import kmeans_exact

    if num_partitions is None:
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))

    assign = kmeans_exact(ds.select_columns([id_col, vec_col]),
                          vec_col=vec_col, id_col=id_col,
                          k=k, iters=iters)

    def lab(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                             "label": batch[label_col].astype("int64")})

    labels = ds.map_batches(lab, batch_format="pandas")
    joined = safe_join(assign, labels, "inner", num_partitions,
                       (id_col,))
    ct = arrow_blocks(joined).groupby(["cluster", "label"]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    rows = []
    for cl, grp in ct.groupby("cluster", sort=True):
        grp = grp.sort_values(["n", "label"],
                              ascending=[False, True])
        rows.append((int(cl), int(grp["n"].sum()),
                     int(grp["label"].iloc[0]), int(grp["n"].iloc[0])))
    return pd.DataFrame(rows, columns=["cluster", "size",
                                       "top_label", "top_n"]) \
        .astype("int64")
