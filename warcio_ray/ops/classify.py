"""Hashed-feature linear quality classifier — the fastText-style
"score every document with a linear model over hashed token features"
inference shape, run as an actor-pool map_batches stage.

The model here is deterministic (weights derived from the feature index
by a multiplicative hash) so the whole forward pass is recomputable in
SQL and hard-oracled; swapping in trained weights is a one-array change
(pass ``weights=``) — the Ray-side plumbing (load once per actor in
``__init__``, vectorized per-batch scoring, integer-exact accumulation)
is the part that matters at 100 TB.

Exactness: per-token contributions are int64 (weight table holds 32-bit
signed ints), so the per-doc accumulation is an integer sum — exact and
therefore ORDER-INDEPENDENT across any batching/partitioning, unlike a
float dot product. Only the final squash touches floats, on an integer
that matches the oracle bit-for-bit.

No reference counterpart (warcio has no scoring ops).
"""

from __future__ import annotations

import hashlib
import math
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["LinearQualityStage", "linear_quality_scores", "N_FEATURES",
           "naive_bayes_train_predict"]

N_FEATURES = 256
_KNUTH = 2654435761  # multiplicative-hash constant


def default_weights(n_features: int = N_FEATURES) -> np.ndarray:
    """Deterministic signed 32-bit weight per feature index:
    (j * 2654435761) mod 2^32, recentered to [-2^31, 2^31)."""
    j = np.arange(n_features, dtype=np.int64)
    return (j * _KNUTH) % (1 << 32) - (1 << 31)


class LinearQualityStage:
    """Callable class for ``map_batches(..., concurrency=N)``: the
    weight table and the per-token feature memo live once per actor."""

    def __init__(self, n_features: int = N_FEATURES,
                 weights: Optional[np.ndarray] = None):
        self.n_features = n_features
        self.weights = (np.asarray(weights, dtype=np.int64)
                        if weights is not None
                        else default_weights(n_features))
        self._feat_memo: dict = {}

    def _feature(self, tok: str) -> int:
        f = self._feat_memo.get(tok)
        if f is None:
            f = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8],
                    16) % self.n_features
            self._feat_memo[tok] = f
        return f

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        raws, ns = [], []
        w = self.weights
        for text in batch["text"]:
            toks = (text or "").split()
            if toks:
                feats = np.fromiter((self._feature(t) for t in toks),
                                    dtype=np.int64, count=len(toks))
                raw = int(w[feats].sum())  # exact int64 accumulation
            else:
                raw = 0
            raws.append(raw)
            ns.append(len(toks))
        raws = np.array(raws, dtype="int64")
        ns = np.array(ns, dtype="int64")
        # mean per-token logit in [-1, 1), then a sigmoid squash; the
        # float math runs on integers that already match the oracle
        logit = np.where(ns > 0, raws / (ns * float(1 << 31)), 0.0)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "raw_score": raws,
            "n_tokens": ns,
            "quality_prob": 1.0 / (1.0 + np.exp(-logit)),
        })


def linear_quality_scores(ds, n_features: int = N_FEATURES,
                          weights: Optional[np.ndarray] = None,
                          concurrency: int = 4, batch_size: int = 256):
    """Score every doc with the hashed-feature linear model; actor pool
    so the weight table / memo are built once per worker."""
    return ds.map_batches(
        LinearQualityStage, batch_format="pandas",
        fn_constructor_kwargs={"n_features": n_features,
                               "weights": weights},
        concurrency=concurrency, batch_size=batch_size, num_cpus=1)


# ---------------------------------------------------------------------------
# multinomial Naive Bayes: distributed TRAINING + scoring (the trained
# sibling of LinearQualityStage's fixed-weight inference)
# ---------------------------------------------------------------------------

def naive_bayes_train_predict(ds, text_col: str = "text",
                              label_col: str = "lang",
                              id_col: str = "doc_id",
                              vocab_size: int = 2048):
    """Train an add-1-smoothed multinomial Naive Bayes classifier on
    the corpus's own (text, label) pairs and predict every document's
    label — the classic supervised curation primitive (quality /
    language routing) with the TRAINING loop distributed, not just
    inference.

    Scale shape — three passes, nothing doc-sized ever shuffles:
      1. vocab = top_terms (combiner + exact 2-key sort + limit):
         O(vocab) rows move.
      2. per-(label, term-index) counts over the BOUNDED L x (V+1) key
         space (sentinel index -1 carries per-label doc counts) fold
         through ``tree_aggregate`` — each batch collapses to its
         distinct cells before anything moves.
      3. the driver builds the O(L*V) quantized model, broadcasts it
         via ``ray.put``, and a stateless scan scores each doc.

    Exactness: log-likelihoods and log-priors quantize to int64 at
    2^32 (q = floor(ln(p) * 2^32 + 0.5), the dsir/bm25 precedent:
    DuckDB's ln matches libm bit-for-bit), so each doc's per-label
    score is an exact INTEGER sum — partitioning/order-invariant and
    replayable in SQL. Ties argmax to the lexicographically smallest
    label. Bound: |q| <= ~2^37, so docs up to ~2^25 tokens stay inside
    int64. OOV tokens are dropped (mirrored in SQL). Needs >= 2
    distinct labels (margin_q is best minus runner-up).

    Returns a Dataset of (doc_id, <label_col>, pred, margin_q).
    No reference counterpart (warcio has no model layer); operator
    family SURVEY §2.7.
    """
    import ray

    from warcio_ray.ops.blocks import tree_aggregate
    from warcio_ray.ops.textstats import top_terms

    vocab = top_terms(ds, k=vocab_size)
    terms = list(vocab["term"])
    # hashed Index: one vectorized get_indexer call per batch replaces
    # the per-token dict loop (engine built once per worker — ray.get
    # memoizes the deserialized object)
    term_index = pd.Index(vocab["term"].astype(str))
    vref = ray.put(term_index)

    def cell_counts(batch: pd.DataFrame) -> pd.DataFrame:
        tindex = ray.get(vref)
        labs = batch[label_col].to_numpy(dtype=object)
        # sentinel tidx -1: doc count per label (value_counts, not
        # np.unique: null labels must survive to the explicit guard on
        # the folded table, not die in a None<str sort here)
        vc = batch[label_col].value_counts(dropna=False)
        frames = [pd.DataFrame({
            label_col: vc.index.to_numpy(dtype=object),
            "tidx": np.full(len(vc), -1, dtype="int64"),
            "n": vc.to_numpy(dtype="int64")})]
        parts = batch[text_col].fillna("").astype(str).str.split() \
            if len(batch) else pd.Series(dtype=object)
        lens = parts.str.len().to_numpy(dtype="int64")
        n_tok = int(lens.sum()) if len(lens) else 0
        if n_tok and len(tindex):
            flat = np.fromiter((w for lst in parts for w in lst),
                               dtype=object, count=n_tok)
            j = tindex.get_indexer(flat)
            keep = j >= 0  # OOV tokens are dropped (mirrored in SQL)
            lab_of = labs[np.repeat(np.arange(len(batch)), lens)][keep]
            grp = pd.DataFrame({label_col: lab_of, "tidx": j[keep]}) \
                .groupby([label_col, "tidx"], sort=False, dropna=False) \
                .size().reset_index(name="n")
            frames.append(grp)
        out = pd.concat(frames, ignore_index=True)
        out["tidx"] = out["tidx"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    folded = tree_aggregate(ds.map_batches(cell_counts,
                                           batch_format="pandas"),
                            key_cols=[label_col, "tidx"], sums=("n",))
    if folded[label_col].isna().any():
        raise ValueError(
            "naive_bayes_train_predict needs non-null labels (drop or "
            "impute null rows first)")
    labels = sorted(folded[label_col].unique())
    if len(labels) < 2:
        raise ValueError("naive_bayes_train_predict needs >= 2 labels")
    lidx = {g: i for i, g in enumerate(labels)}
    V, L = len(terms), len(labels)
    counts = np.zeros((V, L), dtype=np.int64)
    docs_per = np.zeros(L, dtype=np.int64)
    for lab, tj, n in zip(folded[label_col], folded["tidx"],
                          folded["n"]):
        if tj < 0:
            docs_per[lidx[lab]] = n
        else:
            counts[int(tj), lidx[lab]] = n
    scale = float(1 << 32)
    tok_tot = counts.sum(axis=0)  # in-vocab tokens per label
    loglik_q = np.floor(
        np.log((counts + 1.0) / (tok_tot + V)) * scale + 0.5) \
        .astype(np.int64)
    logprior_q = np.floor(
        np.log(docs_per / docs_per.sum()) * scale + 0.5) \
        .astype(np.int64)
    model = ray.put((term_index, labels, loglik_q, logprior_q))

    def predict(batch: pd.DataFrame) -> pd.DataFrame:
        tindex, labs, ll, lp = ray.get(model)
        n = len(batch)
        # (n, L) exact-integer scores: log-priors + np.add.at of each
        # in-vocab token's quantized log-likelihood row
        scores = np.tile(lp, (n, 1))
        parts = batch[text_col].fillna("").astype(str).str.split()
        lens = parts.str.len().to_numpy(dtype="int64")
        n_tok = int(lens.sum()) if n else 0
        if n_tok and len(tindex):
            flat = np.fromiter((w for lst in parts for w in lst),
                               dtype=object, count=n_tok)
            j = tindex.get_indexer(flat)
            keep = j >= 0
            doc_of = np.repeat(np.arange(n), lens)[keep]
            np.add.at(scores, doc_of, ll[j[keep], :])
        order = np.argsort(-scores, axis=1, kind="stable")  # ties: lowest label
        rows = np.arange(n)
        best, second = order[:, 0], order[:, 1]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            label_col: batch[label_col].to_numpy(dtype=object),
            "pred": np.asarray(labs, dtype=object)[best],
            "margin_q": (scores[rows, best]
                         - scores[rows, second]).astype("int64")})

    return ds.map_batches(predict, batch_format="pandas")


SCRIPT_RANGES = (
    # each script maps to one or more inclusive codepoint ranges;
    # latin is split so the ASCII punctuation [ \ ] ^ _ ` between
    # Z and a counts as 'other', not latin
    ("latin", ((0x0041, 0x005A), (0x0061, 0x007A))),  # A-Z, a-z
    ("greek", ((0x0370, 0x03FF),)),
    ("cyrillic", ((0x0400, 0x04FF),)),
    ("cjk", ((0x4E00, 0x9FFF),)),
)


def script_profile(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document writing-script profile — the i18n triage stage a
    multilingual pipeline runs BEFORE language ID (an n-gram langid
    model is useless on a script it never saw; routing by codepoint
    range is free and exact). Counts characters in fixed codepoint
    RANGES (not Unicode script properties, so the SQL regexp ranges
    replay it exactly) and names the dominant script (ties by the
    SCRIPT_RANGES order, 'other' only when no range matches).

    Vectorized: one utf-32 decode per batch + range masks — no
    per-character Python. Stateless scan, zero shuffle. Returns
    (id, n_latin, n_greek, n_cyrillic, n_cjk, n_other, main_script).
    """

    def profile(batch: pd.DataFrame) -> pd.DataFrame:
        texts = ["" if t is None else str(t) for t in batch[text_col]]
        n = len(texts)
        lens = np.array([len(t) for t in texts], dtype="int64")
        joined = "".join(texts)
        codes = np.frombuffer(joined.encode("utf-32-le"),
                              dtype=np.uint32).astype(np.int64)
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        counts = {}
        claimed = np.zeros(len(codes), dtype=bool)
        for name, ranges in SCRIPT_RANGES:
            m = np.zeros(len(codes), dtype=bool)
            for lo, hi in ranges:
                m |= (codes >= lo) & (codes <= hi)
            claimed |= m
            c = np.zeros(n, dtype="int64")
            np.add.at(c, doc[m], 1)
            counts[name] = c
        other = np.zeros(n, dtype="int64")
        np.add.at(other, doc[~claimed], 1)
        names = [r[0] for r in SCRIPT_RANGES]
        stacked = np.stack([counts[nm] for nm in names])
        best = np.argmax(stacked, axis=0)       # first max wins (tie rule)
        main = np.where(stacked.max(axis=0) > 0,
                        np.array(names, dtype=object)[best], "other")
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            "n_latin": counts["latin"], "n_greek": counts["greek"],
            "n_cyrillic": counts["cyrillic"], "n_cjk": counts["cjk"],
            "n_other": other, "main_script": main})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(profile, batch_format="pandas")
