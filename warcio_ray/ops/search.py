"""BM25 full-text ranked retrieval over a text column. No warcio
counterpart — LLM-pipeline operator per the build brief (corpus search /
relevance ranking, the Robertson-Sparck-Jones BM25 used by Lucene).

Shape at scale (two scans, zero shuffles):
  pass 1 (combiner): one tiny row per batch — doc count, token-length
    sum, and per-query-term document frequencies — reduced by a
    Dataset.sum. Only O(#batches x #terms) scalars ever leave workers.
  pass 2: idf / avgdl are plain Python floats captured in the scoring
    closure (a handful of scalars — no ray.put needed); each batch
    scores vectorized (pandas str.count regex kernels, numpy arithmetic)
    and emits its own top-k, so the final exact sort+limit runs over at
    most O(#batches x k) rows.

Token semantics are whitespace tokens (``\\S+``); a term matches a doc
token iff they are byte-equal (the ``(?<!\\S)term(?!\\S)`` counting
regex is exactly list-equality over the whitespace tokenization, which
is what an external SQL oracle recomputes with list_filter). Scoring
uses the +1-inside-log idf (Lucene's non-negative variant):
``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``.

Ties rank deterministically: score DESC, then id ASC.
"""
from __future__ import annotations

import math
import re
from typing import List, Sequence

import numpy as np
import pandas as pd


def _term_patterns(terms: Sequence[str]) -> List[str]:
    return [r"(?<!\S)" + re.escape(t) + r"(?!\S)" for t in terms]


def bm25_corpus_stats(ds, terms: Sequence[str], text_col: str = "text"):
    """-> (n_docs, sum_len, [df per term]) via one combiner scan."""
    pats = _term_patterns(terms)
    df_cols = [f"df_{i}" for i in range(len(pats))]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("").astype("string")
        row = {"n_docs": [np.int64(len(batch))],
               "sum_len": [np.int64(text.str.count(r"\S+").sum())]}
        for c, p in zip(df_cols, pats):
            row[c] = [np.int64((text.str.count(p) > 0).sum())]
        return pd.DataFrame(row)

    agg = ds.map_batches(partial, batch_format="pandas") \
        .sum(on=["n_docs", "sum_len"] + df_cols)
    n = int(agg["sum(n_docs)"])
    sum_len = int(agg["sum(sum_len)"])
    dfs = [int(agg[f"sum({c})"]) for c in df_cols]
    return n, sum_len, dfs


def bm25_topk(ds, terms: Sequence[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """(id, text) Dataset -> top-k (id, score) Dataset, score DESC /
    id ASC. Docs scoring 0 (no query term) never surface."""
    terms = list(terms)
    pats = _term_patterns(terms)
    n, sum_len, dfs = bm25_corpus_stats(ds, terms, text_col=text_col)
    avgdl = (float(sum_len) / float(n)) if sum_len > 0 else 1.0
    idfs = [math.log((n - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("").astype("string")
        dl = text.str.count(r"\S+").to_numpy(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        score = np.zeros(len(batch), dtype=np.float64)
        for idf, p in zip(idfs, pats):
            tf = text.str.count(p).to_numpy(np.float64)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + denom_base)
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "score": score})
        out = out[out["score"] > 0.0]
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    return ds.map_batches(score_batch, batch_format="pandas") \
        .sort(["score", id_col], descending=[True, False]).limit(k)


def rm3_topk(ds, terms: Sequence[str], k: int = 20,
             fb_docs: int = 10, fb_terms: int = 5,
             expansion_weight: float = 0.5,
             k1: float = 1.2, b: float = 0.75,
             text_col: str = "text", id_col: str = "doc_id"):
    """RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
    model, the Anserini/Indri default expansion): run BM25, mine
    expansion terms from the top ``fb_docs`` results, re-rank with the
    expanded weighted query — the retrieval-family rung above plain
    ``bm25_topk`` and the fusion ops.

    Determinism/oracle: expansion-term weights are EXACT integers
    (per feedback doc floor(tf * 2^32 / dl), summed — the RM1 MLE
    tf/|d| in fixed point), selection is (weight DESC, term ASC)
    excluding the original terms; final per-(doc, term) BM25
    contributions quantize to int64 at 2^32 BEFORE summation (one
    fixed float expression tree — the bm25_top20 precedent — but
    integer-summed, so the DYNAMIC term set needs no literal per-term
    SQL chain and the total is order-invariant). A zero-tf term
    contributes exactly floor(0.5) = 0 on both engines, so SQL's
    sparse (doc, term) join equals the dense numpy scan.

    Shape at scale: pass 1 = bm25_topk (two shuffle-free scans);
    pass 2 touches only the ``fb_docs`` feedback docs (broadcast id
    set, per-batch token fold, driver merge bounded by the feedback
    vocab); pass 3 = one stats combiner + one stateless scoring scan
    with per-batch top-k. Returns a top-k Dataset of
    (id_col, score_q), score_q DESC / id ASC."""
    import ray

    terms = list(terms)
    fb = bm25_topk(ds, terms, k=fb_docs, k1=k1, b=b,
                   text_col=text_col, id_col=id_col).to_pandas()
    fb_ids = frozenset(int(i) for i in fb[id_col])
    fbref = ray.put(fb_ids)
    big = np.int64(1) << np.int64(32)

    def fb_weights(batch: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(fbref)
        m = batch[id_col].astype("int64").isin(ids)
        sub = batch.loc[m, text_col].fillna("").astype("string")
        if not len(sub):
            return pd.DataFrame({"tok": pd.Series(dtype="object"),
                                 "wq": pd.Series(dtype="int64")})
        toks = sub.str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype="int64")
        keep = lens > 0
        toks, lens = toks[keep], lens[keep]
        flat = pd.DataFrame({
            "row": np.repeat(np.arange(len(toks)), lens),
            "tok": np.concatenate([np.asarray(t, dtype=object)
                                   for t in toks])})
        cts = flat.groupby(["row", "tok"], sort=False) \
            .size().reset_index(name="tf")
        dl = lens[cts["row"].to_numpy(dtype="int64")]
        cts["wq"] = (cts["tf"].to_numpy(dtype="int64") * big) // dl
        return cts.groupby("tok", sort=False)["wq"].sum() \
            .reset_index()

    # bounded collect: rows <= the feedback docs' distinct vocabulary
    wdf = ds.map_batches(fb_weights, batch_format="pandas").to_pandas()
    if len(wdf):
        wdf = wdf.groupby("tok")["wq"].sum().reset_index()
        wdf = wdf[~wdf["tok"].isin(terms)]
        wdf = wdf.sort_values(["wq", "tok"],
                              ascending=[False, True]).head(fb_terms)
        expansion = [str(t) for t in wdf["tok"]]
    else:
        expansion = []

    all_terms = terms + expansion
    weights = [1.0] * len(terms) + [expansion_weight] * len(expansion)
    pats = _term_patterns(all_terms)
    n, sum_len, dfs = bm25_corpus_stats(ds, all_terms,
                                        text_col=text_col)
    avgdl = (float(sum_len) / float(n)) if sum_len > 0 else 1.0
    wi = [w * math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          for w, df in zip(weights, dfs)]
    scale = float(np.int64(1) << np.int64(32))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("").astype("string")
        dl = text.str.count(r"\S+").to_numpy(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        score_q = np.zeros(len(batch), dtype=np.int64)
        for w, p in zip(wi, pats):
            tf = text.str.count(p).to_numpy(np.float64)
            sq = np.floor(w * (tf * (k1 + 1.0)) / (tf + denom_base)
                          * scale + 0.5).astype(np.int64)
            score_q = score_q + sq  # exact int64, order-invariant
        out = pd.DataFrame({id_col: batch[id_col].astype("int64"),
                            "score_q": score_q})
        out = out[out["score_q"] > 0]
        return out.sort_values(["score_q", id_col],
                               ascending=[False, True]).head(k)

    return ds.map_batches(score_batch, batch_format="pandas") \
        .sort(["score_q", id_col], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# persisted inverted index (postings layout with pruned reads)
# ---------------------------------------------------------------------------

def _term_bucket(term: str, n_buckets: int) -> int:
    import hashlib
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8],
               16) % n_buckets


def build_postings_layout(ds, out_dir: str, n_buckets: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          force: bool = False) -> str:
    """Write the corpus inverted index — (term, doc_id, tf) posting
    rows — hive-partitioned by md5-hash term bucket (``bucket=K/``),
    the text sibling of the IVF vector layout (`ops/ivf.py:203`): a
    term lookup then READS only its bucket's files, so per-query IO is
    bucket-local no matter the corpus size.

    One distributed pass: each batch explodes to its (term, doc, tf)
    rows (per-doc value_counts, tf exact), Ray's parquet writer
    hash-routes them into the partition dirs. ``_DONE`` marker (with
    the bucket count) makes rebuilds resumable/skippable.
    """
    import os
    import shutil

    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        if open(marker).read().strip() == str(n_buckets):
            return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    ds.map_batches(_postings_explode, batch_format="pandas",
                   fn_kwargs={"text_col": text_col, "id_col": id_col,
                              "n_buckets": n_buckets}).write_parquet(
        os.path.join(out_dir, "postings"), partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write(str(n_buckets))
    return out_dir


def _postings_explode(batch: pd.DataFrame, text_col: str, id_col: str,
                      n_buckets: int) -> pd.DataFrame:
    """Vectorized split-explode-count (measured 9x over a per-doc
    value_counts loop at 2k docs/batch, identical rows)."""
    s = batch.set_index(batch[id_col].astype("int64"))[text_col] \
        .fillna("").str.split()
    ex = s.explode().dropna()
    if not len(ex):
        return pd.DataFrame({
            "term": pd.Series(dtype="object"),
            id_col: pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int64"),
            "bucket": pd.Series(dtype="int64")})
    out = ex.groupby([ex.index, ex.values]).size().reset_index()
    out.columns = [id_col, "term", "tf"]
    out = out[["term", id_col, "tf"]].astype({"tf": "int64"})
    # md5 once per DISTINCT term in the batch, not per posting
    bmap = {t: _term_bucket(t, n_buckets)
            for t in pd.unique(out["term"])}
    out["bucket"] = out["term"].map(bmap).astype("int64")
    return out


def append_postings_layout(ds_new, layout_dir: str, batch_tag: str,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    """Append NEW documents' postings to a standing inverted index —
    the incremental-index maintenance a continuous crawl's search side
    needs (Lucene's segment model: fresh segments land next to old
    ones, lookups read both). Completes the repo's incremental-layout
    family (exact hashes: incremental_dedup; LSH: append_lsh_layout;
    CDXJ: append_cdxj_layout).

    Only the DELTA is exploded — O(new postings), never O(corpus);
    base partitions are untouched. Each append batch writes into its
    own generation dir (``postings_g<N>/bucket=K/``) and COMMITS by
    atomically rewriting ``generations.json`` — a torn append is
    invisible (lookups list only committed generations) and a retry
    of the same ``batch_tag`` is a no-op (tag-idempotent, the caller's
    crawl-generation id is the natural tag).
    """
    import json
    import os

    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"append_postings_layout: no built layout at {layout_dir} "
            "(run build_postings_layout first)")
    n_buckets = int(open(marker).read().strip())

    gen_path = os.path.join(layout_dir, "generations.json")
    gens = []
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gens = json.load(f)
    if any(g["tag"] == batch_tag or
           batch_tag in g.get("absorbed_tags", []) for g in gens):
        return layout_dir

    gen_dir = f"postings_g{len(gens) + 1}"
    # a torn append (same gen number, any tag) may have left files
    # here; it was never committed, so clear before writing
    import shutil
    shutil.rmtree(os.path.join(layout_dir, gen_dir),
                  ignore_errors=True)
    ds_new.map_batches(_postings_explode, batch_format="pandas",
                       fn_kwargs={"text_col": text_col,
                                  "id_col": id_col,
                                  "n_buckets": n_buckets}) \
        .write_parquet(os.path.join(layout_dir, gen_dir),
                       partition_cols=["bucket"])

    gens.append({"tag": batch_tag, "dir": gen_dir})
    tmp = gen_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(gens, f)
    os.replace(tmp, gen_path)
    return layout_dir


def _postings_roots(layout_dir: str):
    """Current root dirs of a postings layout: the base ``postings``
    plus committed generations — unless a compaction entry
    (``replaces_base``) absorbed everything before it, in which case
    roots start there. Shared by lookup and compaction."""
    import json
    import os

    gens = []
    gen_path = os.path.join(layout_dir, "generations.json")
    if os.path.exists(gen_path):
        with open(gen_path) as f:
            gens = json.load(f)
    last_compact = max((i for i, g in enumerate(gens)
                        if g.get("replaces_base")), default=None)
    if last_compact is None:
        return ["postings"] + [g["dir"] for g in gens], gens
    return [g["dir"] for g in gens[last_compact:]], gens


def compact_postings_layout(layout_dir: str) -> str:
    """Merge the base + every committed append generation into ONE
    fresh bucket-partitioned dir — the LSM compaction step that keeps
    per-lookup file counts bounded as append generations accumulate
    (Lucene's segment merge). Observationally a NO-OP: postings rows
    are concatenated as-is (appends are new documents, and even a
    duplicate (term, doc) row would have been returned twice before
    compaction too), so any lookup is bit-identical before and after.

    Commit protocol: the merged rows land in an uncommitted
    ``postings_c<N>/`` dir, then ONE atomic ``generations.json``
    rewrite installs ``[{tag: __compact_N__, dir, replaces_base}]`` —
    the same single-manifest protocol the appends use, so a torn
    compaction is invisible and a retry converges. Absorbed dirs are
    deleted best-effort AFTER the commit (space reclaim). Single
    writer assumed, like the appends (sequential crawl generations).
    """
    import json
    import os
    import shutil

    import ray.data

    marker = os.path.join(layout_dir, "_DONE")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"compact_postings_layout: no built layout at "
            f"{layout_dir} (run build_postings_layout first)")
    n_buckets = int(open(marker).read().strip())

    roots, gens = _postings_roots(layout_dir)
    if len(roots) <= 1:
        return layout_dir  # single root: nothing to merge

    # monotonic c-numbering (NOT len(gens)+1: that can collide with a
    # standing compacted root, and the pre-write rmtree below would
    # then delete the compaction's own input)
    import re
    prev_c = max((int(m.group(1)) for g in gens
                  if (m := re.fullmatch(r"postings_c(\d+)", g["dir"]))),
                 default=0)
    comp_dir = f"postings_c{prev_c + 1}"
    assert comp_dir not in roots
    shutil.rmtree(os.path.join(layout_dir, comp_dir),
                  ignore_errors=True)
    paths = [os.path.join(layout_dir, r) for r in roots]
    paths = [p for p in paths if os.path.isdir(p)]

    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        # recompute the bucket from the term (md5 once per distinct
        # term) instead of trusting hive-partition inference
        out = batch[["term", "doc_id", "tf"]].copy()
        bmap = {t: _term_bucket(t, n_buckets)
                for t in pd.unique(out["term"])}
        out["bucket"] = out["term"].map(bmap).astype("int64")
        return out

    ray.data.read_parquet(paths, file_extensions=["parquet"]) \
        .map_batches(rebucket, batch_format="pandas") \
        .write_parquet(os.path.join(layout_dir, comp_dir),
                       partition_cols=["bucket"])

    # tag idempotency must survive compaction: remember every append
    # tag the merged dir absorbed so a replayed append stays a no-op
    absorbed = sorted({g["tag"] for g in gens} |
                      {t for g in gens
                       for t in g.get("absorbed_tags", [])})
    new_gens = [{"tag": f"__compact_{prev_c + 1}__",
                 "dir": comp_dir, "replaces_base": True,
                 "absorbed_tags": absorbed}]
    gen_path = os.path.join(layout_dir, "generations.json")
    tmp = gen_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_gens, f)
    os.replace(tmp, gen_path)

    for r in roots:  # absorbed; manifest no longer references them
        shutil.rmtree(os.path.join(layout_dir, r), ignore_errors=True)
    return layout_dir


def postings_lookup(layout_dir: str, terms, n_buckets: int = 64,
                    max_rows: int = 5_000_000) -> pd.DataFrame:
    """Exact (term, doc_id, tf) postings for a probe term set, reading
    ONLY the partitions the probes hash into (file-level pruning).
    Returns rows sorted by (term, doc_id).

    Driver memory is O(total postings of the probe terms): fine for
    point lookups, but probing a stopword pulls a corpus-sized posting
    list — SIZE-GUARDED at ``max_rows`` (ops.blocks.guarded_to_pandas);
    for bulk scoring keep the result as a Dataset (drop the to_pandas
    and feed the filtered read into the scorer) the way bm25_topk
    streams instead."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    probe_list = sorted(set(map(str, terms)))
    needed = sorted({_term_bucket(t, n_buckets) for t in probe_list})
    # base layout + every COMMITTED append generation (Lucene-style
    # segments; see append_postings_layout), or the compacted root
    # that absorbed them (compact_postings_layout) — still
    # bucket-pruned either way
    roots, _ = _postings_roots(layout_dir)
    paths = [os.path.join(layout_dir, r, f"bucket={b}")
             for r in roots for b in needed]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return pd.DataFrame({
            "term": pd.Series(dtype="object"),
            "doc_id": pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int64")})

    probe_arr = pa.array(probe_list)  # built once, reused per batch

    def keep(batch):
        return batch.filter(pc.is_in(batch["term"], value_set=probe_arr))

    from warcio_ray.ops.blocks import guarded_to_pandas

    out = guarded_to_pandas(
        ray.data.read_parquet(paths, file_extensions=["parquet"])
        .map_batches(keep, batch_format="pyarrow"),
        "postings_lookup", "the pruned read itself (keep the Dataset)",
        max_rows)
    out = out[["term", "doc_id", "tf"]] \
        .sort_values(["term", "doc_id"], kind="mergesort") \
        .reset_index(drop=True)
    return out.astype({"doc_id": "int64", "tf": "int64"})


# ---------------------------------------------------------------------------
# tf-idf keyword extraction
# ---------------------------------------------------------------------------

def _tf_explode(batch: pd.DataFrame, text_col: str,
                id_col: str) -> pd.DataFrame:
    """(id, text) batch -> exact (doc_id, term, tf) rows — the same
    vectorized split-explode-count kernel as the postings builder."""
    s = batch.set_index(batch[id_col].astype("int64"))[text_col] \
        .fillna("").str.split()
    ex = s.explode().dropna()
    if not len(ex):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "term": pd.Series(dtype="object"),
                             "tf": pd.Series(dtype="int64")})
    out = ex.groupby([ex.index, ex.values]).size().reset_index()
    out.columns = ["doc_id", "term", "tf"]
    return out.astype({"doc_id": "int64", "tf": "int64"})


def _topk_kernel(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """(doc_id, term, tf, df_) rows of ONE doc set -> per-doc top-k
    (doc_id, rank, term, tfidf), tfidf = tf * ln(N/df) with ties
    broken by term ASC. N rides in the '_n' column."""
    tfidf = df["tf"].to_numpy(np.float64) \
        * np.log(df["_n"].to_numpy(np.float64)
                 / df["df_"].to_numpy(np.float64))
    out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                        "term": df["term"].to_numpy(),
                        "tfidf": tfidf})
    out = out.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
    out = out.groupby("doc_id", sort=False).head(k)
    out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
    return out[["doc_id", "rank", "term", "tfidf"]] \
        .astype({"rank": "int64"})


def term_doc_freq(ds, text_col: str = "text", id_col: str = "doc_id"):
    """-> (term, df_) Dataset of exact distinct-document frequencies.
    Combiner shape: each doc's rows stay batch-local, so the per-batch
    (term -> n_docs) partial is exact and only O(batch-distinct terms)
    rows reach the one vocab-sized groupby."""
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf = _tf_explode(batch, text_col, id_col)
        out = tf.groupby("term", sort=False).size().reset_index()
        out.columns = ["term", "df_"]
        return out.astype({"df_": "int64"})

    return arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby("term").aggregate(Sum("df_", alias_name="df_"))


def tfidf_topk_terms(ds, k: int = 5, text_col: str = "text",
                     id_col: str = "doc_id",
                     broadcast_max: int = 2_000_000,
                     num_partitions=None):
    """Per-document tf-idf keyword extraction: the top-k whitespace
    terms of each doc by ``tf * ln(N / df)`` (ties: term ASC), the
    classic curation/labeling signal (salient terms per page). No
    warcio counterpart — LLM-pipeline operator per the build brief.

    Returns a (doc_id int64, rank int64 1..k, term string,
    tfidf float64) Dataset.

    Two output-identical paths (tested): a vocab <= ``broadcast_max``
    ships the (term -> df) map ONCE via ray.put and scoring is a
    single stateless re-scan emitting k rows per doc — zero shuffles
    past the df combiner. A larger vocab takes the join path: the
    (doc_id, term, tf) explode hash-joins the df table on term, then
    one groupby(doc_id) packs per-doc top-k — O(token-distinct) rows
    through two shuffles, never a driver-side vocabulary."""
    import ray

    from warcio_ray.ops.blocks import safe_join

    if num_partitions is None:
        # shuffle aggregators reserve CPU; oversizing the partition
        # count past the session's CPUs deadlocks small clusters
        num_partitions = min(
            32, max(2, int(ray.cluster_resources().get("CPU", 8))))
    n_docs = ds.count()
    df_tbl = term_doc_freq(ds, text_col=text_col, id_col=id_col) \
        .materialize()
    vocab = df_tbl.count()

    if vocab == 0:
        return df_tbl.map_batches(lambda b: pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "term": pd.Series(dtype="object"),
            "tfidf": pd.Series(dtype="float64")}),
            batch_format="pandas")

    if vocab <= broadcast_max:
        dfp = df_tbl.to_pandas()
        ref = ray.put(pd.Series(dfp["df_"].to_numpy(np.int64),
                                index=dfp["term"]))

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            dfs = ray.get(ref)
            tf = _tf_explode(batch, text_col, id_col)
            tf["df_"] = dfs.reindex(tf["term"]).to_numpy(np.int64)
            tf["_n"] = np.int64(n_docs)
            return _topk_kernel(tf, k)

        return ds.map_batches(score, batch_format="pandas")

    tf_rows = ds.map_batches(
        lambda b: _tf_explode(b, text_col, id_col),
        batch_format="pandas")
    joined = safe_join(tf_rows, df_tbl, "inner", num_partitions,
                       ("term",))

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        group = group.copy()
        group["_n"] = np.int64(n_docs)
        return _topk_kernel(group, k)

    return joined.groupby(id_col).map_groups(pack, batch_format="pandas")


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal rank fusion of lexical + vector toplists
# ---------------------------------------------------------------------------

def rrf_fuse(ranked_lists, k: int = 60, id_col: str = "doc_id") -> pd.DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of already-ranked
    top-k lists: ``rrf(d) = sum over lists 1/(k + rank_d)`` with ranks
    1-based from each list's ROW ORDER. The standard way to fuse a
    BM25 toplist with an embedding-kNN toplist without score
    calibration.

    Driver-side by design: the inputs are top-k lists (tens of rows) —
    the distributed work happened in the retrieval ops that produced
    them. Callers must rank each list by a cross-engine-stable key
    (e.g. ROUNDED score desc, id asc) when an external oracle replays
    the fusion. Returns (id_col, rrf float64) sorted by id."""
    from collections import defaultdict

    acc: "defaultdict[int, float]" = defaultdict(float)
    for lst in ranked_lists:
        ids = lst[id_col].astype("int64").tolist()
        for rank, did in enumerate(ids, start=1):
            acc[did] += 1.0 / (k + rank)
    out = pd.DataFrame({id_col: np.array(sorted(acc), dtype="int64")})
    out["rrf"] = [acc[d] for d in out[id_col]]
    return out


def phrase_counts(ds, phrase, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Exact phrase search — per-document occurrence counts of a token
    sequence (the positional-index query class BM25's bag-of-words
    scoring can't answer; overlapping occurrences all count). Returns
    (id_col, n_matches) rows for documents with >= 1 match.

    Scale shape: ONE stateless scan, fully vectorized — each batch
    flattens its token arrays once, ANDs m shifted equality masks
    (m = phrase length), and maps hit positions back to documents via
    one searchsorted against the doc-boundary prefix sums; a hit
    spanning two documents is rejected by the boundary check. No
    shuffle, no driver state, partitioning-invariant by construction.
    """
    words = [str(w) for w in phrase]
    m = len(words)
    if m == 0:
        raise ValueError("phrase must have at least one token")

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "n_matches": pd.Series(dtype="int64")})
        toks = batch[text_col].fillna("").str.split()
        n = toks.str.len().to_numpy(dtype="int64")
        if n.sum() < m:
            return empty
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t])
        if len(flat) < m:
            return empty
        mask = np.ones(len(flat) - m + 1, dtype=bool)
        for j, w in enumerate(words):
            mask &= flat[j:len(flat) - m + 1 + j] == w
        p = np.flatnonzero(mask)
        if not len(p):
            return empty
        bounds = np.cumsum(n)
        doc = np.searchsorted(bounds, p, side="right")
        doc = doc[p + m <= bounds[doc]]  # no cross-doc phantom hits
        if not len(doc):
            return empty
        ids = batch[id_col].to_numpy(dtype="int64")
        ud, cnt = np.unique(doc, return_counts=True)
        return pd.DataFrame({id_col: ids[ud],
                             "n_matches": cnt.astype("int64")})

    return ds.map_batches(scan, batch_format="pandas")


def kwic_snippets(ds, term: str, width: int = 3,
                  max_per_doc: int = 5, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Keyword-in-context snippet extraction — the SERP-snippet /
    concordance op: for each occurrence of ``term`` (exact whitespace
    token match), emit (id, pos, snippet) where snippet is the
    ``width``-token window either side of the hit. Occurrences are
    capped at the FIRST ``max_per_doc`` per document (a stopword probe
    would otherwise emit O(doc length) rows per doc — the cap keeps
    output O(docs), and "first K" is the deterministic, SQL-mirrorable
    rule a result page wants anyway).

    Scale shape: ONE stateless scan — the same flattened-token +
    boundary-searchsorted kernel as phrase_counts; only snippet string
    assembly is per-hit Python. No shuffle, partitioning-invariant.
    """
    term = str(term)

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "pos": pd.Series(dtype="int64"),
                              "snippet": pd.Series(dtype="object")})
        toks = batch[text_col].fillna("").str.split()
        n = toks.str.len().to_numpy(dtype="int64")
        if n.sum() == 0:
            return empty
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t])
        p = np.flatnonzero(flat == term)
        if not len(p):
            return empty
        bounds = np.cumsum(n)
        starts = bounds - n
        doc = np.searchsorted(bounds, p, side="right")
        # first max_per_doc hits per doc: p is ascending, so a rank
        # within each doc run is a vectorized cumcount
        first_of_run = np.r_[True, doc[1:] != doc[:-1]]
        run_start = np.maximum.accumulate(
            np.where(first_of_run, np.arange(len(doc)), 0))
        keep = (np.arange(len(doc)) - run_start) < max_per_doc
        p, doc = p[keep], doc[keep]
        lo = np.maximum(p - width, starts[doc])
        hi = np.minimum(p + width + 1, bounds[doc])
        ids = batch[id_col].to_numpy(dtype="int64")
        return pd.DataFrame({
            id_col: ids[doc],
            "pos": (p - starts[doc]).astype("int64"),
            "snippet": [" ".join(flat[a:b]) for a, b in zip(lo, hi)]})

    return ds.map_batches(scan, batch_format="pandas")
