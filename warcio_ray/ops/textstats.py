"""Text analysis operators over the documents table.

All hot paths are vectorized (pandas str kernels / numpy); each operator
is a map_batches stage emitting per-doc rows whose SQL-expressible
columns are mirrored exactly in __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# token counting + quality scoring (SQL-mirrorable)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: letter runs, single digits, punct runs — the
# shape GPT-style byte-pair encoders split on (stdlib-re and RE2/DuckDB
# compatible; no \p{L} classes, which stdlib `re` lacks)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def token_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens, n_bpe_tokens, n_punct, char_len, score.

    Mirror SQL:  n_tokens = array_length(regexp_extract_all(text,'\\S+'))
                 n_bpe_tokens = array_length(regexp_extract_all(text, BPE))
                 n_punct  = length(regexp_replace(text,'[^.!?]','','g'))
                 score    = CAST(char_len AS DOUBLE) / (n_tokens + 1)
    """
    text = batch["text"].astype("string")
    n_tokens = text.str.count(r"\S+").fillna(0).astype("int64")
    n_bpe = text.str.count(BPE_TOKEN_PATTERN).fillna(0).astype("int64")
    n_punct = text.str.count(r"[.!?]").fillna(0).astype("int64")
    char_len = text.str.len().fillna(0).astype("int64")
    score = char_len.astype("float64") / (n_tokens + 1).astype("float64")
    return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                         "n_tokens": n_tokens, "n_bpe_tokens": n_bpe,
                         "n_punct": n_punct,
                         "char_len": char_len, "score": score})


# ---------------------------------------------------------------------------
# language identification (n-gram / stopword heuristic; deterministic)
# ---------------------------------------------------------------------------

_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the a of and to in is it you that was for on are as with his they at".split()),
    "de": frozenset("der die das und ist ich nicht sie mit ein auf für den von zu".split()),
    "fr": frozenset("le la les des et est une un que pour dans qui sur pas".split()),
    "es": frozenset("el la los las y es una un que por con para del se no".split()),
    "it": frozenset("il la le gli e è una un che per con del non si".split()),
}
_LANGS = sorted(_STOPWORDS)
_WORD_RX = re.compile(r"[a-zA-ZäöüßéèêàáíóúñçÀ-ÿ]+")


class LangIdStage:
    """Actor-pool stage: stopword profiles compiled once per actor
    (__init__), scored per batch. Ties break alphabetically, unknown ->
    'und' — fully deterministic."""

    def __init__(self):
        self.profiles = [(lang, _STOPWORDS[lang]) for lang in _LANGS]
        self.word_rx = _WORD_RX

    def predict_one(self, text: str) -> str:
        words = [w.lower() for w in self.word_rx.findall(text or "")][:500]
        if not words:
            return "und"
        best_lang, best_hits = "und", 0
        for lang, stops in self.profiles:
            hits = sum(1 for w in words if w in stops)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # deliberately a per-row loop: a pandas explode/groupby
        # vectorization was written and measured 2x SLOWER at 500-10k
        # docs/batch (regex findall dominates either way; frozenset
        # membership beats exploded isin) — see round-2 notes
        preds = [self.predict_one(t) for t in batch["text"]]
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                             "lang": batch["lang"],
                             "lang_pred": preds})


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing over rolling hashes)
# ---------------------------------------------------------------------------

_B = 1315423911  # rolling hash base (fixed)
_MASK = (1 << 61) - 1

# per-worker token-hash memo (md5 per distinct token, not per occurrence)
_TOKEN_HASH_MEMO: Dict[str, int] = {}


def _token_hash(word: str) -> int:
    """32-bit md5-derived token hash — deliberately SQL-derivable
    (DuckDB: CAST('0x' || substr(md5(w),1,8) AS BIGINT)) so the whole
    winnowing chain is hard-oracle checkable."""
    h = _TOKEN_HASH_MEMO.get(word)
    if h is None:
        h = int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16)
        if len(_TOKEN_HASH_MEMO) < 1 << 20:
            _TOKEN_HASH_MEMO[word] = h
    return h


def _id_hash_u32(ids) -> np.ndarray:
    """md5-derived 32-bit id hash, the SQL-mirrorable sampling rank:
    CAST('0x' || substr(md5(CAST(id AS VARCHAR)),1,8) AS BIGINT).
    ONE definition shared by hash_sample / stratified_sample /
    shuffle_order / temperature_sample — the oracle encoding and these
    must change together."""
    return np.fromiter(
        (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16)
         for i in ids), dtype="int64", count=len(ids))


def _rolling_kgram_hashes(tokens: List[int], k: int) -> np.ndarray:
    """Stable polynomial rolling hash of token k-grams: Horner over
    uint64 WRAPPING arithmetic (== the k-term polynomial mod 2^64),
    masked to 61 bits at the end — exactly mirrorable in DuckDB as
    (sum t[i+j]*B^(k-1-j) in HUGEINT) % 2^64 % 2^61 (vectorized)."""
    if len(tokens) < k:
        return np.empty(0, dtype=np.uint64)
    arr = np.array(tokens, dtype=np.uint64)
    acc = np.zeros(len(arr) - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc = acc * np.uint64(_B) + arr[i:len(arr) - k + 1 + i]
    return acc & np.uint64(_MASK)


def fingerprint_batch(batch: pd.DataFrame, k: int = 5,
                      window: int = 4) -> pd.DataFrame:
    """Winnowing fingerprints: k-gram rolling hashes -> per-window minima
    -> sorted unique fingerprint set. Emits doc_id, n_fps, min_fp, max_fp
    (the full set would be an explode at scale)."""
    doc_ids, n_fps, min_fp, max_fp = [], [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        toks = [_token_hash(w) for w in (text or "").split()]
        hashes = _rolling_kgram_hashes(toks, k)
        if len(hashes) == 0:
            fps = np.empty(0, dtype=np.uint64)
        elif len(hashes) <= window:
            fps = np.array([hashes.min()], dtype=np.uint64)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
            fps = np.unique(sw.min(axis=1))
        doc_ids.append(int(doc_id))
        n_fps.append(int(len(fps)))
        min_fp.append(int(fps.min()) if len(fps) else 0)
        max_fp.append(int(fps.max()) if len(fps) else 0)
    return pd.DataFrame({"doc_id": doc_ids, "n_fps": n_fps,
                         "min_fp": np.array(min_fp, dtype=np.uint64),
                         "max_fp": np.array(max_fp, dtype=np.uint64)})


def _winnow_fps(text: str, k: int, window: int) -> np.ndarray:
    toks = [_token_hash(w) for w in (text or "").split()]
    hashes = _rolling_kgram_hashes(toks, k)
    if len(hashes) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(hashes) <= window:
        return np.array([hashes.min()], dtype=np.uint64)
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))


def fingerprint_explode_batch(batch: pd.DataFrame, k: int = 5,
                              window: int = 4) -> pd.DataFrame:
    """Full winnowing fingerprint SET as exploded (fp, doc_id) rows —
    the layout fingerprint-overlap dedup joins on (the summary columns in
    fingerprint_batch can't; round-1 deferred this explode)."""
    fps_all, ids_all = [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        fps = _winnow_fps(text, k, window)
        fps_all.append(fps)
        ids_all.append(np.full(len(fps), int(doc_id), dtype="int64"))
    if not fps_all:
        return pd.DataFrame({"fp": pd.Series(dtype="uint64"),
                             "doc_id": pd.Series(dtype="int64")})
    return pd.DataFrame({"fp": np.concatenate(fps_all),
                         "doc_id": np.concatenate(ids_all)})


def fingerprint_dedup(ds, min_shared: int = 5, k: int = 5, window: int = 4,
                      max_bucket: int = 512) -> pd.DataFrame:
    """Near-dup pairs by shared winnowing fingerprints: explode the full
    fingerprint sets, inverted-index groupby(fp), pair-count with a
    distributed groupby — pairs sharing >= min_shared fingerprints
    survive. No text ever shuffles; hot fingerprints are capped with the
    usual drop accounting (attrs['lsh_dropped_ids'])."""
    from ray.data.aggregate import Count

    from warcio_ray.ops.dedup import (
        _DROP_SENTINEL,
        _sum_dropped,
        candidate_pairs,
    )

    exploded = ds.map_batches(fingerprint_explode_batch,
                              batch_format="pandas",
                              fn_kwargs={"k": k, "window": window})
    raw = candidate_pairs(exploded, ["fp"], max_bucket).materialize()
    n_dropped = _sum_dropped(raw)

    from warcio_ray.ops.blocks import arrow_blocks

    counts = arrow_blocks(raw.filter(expr=f"a != {_DROP_SENTINEL}")) \
        .groupby(["a", "b"]).aggregate(Count(alias_name="n_shared")) \
        .filter(expr=f"n_shared >= {int(min_shared)}").to_pandas()
    if not len(counts):
        counts = pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64"),
                               "n_shared": pd.Series(dtype="int64")})
    out = counts.sort_values(["a", "b"]).reset_index(drop=True)
    out.attrs["lsh_dropped_ids"] = n_dropped
    return out


def mirror_host_pairs(ds, host_id_col: str = "host_id",
                      min_shared: int = 20, k: int = 5, window: int = 4,
                      max_bucket: int = 512) -> pd.DataFrame:
    """Mirror / spam-farm detection: host pairs whose pages share many
    winnowing fingerprints (the host-level lift of fingerprint_dedup —
    web archives use this to collapse example.com vs example.org
    mirrors before frontier budgeting; the reference has no dedup
    layer, build-brief operator).

    Input rows need (doc_id, text, host_id int). Shape: explode the
    winnowing fingerprint sets, collapse to DISTINCT (fp, host) so a
    host contributes once per fingerprint however many of its pages
    carry it, then the standard capped inverted-index pair count
    (ops/dedup.candidate_pairs) keyed by fp over host ids. Text never
    shuffles; hot fingerprints are capped with drop accounting.

    Returns (host_a, host_b, n_shared) pandas, pairs with
    n_shared >= min_shared, sorted.
    """
    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks
    from warcio_ray.ops.dedup import (
        _DROP_SENTINEL,
        _sum_dropped,
        candidate_pairs,
    )

    def explode_hosted(batch: pd.DataFrame) -> pd.DataFrame:
        fps_all, hosts_all = [], []
        for hid, text in zip(batch[host_id_col], batch["text"]):
            fps = _winnow_fps(text, k, window)
            fps_all.append(fps)
            hosts_all.append(np.full(len(fps), int(hid), dtype="int64"))
        if not fps_all:
            return pd.DataFrame({"fp": pd.Series(dtype="uint64"),
                                 "doc_id": pd.Series(dtype="int64")})
        # candidate_pairs pairs the 'doc_id' column — here host ids
        return pd.DataFrame({"fp": np.concatenate(fps_all),
                             "doc_id": np.concatenate(hosts_all)})

    exploded = ds.map_batches(explode_hosted, batch_format="pandas")
    distinct = arrow_blocks(exploded).groupby(["fp", "doc_id"]) \
        .aggregate(Count(alias_name="_n")) \
        .select_columns(["fp", "doc_id"])
    raw = candidate_pairs(distinct, ["fp"], max_bucket).materialize()
    n_dropped = _sum_dropped(raw)
    counts = arrow_blocks(raw.filter(expr=f"a != {_DROP_SENTINEL}")) \
        .groupby(["a", "b"]).aggregate(Count(alias_name="n_shared")) \
        .filter(expr=f"n_shared >= {int(min_shared)}").to_pandas()
    if not len(counts):
        counts = pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64"),
                               "n_shared": pd.Series(dtype="int64")})
    out = counts.rename(columns={"a": "host_a", "b": "host_b"}) \
        .sort_values(["host_a", "host_b"]).reset_index(drop=True)
    out.attrs["lsh_dropped_ids"] = n_dropped
    return out


# ---------------------------------------------------------------------------
# Gopher-style quality filters (Rae et al. 2021 §A1.1 heuristics, the
# SQL-mirrorable subset) — per-doc repetition + word-shape signals
# ---------------------------------------------------------------------------

_ALPHA_RX = re.compile(r"[A-Za-z]")


def gopher_quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc quality signals for pretraining filters:

      n_words, mean_word_len, frac_alpha_words (words containing an
      ASCII letter), n_lines (non-empty), dup_line_frac (1 - distinct
      non-empty lines / non-empty lines).

    Every column is mirrored EXACTLY in __ray_entry__.oracle_sql
    (regexp_extract_all + list arithmetic). The per-row loop covers the
    set-based line dedup; the word counts are shared with the loop to
    avoid double tokenization."""
    doc_ids, n_words_l, mean_len, frac_alpha = [], [], [], []
    n_lines_l, dup_frac = [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        words = (text or "").split()
        n = len(words)
        n_words_l.append(n)
        if n:
            total = sum(len(w) for w in words)
            mean_len.append(total / n)
            frac_alpha.append(
                sum(1 for w in words if _ALPHA_RX.search(w)) / n)
        else:
            mean_len.append(0.0)
            frac_alpha.append(0.0)
        lines = [l for l in (text or "").split("\n") if len(l) > 0]
        n_lines_l.append(len(lines))
        dup_frac.append(1.0 - len(set(lines)) / len(lines)
                        if lines else 0.0)
        doc_ids.append(int(doc_id))
    return pd.DataFrame({
        "doc_id": np.array(doc_ids, dtype="int64"),
        "n_words": np.array(n_words_l, dtype="int64"),
        "mean_word_len": np.array(mean_len, dtype="float64"),
        "frac_alpha_words": np.array(frac_alpha, dtype="float64"),
        "n_lines": np.array(n_lines_l, dtype="int64"),
        "dup_line_frac": np.array(dup_frac, dtype="float64"),
    })


def readability_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc Flesch reading-ease signal — the readability gate
    education-quality curation filters (FineWeb-Edu-style) layer on
    top of the gopher stats. All counts are exact integers from C
    regex kernels (no per-row Python):

      n_words      = \\S+ runs
      n_sentences  = [.!?]+ runs, floored at 1
      n_syllables  = [aeiouy]+ vowel groups (lowercased) + one per
                     vowelless word (every word counts >= 1 syllable —
                     a vowel group never spans whitespace, so the
                     text-level count equals the per-word sum)
      flesch       = 206.835 - 1.015*(words/sentences)
                             - 84.6*(syllables/words)

    Empty docs (0 words) emit flesch = 0.0 (counts still 0). Each
    column is mirrored EXACTLY in the readability oracle SQL."""
    text = batch["text"].fillna("").astype("string")
    low = text.str.lower()
    n_words = text.str.count(r"\S+").to_numpy(np.int64)
    n_sent = np.maximum(
        text.str.count(r"[.!?]+").to_numpy(np.int64), 1)
    vgroups = low.str.count(r"[aeiouy]+").to_numpy(np.int64)
    # vowelless words = words - words containing at least one vowel
    voweled = low.str.count(r"(?<!\S)\S*[aeiouy]").to_numpy(np.int64)
    n_syll = vgroups + (n_words - voweled)
    wf = n_words.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        flesch = np.where(
            n_words > 0,
            206.835 - 1.015 * (wf / n_sent) - 84.6 * (n_syll / wf),
            0.0)
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(np.int64),
        "n_words": n_words,
        "n_sentences": n_sent,
        "n_syllables": n_syll,
        "flesch": flesch})


# ---------------------------------------------------------------------------
# corpus top-terms (document-frequency style): the canonical
# partial-aggregate shape — per-batch Counter -> small groupby -> top-k
# ---------------------------------------------------------------------------

def top_terms(ds, k: int = 20) -> pd.DataFrame:
    """Top-k whitespace terms by total occurrence count across the
    corpus. Per-batch partial counts collapse each batch to its
    distinct terms BEFORE the shuffle (classic combiner), so the
    groupby moves O(vocab) rows, never O(tokens). Ties break by term
    ascending — deterministic and SQL-mirrorable."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in batch["text"]:
            c.update((text or "").split())
        if not c:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"term": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype="int64")})

    from warcio_ray.ops.blocks import arrow_blocks

    counts = arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby("term").aggregate(Sum("n", alias_name="n"))
    # distributed two-key sort (n desc, term asc) + limit(k): exact even
    # when the k-th count value is tied across many terms
    out = counts.sort(["n", "term"], descending=[True, False]) \
        .limit(k).to_pandas()
    if "n" not in out.columns:  # empty vocabulary: aggregate of zero
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    return out.reset_index(drop=True).astype({"n": "int64"})


# ---------------------------------------------------------------------------
# deterministic hash sampling (reproducible subsets at any parallelism)
# ---------------------------------------------------------------------------

def hash_sample(ds, pct: int, id_col: str = "doc_id"):
    """Keep rows where an md5-derived hash of the id lands below pct%
    — the reproducible corpus subsample (same rows every run, every
    partitioning, and recomputable in SQL). Runs as a pure map_batches
    filter: no shuffle, no driver state."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[_id_hash_u32(batch[id_col]) % 100 < pct]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(ds, group_col: str, k: int, id_col: str = "doc_id"):
    """Deterministic k-per-group sample: within each group keep the k
    rows with the smallest (md5(id), id) rank — reproducible at any
    parallelism and recomputable in SQL (row_number over
    CAST('0x' || substr(md5(id),1,8) AS BIGINT)).

    Combiner shape: each batch emits at most k candidate rows per group
    it contains (vectorized kth-smallest cut), so the final
    groupby(group) merge only ever shuffles O(k x #batches) rows per
    group — the corpus itself never shuffles."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[group_col, id_col]].copy()
        out["_h"] = _id_hash_u32(out[id_col])
        out = out.sort_values([group_col, "_h", id_col], kind="mergesort")
        return out.groupby(group_col, sort=False).head(k)

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["_h", id_col], kind="mergesort").head(k)
        return grp[[group_col, id_col]]

    cands = ds.map_batches(partial, batch_format="pandas")
    return cands.groupby(group_col).map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# unigram LM scoring (two-pass: corpus counts -> broadcast vocab ->
# per-doc mean negative log-prob; a deterministic perplexity-style
# quality signal with no external model)
# ---------------------------------------------------------------------------

def unigram_logprob_scores(ds, vocab_size: int = 4096,
                           alpha: float = 1.0):
    """Score each doc by mean -ln p(token) under an add-alpha-smoothed
    unigram LM estimated from the corpus itself.

    Pass 1 is the combiner shape (per-batch Counter -> distinct-term
    groupby -> exact 2-key sort + limit): only O(vocab) rows shuffle and
    only the top-``vocab_size`` (count, term) table — small by
    construction — is broadcast. Pass 2 is a stateless scan whose
    token->nll lookup is one hashed ``pd.Index.get_indexer`` call per
    batch (no per-token Python) and whose per-doc fold is a
    ``np.bincount`` segment sum. Tokens outside the vocab hit the OOV
    bucket: p = (count + alpha) / (total_vocab + alpha * (|V| + 1)).
    Empty docs score 0.  Returns a Dataset of (doc_id, nll) — the
    per-doc score table stays distributed (collect only at toy scale);
    mirrored exactly in SQL (decontam-style CTEs)."""
    import ray

    # pass 1 IS top_terms (same combiner, same exact 2-key sort+limit):
    # one implementation, one SQL mirror
    vocab = top_terms(ds, k=vocab_size)
    total = int(vocab["n"].sum())
    denom = total + alpha * (len(vocab) + 1)
    # per-vocab-id -ln p, precomputed once; the hashed Index gives the
    # vectorized token->id lookup (its engine is built once per worker:
    # ray.get memoizes the deserialized object)
    term_index = pd.Index(vocab["term"].astype(str))
    nll_seen = -np.log((vocab["n"].to_numpy(dtype="int64") + alpha)
                       / denom)
    nll_oov = -np.log(alpha / denom)
    vref = ray.put((term_index, nll_seen))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        tindex, nseen = ray.get(vref)
        ids = batch["doc_id"].to_numpy(dtype="int64")
        parts = batch["text"].fillna("").astype(str).str.split()
        lens = parts.str.len().to_numpy(dtype="int64")
        n_tok = int(lens.sum())
        scores = np.zeros(len(batch), dtype="float64")
        if n_tok:
            flat = np.fromiter((w for lst in parts for w in lst),
                               dtype=object, count=n_tok)
            if len(nseen):
                j = tindex.get_indexer(flat)
                tok_nll = np.where(j >= 0, nseen[np.maximum(j, 0)],
                                   nll_oov)
            else:  # empty vocab: every token is OOV
                tok_nll = np.full(n_tok, nll_oov)
            doc_of = np.repeat(np.arange(len(batch)), lens)
            sums = np.bincount(doc_of, weights=tok_nll,
                               minlength=len(batch))
            nz = lens > 0
            scores[nz] = sums[nz] / lens[nz]
        return pd.DataFrame({"doc_id": ids, "nll": scores})

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# unicode text normalization (NFC + whitespace canonicalization)
# ---------------------------------------------------------------------------

def normalize_text_batch(batch, col: str = "text"):
    """NFC-normalize + collapse runs of whitespace to single spaces +
    trim — the canonical first cleaning stage before hashing or dedup
    (combining-accent and whitespace variants of the same text must
    collide).

    NFC runs through CPython's unicodedata (C implementation, one call
    per string): pyarrow 16.1's ``pc.utf8_normalize(form="NFC")``
    does NOT compose (verified: 'e'+U+0301 comes back decomposed), so
    the Arrow kernel cannot match DuckDB's spec-correct nfc_normalize.
    The whitespace passes stay RE2 Arrow kernels — the same regex
    engine as DuckDB, so ``\\s`` semantics agree by construction
    (stdlib-re ``\\s`` would additionally match NBSP and diverge).

    Emits (doc_id, text_norm, changed). pa.Table in/out.
    """
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.cast(batch[col], pa.large_string())
    norm = pa.array(
        [None if t is None else unicodedata.normalize("NFC", t)
         for t in s.to_pylist()], pa.large_string())
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    # trim ASCII space ONLY (same as DuckDB trim()): after the \s+
    # collapse every RE2-whitespace edge is a plain space, and a
    # unicode-aware trim would diverge on e.g. leading NBSP, which RE2
    # \s does NOT match
    norm = pc.utf8_trim(norm, characters=" ")
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "text_norm": norm,
        "changed": pc.not_equal(norm, s)})


def shuffle_order(ds, id_col: str = "doc_id", bucket_bits: int = 10):
    """Deterministic global 'random' ordering (the training-shard
    shuffle): rank rows by (md5(id), id) — reproducible at any
    parallelism, on any engine, and recomputable in SQL as a
    row_number window, unlike ``Dataset.random_shuffle`` whose order
    is execution-dependent.

    Scale shape (exact distributed rank, no global sort): rows bucket
    by the hash's top ``bucket_bits`` bits (md5-uniform, so buckets are
    balanced at n/2^bits rows); bucket counts fold through
    tree_aggregate to an O(2^bits) driver cumsum of base ranks; ONE
    hash shuffle groups each bucket, which sorts locally (vectorized)
    and adds its broadcast base. Driver memory O(2^bits); text never
    shuffles (project (id, hash) first, join ranks back by id if the
    payload is needed in shuffle order).

    Returns a Dataset of (id_col, shuffle_rank), rank 0-based.
    """
    import ray

    from warcio_ray.ops.blocks import tree_aggregate

    shift = 32 - bucket_bits

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        h = _id_hash_u32(ids)
        return pd.DataFrame({id_col: ids, "_h": h,
                             "bucket": h >> shift})

    # materialize the narrow (id, hash, bucket) projection: it is
    # consumed twice (bucket counts, then the rank shuffle) and Ray
    # re-executes lineage per consumption — 24 B/row beats a second
    # read + md5 pass
    keyed = ds.map_batches(project, batch_format="pandas").materialize()

    def bucket_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(dtype="int64"),
                             "c": vc.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        keyed.map_batches(bucket_counts, batch_format="pandas"),
        ["bucket"], sums=("c",))
    if len(totals) == 0:  # empty corpus: typed empty result
        import ray.data
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "shuffle_rank": pd.Series(dtype="int64")}))
    totals = totals.sort_values("bucket").reset_index(drop=True)
    c = totals["c"].to_numpy(dtype="int64")
    base = np.concatenate([[0], np.cumsum(c)[:-1]]) if len(c) else c
    base_ref = ray.put(dict(zip(totals["bucket"].astype("int64"), base)))

    def rank_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["_h", id_col], kind="mergesort")
        b = ray.get(base_ref)[int(grp["bucket"].iloc[0])]
        return pd.DataFrame({
            id_col: grp[id_col].to_numpy(dtype="int64"),
            "shuffle_rank": b + np.arange(len(grp), dtype="int64")})

    return keyed.groupby("bucket").map_groups(rank_group,
                                              batch_format="pandas")


def temperature_sample(ds, group_col: str = "lang",
                       id_col: str = "doc_id"):
    """Temperature-flattening corpus rebalance (alpha = 0.5): keep each
    group-g row with probability sqrt(c_min / c_g), so group mass goes
    from c_g to ~sqrt(c_min * c_g) — rare groups keep everything, the
    head flattens toward the multilingual-balancing curve (the
    alpha-sampling rule of multilingual pretraining corpora, e.g.
    XLM-R's temperature sampling), with NO tuning knob that would break
    reproducibility.

    Determinism / oracle: keep decision is md5_32(id) <
    floor(sqrt(cmin/c_g) * 2^32). cmin/c_g is ONE IEEE division of two
    exact integers, sqrt is correctly rounded, so the threshold is
    bit-identical in any engine — deliberately NO sum of floats over
    groups (a SUM(sqrt(c)) normalizer would be order-nondeterministic
    in SQL). Scale shape: one bounded-key count (tree_aggregate over
    #groups rows), an O(#groups) driver threshold table captured in
    the filter closure, then a stateless keep scan — no shuffle of
    corpus rows at all.
    """
    import math

    from warcio_ray.ops.blocks import tree_aggregate

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        # dropna: NULL-group rows are dropped entirely (no threshold),
        # matching the SQL mirror's inner join on the group key
        vc = batch[group_col].value_counts(dropna=True)
        return pd.DataFrame({group_col: vc.index,
                             "c": vc.to_numpy(dtype="int64")})

    cnt = tree_aggregate(ds.map_batches(counts, batch_format="pandas"),
                         [group_col], sums=("c",))
    if len(cnt) == 0:
        return ds.limit(0)
    cmin = int(cnt["c"].min())
    thr = {g: int(math.floor(math.sqrt(cmin / int(c)) * (1 << 32)))
           for g, c in zip(cnt[group_col], cnt["c"])}

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash_u32(batch[id_col])
        # unmapped (incl. NULL) groups -> NaN threshold -> h < NaN is
        # False -> dropped, same as the oracle's inner join
        t = batch[group_col].map(thr).to_numpy(dtype="float64")
        return batch[h < t]

    return ds.map_batches(keep, batch_format="pandas")


def repetition_signals_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """WITHIN-document repetition signals (Gopher / RefinedWeb filter
    family, Rae et al. 2021 App. A1 at word granularity) — the
    complement of the cross-document span scrub:

      top2_count / top2_gram : occurrences and identity of the most
        frequent word 2-gram (ties: lexicographically smallest);
      top2_char_frac : chars covered by those occurrences / doc chars
        (count * len(gram) / len(text) — one IEEE division, identical
        in SQL);
      dup3_char_frac : chars covered by word 3-grams occurring >= 2
        times, same normalization.

    Stateless map_batches scan, zero shuffle; every column mirrored in
    the repetition_signals oracle (list_transform + window rank)."""
    from collections import Counter

    ids, c2, g2, f2, f3 = [], [], [], [], []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        text = text or ""
        toks = text.split()
        nc = len(text)
        top_c, top_g = 0, ""
        if len(toks) >= 2:
            cnt = Counter(" ".join(p) for p in zip(toks, toks[1:]))
            # max count, then smallest gram — same rank as the SQL
            top_g, top_c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        dup3 = 0
        if len(toks) >= 3:
            cnt3 = Counter(" ".join(p)
                           for p in zip(toks, toks[1:], toks[2:]))
            dup3 = sum(c * len(g) for g, c in cnt3.items() if c >= 2)
        ids.append(int(doc_id))
        c2.append(top_c)
        g2.append(top_g)
        f2.append(top_c * len(top_g) / nc if nc else 0.0)
        f3.append(dup3 / nc if nc else 0.0)
    return pd.DataFrame({
        "doc_id": np.array(ids, dtype="int64"),
        "top2_count": np.array(c2, dtype="int64"),
        "top2_gram": pd.Series(g2, dtype="object"),
        "top2_char_frac": np.array(f2, dtype="float64"),
        "dup3_char_frac": np.array(f3, dtype="float64"),
    })


def lexical_diversity_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Exact-integer lexical-diversity quality signals (the
    entropy-family complement of gopher_quality_batch, without the
    float-log quantization risk):

      n_chars / uniq_chars / char_sq : document length, distinct code
        points, and sum of per-char count^2 — char_sq/n_chars^2 is the
        Simpson collision probability (low diversity = spammy/repeated
        text), computable downstream with one division;
      n_words / uniq_words : type-token ratio numerator/denominator;
      top_word_count : mode word frequency (keyword-stuffing signal).

    All integers, so the SQL oracle (GROUP BY doc,char / doc,word) is
    exact. Stateless map_batches scan, zero shuffle. Vectorized: one
    utf-32 decode + int64-keyed np.unique for chars, one pd.factorize
    + keyed np.unique for words — no per-token Python loop."""
    texts = ["" if t is None else str(t) for t in batch["text"]]
    n = len(texts)
    ids = batch["doc_id"].to_numpy(dtype="int64")

    lens = np.array([len(t) for t in texts], dtype="int64")
    joined = "".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.int64)
    cdoc = np.repeat(np.arange(n, dtype=np.int64), lens)
    # code points < 2^21, batch index in the high bits
    ck, ccnt = np.unique((cdoc << 21) | codes, return_counts=True)
    cd = ck >> 21
    uniq_chars = np.bincount(cd, minlength=n).astype("int64")
    char_sq = np.zeros(n, dtype="int64")
    np.add.at(char_sq, cd, ccnt * ccnt)

    tok_lists = [t.split() for t in texts]
    nw = np.array([len(tl) for tl in tok_lists], dtype="int64")
    flat = [w for tl in tok_lists for w in tl]
    wcodes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    wdoc = np.repeat(np.arange(n, dtype=np.int64), nw)
    m = np.int64(len(uniques) + 1)
    wk, wcnt = np.unique(wdoc * m + wcodes, return_counts=True)
    wd = wk // m
    uniq_words = np.bincount(wd, minlength=n).astype("int64")
    top_word = np.zeros(n, dtype="int64")
    np.maximum.at(top_word, wd, wcnt)

    return pd.DataFrame({
        "doc_id": ids, "n_chars": lens,
        "uniq_chars": uniq_chars, "char_sq": char_sq,
        "n_words": nw, "uniq_words": uniq_words,
        "top_word_count": top_word,
    })


def _flat_token_ids(batch: pd.DataFrame, windex: "pd.Index",
                    oov: int, text_col: str = "text"):
    """Tokenize a whole batch and map every token to its vocab id (OOV
    id for misses) with ONE hashed ``pd.Index.get_indexer`` call —
    replaces per-token dict loops in the n-gram LM stages. Returns
    (flat ids, doc_of) int64 arrays; doc_of marks doc boundaries so
    n-gram windows can mask out cross-doc pairs."""
    if not len(batch):
        e = np.array([], dtype="int64")
        return e, e
    parts = batch[text_col].fillna("").astype(str).str.split()
    lens = parts.str.len().to_numpy(dtype="int64")
    n_tok = int(lens.sum())
    if n_tok == 0:
        e = np.array([], dtype="int64")
        return e, e
    flat = np.fromiter((w for lst in parts for w in lst),
                       dtype=object, count=n_tok)
    if len(windex):
        ids = windex.get_indexer(flat)
        ids = np.where(ids < 0, oov, ids).astype("int64")
    else:
        ids = np.full(n_tok, oov, dtype="int64")
    doc_of = np.repeat(np.arange(len(batch), dtype="int64"), lens)
    return ids, doc_of


def bigram_nll_scores(ds, vocab_size: int = 1024) -> "pd.DataFrame":
    """EXACT-integer add-1-smoothed bigram LM scoring — the perplexity
    -filter primitive one order above ``unigram_logprob_scores`` (CCNet
    filters on LM perplexity; a bigram LM is the honest no-external-
    model version), and unlike the unigram op the result is an INTEGER
    so the oracle is a hash compare, not a rounded-float tolerance.

    Model: ids = top-``vocab_size`` words by (count desc, term asc)
    (reuses the ``top_terms`` combiner + SQL mirror) with one OOV
    bucket; p(w|v) = (c(v,w)+1) / (c(v,·)+V+1) where V+1 counts the id
    classes. Per-pair -ln p is quantized to int64 at 2^32 (ln matches
    libm/DuckDB bit-for-bit on these inputs — BM25/DSIR precedent) and
    per-doc scores are integer sums: partitioning-invariant, exact.

    Scale shape: pass 1 = the top_terms combiner; pass 2 folds each
    batch to distinct (v, w) id-pair counts before ONE groupby whose
    key space is bounded by (V+1)^2 (~1M at the default — a few MB
    collected, broadcast back as sorted key/value arrays); pass 3 is a
    stateless scan with an np.searchsorted lookup per batch. Returns
    a Dataset of (doc_id, nll_q, n_bigrams) — collect only at toy
    scale; docs with < 2 tokens score (0, 0)."""
    from ray.data.aggregate import Sum

    import ray

    from warcio_ray.ops.blocks import arrow_blocks

    vocab = top_terms(ds, k=vocab_size)
    oov = len(vocab)
    n_ids = oov + 1
    wref = ray.put(pd.Index(vocab["term"].astype(str)))

    def bigram_partials(batch: pd.DataFrame) -> pd.DataFrame:
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        if len(ids) >= 2:
            valid = doc_of[:-1] == doc_of[1:]  # no cross-doc pairs
            uk, uc = np.unique((ids[:-1] * n_ids + ids[1:])[valid],
                               return_counts=True)
        else:
            uk = uc = np.array([], dtype="int64")
        return pd.DataFrame({"k": uk.astype("int64"),
                             "c": uc.astype("int64")})

    bi = arrow_blocks(
        ds.map_batches(bigram_partials, batch_format="pandas")) \
        .groupby("k").aggregate(Sum("c", alias_name="c")).to_pandas()
    keys = np.sort(bi["k"].to_numpy(dtype="int64")) \
        if len(bi) else np.array([], dtype="int64")
    counts = bi.set_index("k")["c"].reindex(keys).to_numpy(dtype="int64") \
        if len(bi) else np.array([], dtype="int64")
    cv = np.zeros(n_ids, dtype=np.int64)
    if len(keys):
        np.add.at(cv, keys // n_ids, counts)
    scale = float(np.int64(1) << np.int64(32))
    # quantized -ln p for every SEEN pair, plus the per-context default
    # for unseen (c = 0) pairs — same formula, COALESCE'd in SQL
    q_seen = np.floor(-np.log((counts + 1.0) / (cv[keys // n_ids]
                                                + float(n_ids)))
                      * scale + 0.5).astype(np.int64)
    q_unseen = np.floor(-np.log(1.0 / (cv + float(n_ids)))
                        * scale + 0.5).astype(np.int64)
    kref = ray.put((keys, q_seen, q_unseen))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ks, qs, qu = ray.get(kref)
        out_id = batch["doc_id"].to_numpy(dtype="int64")
        nll = np.zeros(len(batch), dtype=np.int64)
        nb = np.zeros(len(batch), dtype=np.int64)
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        if len(ids) >= 2:
            valid = doc_of[:-1] == doc_of[1:]
            pk = (ids[:-1] * n_ids + ids[1:])[valid]
            p_of = doc_of[:-1][valid]
            if len(ks):
                pos = np.minimum(np.searchsorted(ks, pk), len(ks) - 1)
                q = np.where(ks[pos] == pk, qs[pos], qu[pk // n_ids])
            else:
                q = qu[pk // n_ids]
            # int64 accumulate (np.add.at, not float-weighted bincount):
            # per-doc sums stay exact
            np.add.at(nll, p_of, q)
            nb = np.bincount(p_of, minlength=len(batch)) \
                .astype("int64")
        return pd.DataFrame({"doc_id": out_id, "nll_q": nll,
                             "n_bigrams": nb})

    return ds.map_batches(score, batch_format="pandas")


def _trigram_model(ds, vocab_size: int):
    """Shared trigram count-model build for the trigram LM scorers
    (interpolated add-1 and stupid backoff): top-``vocab_size`` vocab,
    one flat-keyed groupby folding uni/bi/trigram cells, sorted
    count arrays broadcast via ray.put. Returns
    (wref, model_ref, oov, n_ids, n2, total)."""
    from ray.data.aggregate import Sum

    import ray

    from warcio_ray.ops.blocks import arrow_blocks

    vocab = top_terms(ds, k=vocab_size)
    oov = len(vocab)
    n_ids = oov + 1
    n2 = n_ids * n_ids
    base_bi = n_ids
    base_tri = n_ids + n2
    wref = ray.put(pd.Index(vocab["term"].astype(str)))

    def gram_partials(batch: pd.DataFrame) -> pd.DataFrame:
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        keys = [ids]
        if len(ids) >= 2:
            v2 = doc_of[:-1] == doc_of[1:]
            keys.append((base_bi + ids[:-1] * n_ids + ids[1:])[v2])
        if len(ids) >= 3:
            v3 = (doc_of[:-2] == doc_of[1:-1]) \
                & (doc_of[1:-1] == doc_of[2:])
            keys.append((base_tri + ids[:-2] * n2
                         + ids[1:-1] * n_ids + ids[2:])[v3])
        uk, uc = np.unique(np.concatenate(keys), return_counts=True) \
            if len(ids) else (np.array([], dtype="int64"),
                              np.array([], dtype="int64"))
        return pd.DataFrame({"k": uk.astype("int64"),
                             "c": uc.astype("int64")})

    folded = arrow_blocks(
        ds.map_batches(gram_partials, batch_format="pandas")) \
        .groupby("k").aggregate(Sum("c", alias_name="c")).to_pandas()
    keys = np.sort(folded["k"].to_numpy(dtype="int64")) \
        if len(folded) else np.array([], dtype="int64")
    counts = folded.set_index("k")["c"].reindex(keys) \
        .to_numpy(dtype="int64") if len(folded) \
        else np.array([], dtype="int64")
    uni_m = keys < base_bi
    bi_m = (keys >= base_bi) & (keys < base_tri)
    tri_m = keys >= base_tri
    c1 = np.zeros(n_ids, dtype=np.int64)
    c1[keys[uni_m]] = counts[uni_m]
    total = float(c1.sum())
    keys2 = keys[bi_m] - base_bi
    c2 = counts[bi_m]
    cv2 = np.zeros(n_ids, dtype=np.int64)
    np.add.at(cv2, keys2 // n_ids, c2)
    keys3 = keys[tri_m] - base_tri
    c3 = counts[tri_m]
    # context totals c3(u,v,.): keys3 sorted => contexts sorted =>
    # reduceat over run boundaries
    k3ctx = keys3 // n_ids
    if len(k3ctx):
        bounds = np.flatnonzero(np.diff(k3ctx)) + 1
        starts = np.concatenate([[0], bounds])
        ctx3_keys = k3ctx[starts]
        ctx3_vals = np.add.reduceat(c3, starts)
    else:
        ctx3_keys = np.array([], dtype="int64")
        ctx3_vals = np.array([], dtype="int64")
    model = ray.put((keys2, c2, cv2, keys3, c3, ctx3_keys, ctx3_vals,
                     c1))
    return wref, model, oov, n_ids, n2, total


def _lookup(sk: np.ndarray, sv: np.ndarray,
            probe: np.ndarray) -> np.ndarray:
    if not len(sk):
        return np.zeros(len(probe), dtype=np.int64)
    pos = np.minimum(np.searchsorted(sk, probe), len(sk) - 1)
    return np.where(sk[pos] == probe, sv[pos], 0)


def trigram_nll_scores(ds, vocab_size: int = 1024) -> "object":
    """EXACT-integer interpolated trigram LM scoring — the deepest
    rung of the no-external-model perplexity-filter ladder (unigram ->
    bigram -> this).  p(w|u,v) = 0.2*p1(w) + 0.3*p2(w|v) + 0.5*p3(w|u,v)
    with each order add-1 smoothed over the (top-``vocab_size`` + OOV)
    id space; per-position -ln p quantized to int64 at 2^32 (the
    bm25/dsir ln==libm precedent — the mixture is ONE fixed float
    expression tree, identical in SQL) and per-doc scores are integer
    sums: partitioning/order-invariant, hash-comparable.

    Scale shape: pass 1 is the top_terms combiner; pass 2 folds every
    batch's unigram/bigram/trigram cells into ONE flat int64 key space
    (unigram w < n; bigram n + v*n + w; trigram n + n^2 + u*n^2 +
    v*n + w — max ~1.1e9 at the default, far inside int64) so a single
    groupby merges all three orders; the driver holds the sorted
    key/count arrays (O(distinct n-grams of the corpus), the honest
    LM-size bound) and broadcasts them; pass 3 is a stateless
    searchsorted scan.  Returns a Dataset of (doc_id, nll_q,
    n_trigrams); docs with < 3 tokens score (0, 0)."""
    import ray

    wref, model, oov, n_ids, n2, total = _trigram_model(ds, vocab_size)
    fn = float(n_ids)
    scale = float(np.int64(1) << np.int64(32))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        k2s, c2s, cv2s, k3s, c3s, cx3k, cx3v, c1s = ray.get(model)
        out_id = batch["doc_id"].to_numpy(dtype="int64")
        nll = np.zeros(len(batch), dtype=np.int64)
        nt = np.zeros(len(batch), dtype=np.int64)
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        if len(ids) >= 3:
            v3 = (doc_of[:-2] == doc_of[1:-1]) \
                & (doc_of[1:-1] == doc_of[2:])
            u, v, w = ids[:-2][v3], ids[1:-1][v3], ids[2:][v3]
            t_of = doc_of[2:][v3]
            tc = _lookup(k3s, c3s, u * n2 + v * n_ids + w)
            tcv = _lookup(cx3k, cx3v, u * n_ids + v)
            bc = _lookup(k2s, c2s, v * n_ids + w)
            p1 = (c1s[w] + 1.0) / (total + fn)
            p2 = (bc + 1.0) / (cv2s[v] + fn)
            p3 = (tc + 1.0) / (tcv + fn)
            q = np.floor(-np.log(0.2 * p1 + 0.3 * p2 + 0.5 * p3)
                         * scale + 0.5).astype(np.int64)
            np.add.at(nll, t_of, q)  # exact int64 per-doc sums
            nt = np.bincount(t_of, minlength=len(batch)) \
                .astype("int64")
        return pd.DataFrame({"doc_id": out_id, "nll_q": nll,
                             "n_trigrams": nt})

    return ds.map_batches(score, batch_format="pandas")


def stupid_backoff_scores(ds, vocab_size: int = 1024,
                          train_ds=None) -> "object":
    """Stupid Backoff trigram scoring (Brants et al. 2007, the
    count-only LM built for web-scale corpora precisely because it
    needs NO normalization pass): S(w|u,v) = c(uvw)/c(uv·) when the
    trigram was seen in the TRAINING corpus, else 0.4·S(w|v), else
    0.4·0.4·S_1(w) with the base rung add-1 smoothed so unseen words
    stay finite. ``train_ds`` holds the count corpus (defaults to
    ``ds`` — note self-scoring never backs off, every trigram is its
    own evidence; pass a held-out split to exercise the ladder). Each
    position's -ln S quantizes to int64 at 2^32 (same libm-ln
    precedent as the interpolated scorer; the backoff CASE is one
    fixed float expression tree, identical in SQL via exact-integer
    divisions). Shares the count model build with trigram_nll_scores
    (one flat-keyed groupby, driver-bounded by distinct n-grams).
    Returns a Dataset of (doc_id, sb_q, n_trigrams)."""
    import ray

    wref, model, oov, n_ids, n2, total = _trigram_model(
        ds if train_ds is None else train_ds, vocab_size)
    fn = float(n_ids)
    scale = float(np.int64(1) << np.int64(32))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        k2s, c2s, cv2s, k3s, c3s, cx3k, cx3v, c1s = ray.get(model)
        out_id = batch["doc_id"].to_numpy(dtype="int64")
        sb = np.zeros(len(batch), dtype=np.int64)
        nt = np.zeros(len(batch), dtype=np.int64)
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        if len(ids) >= 3:
            v3 = (doc_of[:-2] == doc_of[1:-1]) \
                & (doc_of[1:-1] == doc_of[2:])
            u, v, w = ids[:-2][v3], ids[1:-1][v3], ids[2:][v3]
            t_of = doc_of[2:][v3]
            tc = _lookup(k3s, c3s, u * n2 + v * n_ids + w)
            tcv = _lookup(cx3k, cx3v, u * n_ids + v)
            bc = _lookup(k2s, c2s, v * n_ids + w)
            # the three rungs; denominators are exact ints -> float64
            # divisions, the same casts the SQL CASE performs. tcv>0
            # whenever tc>0 (a seen trigram implies its context);
            # np.where still evaluates the masked lanes, so guard the
            # denominators with maximum(1, ·) — selected lanes are
            # unaffected.
            s3 = tc / np.maximum(tcv, 1).astype(np.float64)
            s2 = 0.4 * (bc / np.maximum(cv2s[v], 1).astype(np.float64))
            s1 = 0.4 * (0.4 * ((c1s[w] + 1.0) / (total + fn)))
            s = np.where(tc > 0, s3, np.where(bc > 0, s2, s1))
            q = np.floor(-np.log(s) * scale + 0.5).astype(np.int64)
            np.add.at(sb, t_of, q)
            nt = np.bincount(t_of, minlength=len(batch)) \
                .astype("int64")
        return pd.DataFrame({"doc_id": out_id, "sb_q": sb,
                             "n_trigrams": nt})

    return ds.map_batches(score, batch_format="pandas")


def word_entropy_scores(ds) -> "object":
    """Per-document Shannon entropy of the word distribution — the
    information-density quality signal between the Simpson/TTR counts
    (lexical_diversity) and the LM-NLL ladder: near-zero entropy means
    keyword-stuffed or repeated-token spam regardless of length.

    Exactness: H*T = sum over distinct words of c*(ln T - ln c); each
    per-WORD term (ln T - ln c) quantizes to int64 at 2^32 FIRST (the
    libm-ln precedent — one fixed float expression, identical in SQL),
    then multiplies by the exact count and sums — so ``ent_q`` is an
    exact integer, partitioning/order-invariant and hash-comparable;
    H itself is ent_q / (n_words * 2^32) downstream.

    Shape: stateless scan, zero shuffle — one vectorized
    explode + (doc, word) pandas groupby per batch, never a per-token
    Python loop. Returns a Dataset of (doc_id, n_words, ent_q);
    empty docs score (0, 0)."""
    scale = float(np.int64(1) << np.int64(32))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(dtype="int64")
        toks = batch["text"].astype("string").fillna("") \
            .str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype="int64")
        out_ent = np.zeros(len(batch), dtype=np.int64)
        if lens.sum():
            flat = pd.DataFrame({
                "row": np.repeat(np.arange(len(batch)), lens),
                "w": np.concatenate([np.asarray(t, dtype=object)
                                     for t in toks])})
            cts = flat.groupby(["row", "w"], sort=False) \
                .size().reset_index(name="c")
            row = cts["row"].to_numpy(dtype="int64")
            c = cts["c"].to_numpy(dtype="int64")
            t = lens[row].astype(np.float64)
            q = np.floor((np.log(t) - np.log(c.astype(np.float64)))
                         * scale + 0.5).astype(np.int64)
            np.add.at(out_ent, row, c * q)  # exact int64 per-doc sums
        return pd.DataFrame({"doc_id": ids,
                             "n_words": lens,
                             "ent_q": out_ent})

    return ds.map_batches(score, batch_format="pandas")


def kneser_ney_scores(ds, vocab_size: int = 1024,
                      train_ds=None, discount: float = 0.75) -> "object":
    """Interpolated Kneser-Ney trigram scoring (Chen & Goodman 1999,
    fixed absolute discount D=0.75) — the canonical top rung of the
    no-external-model perplexity ladder (unigram -> bigram ->
    interpolated add-1 -> Stupid Backoff -> this).  The lower-order
    distributions use CONTINUATION type counts, not raw counts:

      p(w|u,v) = (max(c(uvw)-D, 0) + D*N1+(uv.)*p(w|v)) / c(uv.)
      p(w|v)   = (max(N1+(.vw)-D, 0) + D*N1+(v*)*p(w)) / N1+(.v.)
      p(w)     = (N1+(.w) + 1) / (N1+(..) + V)          [add-1 for OOV]

    with full backoff to the lower order when a denominator is absent
    (c(uv.)=0 -> p(w|v); N1+(.v.)=0 -> p(w)).  Every statistic is an
    exact-integer TYPE count derived from the distinct n-gram key sets
    (no float state), each rung is ONE single-division float expression
    tree replicated literally in the SQL oracle, and per-position
    -ln p quantizes to int64 at 2^32 (the bm25/dsir libm-ln precedent)
    so per-doc scores are exact integer sums — partitioning/order
    invariant and hash-comparable.

    ``train_ds`` holds the count corpus (defaults to ``ds``; pass a
    held-out split so unseen trigrams genuinely exercise the
    continuation rungs).  Shares the flat-keyed count-model build with
    trigram_nll_scores; the extra KN type counts are O(distinct
    n-grams) driver arrays computed from the already-held sorted key
    arrays and broadcast once.  Returns a Dataset of (doc_id, kn_q,
    n_trigrams); docs with < 3 tokens score (0, 0)."""
    import ray

    wref, model, oov, n_ids, n2, total = _trigram_model(
        ds if train_ds is None else train_ds, vocab_size)
    k2s, c2s, cv2s, k3s, c3s, cx3k, cx3v, c1s = ray.get(model)

    # KN type counts, all from the sorted distinct key arrays:
    # N1+(uv.) — distinct continuations per trigram context = run
    # lengths of k3s // n_ids (contexts sorted, same runs as cx3k)
    k3ctx = k3s // n_ids
    if len(k3ctx):
        bounds = np.flatnonzero(np.diff(k3ctx)) + 1
        starts = np.concatenate([[0], bounds])
        tfol_vals = np.diff(np.concatenate(
            [starts, [len(k3ctx)]])).astype("int64")
    else:
        tfol_vals = np.array([], dtype="int64")
    # N1+(.vw) — distinct predecessors per (v, w) = multiplicity of the
    # trigram-key residual v*n + w; N1+(.v.) / N1+(v*) — trigram types
    # with middle v / distinct (v, w) pairs per v
    mid_raw = k3s % n2
    mid_keys, mid_vals = (np.unique(mid_raw, return_counts=True)
                          if len(mid_raw)
                          else (np.array([], dtype="int64"),) * 2)
    mid_vals = mid_vals.astype("int64")
    midv = np.zeros(n_ids, dtype=np.int64)
    np.add.at(midv, mid_raw // n_ids, 1)
    midfol = np.zeros(n_ids, dtype=np.int64)
    np.add.at(midfol, mid_keys // n_ids, 1)
    # N1+(.w) — distinct predecessors per w over bigram types;
    # N1+(..) — total bigram types
    contw = np.zeros(n_ids, dtype=np.int64)
    np.add.at(contw, k2s % n_ids, 1)
    n_bi_types = int(len(k2s))

    kn_ref = ray.put((k3s, c3s, cx3k, cx3v, tfol_vals, mid_keys,
                      mid_vals, midv, midfol, contw))
    fn = float(n_ids)
    dsc = float(discount)
    scale = float(np.int64(1) << np.int64(32))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        (k3l, c3l, cxk, cxv, tfv, mks, mvs, mdv, mdf, cw) = \
            ray.get(kn_ref)
        out_id = batch["doc_id"].to_numpy(dtype="int64")
        kn = np.zeros(len(batch), dtype=np.int64)
        nt = np.zeros(len(batch), dtype=np.int64)
        ids, doc_of = _flat_token_ids(batch, ray.get(wref), oov)
        if len(ids) >= 3:
            v3 = (doc_of[:-2] == doc_of[1:-1]) \
                & (doc_of[1:-1] == doc_of[2:])
            u, v, w = ids[:-2][v3], ids[1:-1][v3], ids[2:][v3]
            t_of = doc_of[2:][v3]
            ctx = u * n_ids + v
            tc = _lookup(k3l, c3l, u * n2 + v * n_ids + w)
            tctx = _lookup(cxk, cxv, ctx)
            tfol = _lookup(cxk, tfv, ctx)
            mc = _lookup(mks, mvs, v * n_ids + w)
            # each rung is a single division; np.where evaluates the
            # masked lanes too, so guard denominators with max(., 1)
            # (no-op on selected lanes — counts are >= 1 when present)
            p1 = (cw[w] + 1.0) / (n_bi_types + fn)
            den2 = np.maximum(mdv[v], 1).astype(np.float64)
            p2 = np.where(mdv[v] > 0,
                          (np.maximum(mc - dsc, 0.0)
                           + dsc * mdf[v] * p1) / den2, p1)
            den3 = np.maximum(tctx, 1).astype(np.float64)
            p = np.where(tctx > 0,
                         (np.maximum(tc - dsc, 0.0)
                          + dsc * tfol * p2) / den3, p2)
            q = np.floor(-np.log(p) * scale + 0.5).astype(np.int64)
            np.add.at(kn, t_of, q)  # exact int64 per-doc sums
            nt = np.bincount(t_of, minlength=len(batch)) \
                .astype("int64")
        return pd.DataFrame({"doc_id": out_id, "kn_q": kn,
                             "n_trigrams": nt})

    return ds.map_batches(score, batch_format="pandas")


def weighted_sample_topk(ds, k: int, weight_col: str,
                         id_col: str = "doc_id"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006): keep the k rows with the largest priority
    ln(u_i)/w_i, where u_i is the md5-derived uniform
    (h_i + 1)/2^32 in (0, 1] from ``_id_hash_u32`` — items win with
    probability proportional to weight, reproducibly at any
    parallelism, no RNG state. Priorities quantize to int64 at 2^32
    (ln == libm on both engines — the bm25/dsir precedent), so the
    selection is an exact integer total order (priority desc, id asc)
    and the SQL oracle is one row_number window.

    Combiner shape: every batch emits at most its own top-k rows
    (vectorized argpartition-free sort on two keys), so the final
    merge sees O(batches x k) rows and the corpus never shuffles.
    Weights must be positive integers. Returns a driver DataFrame of
    the k winners (id, weight, priority_q) sorted by id — a sample is
    driver-sized by construction."""
    scale = float(np.int64(1) << np.int64(32))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch[weight_col].to_numpy(dtype="int64")
        if (w <= 0).any():
            raise ValueError("weighted_sample_topk needs positive "
                             "weights")
        h = _id_hash_u32(batch[id_col])
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        pri = np.floor(np.log(u) / w * scale + 0.5).astype(np.int64)
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype="int64"),
            weight_col: w, "priority_q": pri})
        return out.sort_values(
            ["priority_q", id_col], ascending=[False, True]).head(k)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             weight_col: pd.Series(dtype="int64"),
                             "priority_q": pd.Series(dtype="int64")})
    return parts.sort_values(["priority_q", id_col],
                             ascending=[False, True]).head(k) \
        .sort_values(id_col).reset_index(drop=True)


def rendezvous_shards(ds, n_shards: int = 16, id_col: str = "doc_id"):
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment: every row goes to the shard s maximizing
    md5(id || '|' || s) — the consistent-sharding primitive for
    resumable partitioned output (adding a shard moves only ~1/n of
    keys, unlike mod-n which moves almost all of them).

    Stateless zero-shuffle scan; deterministic at any parallelism and
    recomputable in SQL (row_number over the same md5 weights). Ties
    break toward the LOWEST shard id (md5 collisions across shard
    suffixes are astronomically unlikely but the rule is pinned for
    engine parity). Returns (id_col, shard)."""
    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        w = np.empty((len(ids), n_shards), dtype=np.int64)
        for s in range(n_shards):
            w[:, s] = np.fromiter(
                (int(hashlib.md5(f"{int(i)}|{s}".encode())
                     .hexdigest()[:8], 16) for i in ids),
                dtype="int64", count=len(ids))
        # argmax takes the FIRST maximum -> lowest shard id on ties
        return pd.DataFrame({id_col: ids.to_numpy(),
                             "shard": np.argmax(w, axis=1)
                             .astype("int64")})

    return ds.map_batches(assign, batch_format="pandas")


def vocab_growth(ds, n_checkpoints: int = 10, text_col: str = "text",
                 id_col: str = "doc_id", bucket_bits: int = 10):
    """Heaps'-law vocabulary-growth curve — the corpus-scaling report
    (how fast does the distinct-token vocabulary grow as the corpus
    streams in deterministic shuffle order?). At each checkpoint i
    (the first ceil(i*n/K) docs by md5 shuffle rank), reports the
    exact distinct-token count seen so far.

    Exact and shuffle-free beyond what the rank already pays: ranks
    come from ``shuffle_order`` (bucket prefix sums, no global sort);
    each doc's tokens explode to (token, rank) partials that combine
    per batch to per-token MIN rank candidates; ONE vocab-keyed hash
    aggregate takes the global min; a final bounded fold buckets those
    first-occurrence ranks into the K checkpoint bins (K rows to the
    driver). Returns (checkpoint, n_docs, distinct_tokens) — the
    running vocabulary size after each prefix.
    """
    import ray.data
    from ray.data.aggregate import Min

    from warcio_ray.ops.blocks import arrow_blocks, safe_join, \
        tree_aggregate

    if n_checkpoints < 1:
        raise ValueError("n_checkpoints must be >= 1")
    ranked = shuffle_order(ds.select_columns([id_col]),
                           id_col=id_col,
                           bucket_bits=bucket_bits)  # (id, rank)
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"checkpoint": pd.Series(dtype="int64"),
                             "n_docs": pd.Series(dtype="int64"),
                             "distinct_tokens":
                                 pd.Series(dtype="int64")})
    # prefix sizes: checkpoint i covers the first ceil(i*n/K) docs
    sizes = [(i * n + n_checkpoints - 1) // n_checkpoints
             for i in range(1, n_checkpoints + 1)]

    import ray as _r
    npart = min(32, max(2, int(_r.cluster_resources()
                               .get("CPU", 8))))
    with_rank = safe_join(ds.select_columns([id_col, text_col]),
                          ranked, "inner", npart, (id_col,))

    def explode_min(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.set_index(batch["shuffle_rank"]
                            .astype("int64"))[text_col] \
            .fillna("").str.split()
        ex = s.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "r": pd.Series(dtype="int64")})
        # per-batch combine: min rank per distinct token
        m = ex.index.to_series().groupby(ex.values).min()
        return pd.DataFrame({"token": m.index.astype(object),
                             "r": m.to_numpy(dtype="int64")})

    first_rank = arrow_blocks(
        with_rank.map_batches(explode_min, batch_format="pandas")) \
        .groupby("token").aggregate(Min("r", alias_name="fr"))

    bounds = np.asarray(sizes, dtype="int64")

    def bin_fold(batch: pd.DataFrame) -> pd.DataFrame:
        fr = batch["fr"].to_numpy(dtype="int64")
        # token first seen at rank fr is inside checkpoint i iff
        # fr < sizes[i]; count per FIRST such bin, cumsum later
        b = np.searchsorted(bounds, fr, side="right")
        ud, cnt = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": ud, "c": cnt.astype("int64")})

    bins = tree_aggregate(
        first_rank.map_batches(bin_fold, batch_format="pandas"),
        ["bin"], sums=("c",))
    acc = np.zeros(n_checkpoints, dtype="int64")
    for b, c in zip(bins["bin"].astype(int), bins["c"].astype(int)):
        if b < n_checkpoints:
            acc[b] += c
    return pd.DataFrame({
        "checkpoint": np.arange(1, n_checkpoints + 1, dtype="int64"),
        "n_docs": bounds,
        "distinct_tokens": np.cumsum(acc)})


def curriculum_order(ds, n_buckets: int = 10,
                     text_col: str = "text", id_col: str = "doc_id",
                     bucket_bits: int = 10):
    """Curriculum data ordering — rank the corpus easiest-first by a
    difficulty proxy (token count), shuffled WITHIN each difficulty
    decile: sort key (difficulty_bucket, md5(id), id). The standard
    length-curriculum recipe for LLM pretraining, exact at any
    parallelism.

    Difficulty buckets: exact token-count deciles via the standing
    ``histogram_quantiles`` rank rule ((p*n+99)//100 over the bounded
    count histogram); bucket(doc) = #cutoffs strictly below its count
    plus ties-to-the-right (searchsorted side='left' on the cutoff
    array — SQL mirrors it as a COUNT of cutoffs < wc OR (== handled
    identically)). Within a bucket the order is the md5 shuffle rank.

    Scale shape: the shuffle_order machinery with a composite cell
    key (bucket << bits | md5_top_bits) — ONE narrow projection pass
    (+ the bounded histogram pass for cutoffs), cell counts through
    the tree combiner, O(n_buckets * 2^bits) driver prefix sums, ONE
    hash shuffle with vectorized local sorts. Text never shuffles.

    Returns (id_col, bucket, curriculum_rank), rank 0-based over the
    whole corpus.
    """
    import ray
    import ray.data

    from warcio_ray.ops.blocks import tree_aggregate
    from warcio_ray.ops.quantile import histogram_quantiles

    counts = ds.map_batches(
        lambda b: pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "wc": b[text_col].fillna("").str.count(r"\S+")
            .astype("int64")}),
        batch_format="pandas").materialize()

    pcts = [100 * i // n_buckets for i in range(1, n_buckets)]
    qs = histogram_quantiles(counts, value_col="wc", pcts=pcts)
    cutoffs = np.asarray(sorted(qs["value"].astype(int)),
                         dtype="int64")

    shift = 32 - bucket_bits

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype("int64")
        wc = batch["wc"].to_numpy(dtype="int64")
        bq = np.searchsorted(cutoffs, wc, side="left").astype("int64")
        h = _id_hash_u32(ids)
        return pd.DataFrame({
            id_col: ids, "bucket_q": bq, "_h": h,
            "cell": (bq << np.int64(bucket_bits)) + (h >> shift)})

    keyed = counts.map_batches(project,
                               batch_format="pandas").materialize()

    def cell_counts(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["cell"].value_counts()
        return pd.DataFrame({"cell": vc.index.to_numpy(dtype="int64"),
                             "c": vc.to_numpy(dtype="int64")})

    totals = tree_aggregate(
        keyed.map_batches(cell_counts, batch_format="pandas"),
        ["cell"], sums=("c",))
    if len(totals) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "bucket": pd.Series(dtype="int64"),
            "curriculum_rank": pd.Series(dtype="int64")}))
    totals = totals.sort_values("cell").reset_index(drop=True)
    c = totals["c"].to_numpy(dtype="int64")
    base = np.concatenate([[0], np.cumsum(c)[:-1]])
    base_ref = ray.put(dict(zip(totals["cell"].astype("int64"),
                                base)))

    def rank_group(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values(["_h", id_col], kind="mergesort")
        b = ray.get(base_ref)[int(grp["cell"].iloc[0])]
        return pd.DataFrame({
            id_col: grp[id_col].to_numpy(dtype="int64"),
            "bucket": grp["bucket_q"].to_numpy(dtype="int64"),
            "curriculum_rank": b + np.arange(len(grp),
                                             dtype="int64")})

    return keyed.groupby("cell").map_groups(rank_group,
                                            batch_format="pandas")


def zipf_slope(ds, top_n: int = 100) -> pd.DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: the OLS
    slope of ln(count) on ln(rank) across the top ``top_n`` terms — a
    one-row corpus-health signal (natural text sits near -1; template
    spam and boilerplate flatten it, keyword stuffing steepens it).

    Exactness: each per-term ln value quantizes to int64 at 2^16 FIRST
    (the libm-ln precedent — one fixed float expression, identical in
    SQL), then the closed-form slope numerator/denominator
    (n*Sxy - Sx*Sy, n*Sxx - Sx^2) accumulates in Python ints over the
    <= top_n quantized points — exact integers, no float division.
    With n <= 1000 and counts < 2^40, every sum stays < 2^63.

    Scale shape: reuses the top_terms combiner (per-batch distinct-term
    partials, one O(vocab) groupby, distributed 2-key sort + limit);
    the regression itself touches top_n rows on the driver. Returns a
    one-row DataFrame (n_terms, slope_num, slope_den).

    No reference counterpart (corpus-statistics operator)."""
    top = top_terms(ds, k=top_n)
    n = len(top)
    if n == 0:
        return pd.DataFrame({"n_terms": [0], "slope_num": [0],
                             "slope_den": [0]}).astype("int64")
    scale = float(1 << 16)
    ranks = np.arange(1, n + 1, dtype=np.float64)
    cts = top["n"].to_numpy(dtype="int64").astype(np.float64)
    x = np.floor(np.log(ranks) * scale + 0.5).astype(np.int64)
    y = np.floor(np.log(cts) * scale + 0.5).astype(np.int64)
    xi = [int(v) for v in x]
    yi = [int(v) for v in y]
    sx, sy = sum(xi), sum(yi)
    sxy = sum(a * b for a, b in zip(xi, yi))
    sxx = sum(a * a for a in xi)
    return pd.DataFrame({
        "n_terms": [n],
        "slope_num": [n * sxy - sx * sy],
        "slope_den": [n * sxx - sx * sx],
    }).astype("int64")


def hapax_stats(ds, group_col: str = "source", text_col: str = "text"):
    """Per-group hapax legomena statistics — the vocabulary-health
    fingerprint (Baayen, "Word Frequency Distributions"): a source
    whose hapax share collapses is template/boilerplate-generated
    (same strings over and over); a natural-language source keeps
    a fat singleton tail. The corpus-linguistics complement of
    vocab_growth (which tracks the corpus-level curve).

    Shape at scale: one stateless scan emits per-batch (group, word)
    count partials (combiner); ONE vocab-bounded groupby; the
    per-group rollup is a second bounded aggregate over the unique
    (group, word) rows. All exact integers; ratio = the one rounded
    division.

    Returns (source, tokens, vocab, hapax, hapax_ratio) per group,
    hapax_ratio = hapax / vocab rounded to 6 decimals."""
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks, tree_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        cells: "Counter" = Counter()
        for g, text in zip(batch[group_col].astype(str),
                           batch[text_col]):
            for w in (text or "").split():
                cells[(g, w)] += 1
        if not cells:
            return pd.DataFrame({group_col: pd.Series(dtype=object),
                                 "w": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        ks = list(cells.keys())
        return pd.DataFrame({group_col: [k[0] for k in ks],
                             "w": [k[1] for k in ks],
                             "n": np.fromiter(cells.values(),
                                              dtype="int64")})

    counts = arrow_blocks(ds.select_columns([group_col, text_col])
                          .map_batches(partial, batch_format="pandas")) \
        .groupby([group_col, "w"]).aggregate(Sum("n", alias_name="n"))

    def rollup(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(dtype="int64")
        out = pd.DataFrame({group_col: batch[group_col],
                            "tokens": n,
                            "vocab": np.int64(1),
                            "hapax": (n == 1).astype("int64")})
        return out.groupby(group_col, as_index=False).sum() \
            .astype({"tokens": "int64", "vocab": "int64",
                     "hapax": "int64"})

    per_group = tree_aggregate(
        counts.map_batches(rollup, batch_format="pandas"),
        [group_col], sums=("tokens", "vocab", "hapax"))
    if len(per_group) == 0:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "tokens": pd.Series(dtype="int64"),
                             "vocab": pd.Series(dtype="int64"),
                             "hapax": pd.Series(dtype="int64"),
                             "hapax_ratio": pd.Series(dtype="float64")})
    per_group = per_group.sort_values(group_col).reset_index(drop=True)
    per_group["hapax_ratio"] = [
        round(h / v, 6) if v else 0.0
        for h, v in zip(per_group["hapax"], per_group["vocab"])]
    return per_group.astype({"tokens": "int64", "vocab": "int64",
                             "hapax": "int64"})
