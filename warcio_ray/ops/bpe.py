"""Byte-pair-encoding tokenizer training and encoding over the corpus
(Sennrich et al. 2016) — the missing piece between a cleaned corpus and
token-packed training sequences.

Scale shape (the standard trainer factorization, same as the reference
BPE implementations): the ONLY corpus-sized pass is a distributed
word-frequency combiner (each batch collapses to its distinct words
before the shuffle, the groupby moves O(vocab) rows); the merge loop
then runs over the collected (word, count) vocabulary — O(vocab) driver
memory, corpus-size independent, exactly what production tokenizer
trainers (HuggingFace, SentencePiece) hold in memory. ``vocab_cap``
bounds driver memory explicitly: training keeps the top-N words by
(count desc, word asc) and reports how much corpus mass the tail
dropped, so the cap is accounted, never silent.

Encoding is a stateless ``map_batches`` scan with a module-global
(merge-ranks, per-word-result) cache per worker process — merges are
tiny, so tasks + cache beat an actor pool's spin-up.

Determinism: merge selection is (pair count desc, pair lexicographic
asc) — total order, no hash iteration order leaks; training twice or at
any partitioning gives identical merge tables (tested). Not
SQL-expressible (iterative vocabulary rewriting), so the harness query
is rows-only; correctness is covered by a from-first-principles
reference trainer in tests plus partitioning invariance.

No reference counterpart (warcio has no tokenizer).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

__all__ = ["word_counts", "train_bpe", "encode_bpe_batch", "bpe_merges"]

_EOW = "</w>"

# per-worker-process encode caches keyed by a merge-table fingerprint
_encode_cache: dict = {}


def word_counts(ds, value_col: str = "text"):
    """Distributed (word, count) over whitespace tokens — the combiner
    pass. O(vocab) rows leave each batch; the groupby key space is the
    vocabulary."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in batch[value_col]:
            c.update((text or "").split())
        if not c:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        return pd.DataFrame({"word": list(c.keys()),
                             "c": np.fromiter(c.values(), dtype="int64")})

    from warcio_ray.ops.blocks import arrow_blocks

    return arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby("word").aggregate(Sum("c", alias_name="c"))


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    pairs: Dict[Tuple[str, str], int] = {}
    for sym, c in vocab.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + c
    return pairs


def _merge_word(sym: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    out: List[str] = []
    i, n = 0, len(sym)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(ds, value_col: str = "text", n_merges: int = 50,
              vocab_cap: int = 1_000_000) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a
    DataFrame (rank, left, right, pair_count) — rank is merge order.

    Words carry a ``</w>`` end marker (merges never cross word
    boundaries). Selection per round: max pair count, ties broken by
    (left, right) ascending — a total order, so training is
    deterministic at any parallelism.
    """
    wc_ds = word_counts(ds, value_col)
    n_vocab = wc_ds.count()
    if n_vocab > vocab_cap:
        # the cap is enforced DATASET-side (distributed 2-key sort +
        # limit, same shape as top_terms): the driver only ever holds
        # vocab_cap rows, even when the corpus vocabulary is unbounded
        # (URLs, hashes). Dropped mass is accounted, never silent.
        total = int(wc_ds.sum(on="c"))
        wc = wc_ds.sort(["c", "word"], descending=[True, False]) \
            .limit(vocab_cap).to_pandas()
        dropped = total - int(wc["c"].sum())
        import warnings
        warnings.warn(
            f"train_bpe: vocab_cap={vocab_cap} dropped "
            f"{n_vocab - vocab_cap} tail words ({dropped} occurrences)",
            RuntimeWarning)
    else:
        wc = wc_ds.to_pandas()  # <= vocab_cap rows
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, c in zip(wc["word"], wc["c"]):
        sym = tuple(word) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(c)

    rows = []
    for rank in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # total order: count desc, then pair lexicographic asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        rows.append((rank, left, right, int(cnt)))
        vocab = {_merge_word(sym, (left, right)): c
                 for sym, c in vocab.items()}
    return pd.DataFrame(rows, columns=["rank", "left", "right",
                                       "pair_count"]) \
        .astype({"rank": "int64", "pair_count": "int64"})


def bpe_merges(merges_df: pd.DataFrame) -> Dict[Tuple[str, str], int]:
    """Merge table -> {pair: rank} lookup for the encoder."""
    return {(l, r): int(k) for k, l, r in
            zip(merges_df["rank"], merges_df["left"], merges_df["right"])}


def _encode_word(word: str, ranks: Dict[Tuple[str, str], int],
                 cache: dict) -> Tuple[str, ...]:
    toks = cache.get(word)
    if toks is not None:
        return toks
    sym: List[str] = list(word) + [_EOW]
    while len(sym) > 1:
        # lowest-rank applicable merge, leftmost occurrence
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    toks = tuple(sym)
    if len(cache) < 2_000_000:  # bound worker memory
        cache[word] = toks
    return toks


def encode_bpe_batch(batch: pd.DataFrame, merges_df: pd.DataFrame,
                     value_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Encode each row's text with a learned merge table; emits
    (id, n_tokens, n_chars) per row. Pass via ``functools.partial``
    into map_batches; the per-word result cache is module-global per
    worker process and keyed by the merge table's fingerprint."""
    import hashlib

    # full-content fingerprint: two models sharing a worker process
    # must never mix caches (a prefix key would collide silently)
    key = hashlib.md5(("\x00".join(
        f"{k}\x01{l}\x01{r}" for k, l, r in
        zip(merges_df["rank"], merges_df["left"], merges_df["right"]))
        ).encode("utf-8")).hexdigest()
    if key not in _encode_cache:  # build the ranks dict once per model
        _encode_cache[key] = (bpe_merges(merges_df), {})
    ranks, cache = _encode_cache[key]
    n_toks = np.zeros(len(batch), dtype=np.int64)
    n_chars = np.zeros(len(batch), dtype=np.int64)
    for i, text in enumerate(batch[value_col]):
        total = 0
        for w in (text or "").split():
            total += len(_encode_word(w, ranks, cache))
        n_toks[i] = total
        n_chars[i] = len(text or "")
    return pd.DataFrame({id_col: batch[id_col].astype("int64"),
                         "n_bpe_tokens": n_toks, "n_chars": n_chars})
