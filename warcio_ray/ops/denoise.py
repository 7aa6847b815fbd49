"""T5/UL2-style span-corruption training-pair generation — the
denoising-objective data prep step (Raffel et al. 2020): mask token
spans, emit (corrupted input, target) string pairs with ordinal
sentinels.

Deterministic block rule (exactness => partitioning-invariance => a
hard SQL oracle, the house idiom): a document's tokens split into
fixed ``span``-token blocks; block b of doc d is masked iff

    int(md5(f"{d}:{b}")[:8], 16) % 100 < mask_pct

— the same md5-rank convention every sampling op here uses
(SQL: CAST('0x' || substr(md5(d || ':' || b), 1, 8) AS BIGINT)).
Fixed blocks make the mask decision per-block independent (no greedy
left-to-right scan, which would not vectorize or SQL-mirror), at the
cost of spans starting only at multiples of ``span`` — the objective
is statistically equivalent.

Output per doc: ``corrupted`` (unmasked blocks verbatim, each masked
block replaced by its ordinal sentinel ``<extra_id_K>``, K counting
masked blocks left-to-right from 0) and ``target`` (each sentinel
followed by the masked block's tokens), both single-space joined,
plus exact integer counts. Docs with zero tokens emit nothing.

Scale shape: ONE stateless scan — token split and block accounting
are vectorized; the md5 mask decision costs one hash per BLOCK (not
per token), and string assembly is the per-doc Python every
string-emitting op here pays. No shuffle, no driver state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["span_corrupt"]


def _block_masked(doc_id: int, block: int, mask_pct: int) -> bool:
    h = int(hashlib.md5(f"{doc_id}:{block}".encode())
            .hexdigest()[:8], 16)
    return h % 100 < mask_pct


def span_corrupt(ds, span: int = 3, mask_pct: int = 15,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Explode documents into denoising pairs. Returns (id_col,
    n_blocks, n_masked_blocks, n_masked_tokens, corrupted, target)."""
    if not (0 <= mask_pct <= 100):
        raise ValueError(f"mask_pct must be 0..100, got {mask_pct}")
    if span < 1:
        raise ValueError(f"span must be >= 1, got {span}")

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"%s" % id_col: [], "n_blocks": [],
                "n_masked_blocks": [], "n_masked_tokens": [],
                "corrupted": [], "target": []}
        ids = batch[id_col].to_numpy(dtype="int64")
        toks = batch[text_col].fillna("").str.split()
        for d, t in zip(ids, toks):
            n = len(t)
            if n == 0:
                continue
            nb = (n + span - 1) // span
            corrupted, target = [], []
            k = n_masked_tok = n_masked_blk = 0
            for b in range(nb):
                seg = t[b * span:(b + 1) * span]
                if _block_masked(int(d), b, mask_pct):
                    sent = f"<extra_id_{k}>"
                    corrupted.append(sent)
                    target.append(sent)
                    target.extend(seg)
                    k += 1
                    n_masked_blk += 1
                    n_masked_tok += len(seg)
                else:
                    corrupted.extend(seg)
            rows[id_col].append(d)
            rows["n_blocks"].append(nb)
            rows["n_masked_blocks"].append(n_masked_blk)
            rows["n_masked_tokens"].append(n_masked_tok)
            rows["corrupted"].append(" ".join(corrupted))
            rows["target"].append(" ".join(target))
        out = pd.DataFrame(rows)
        return out.astype({id_col: "int64", "n_blocks": "int64",
                           "n_masked_blocks": "int64",
                           "n_masked_tokens": "int64"})

    return ds.map_batches(scan, batch_format="pandas")


def fim_transform(ds, min_tokens: int = 8, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Fill-in-the-middle transformation (Bavarian et al. 2022) — the
    code-LLM data prep step: split each document at two deterministic
    token cuts into (prefix, middle, suffix) and emit the PSM-ordered
    training string ``<PRE> prefix <SUF> suffix <MID> middle``.

    Deterministic cuts (same md5-rank idiom as span_corrupt):
        c_i = 1 + int(md5(f"{doc_id}:fim{i}")[:8], 16) % (n - 1)
    for i in (1, 2), lo/hi = min/max(c1, c2) — both cuts land in
    [1, n-1] so prefix and suffix are never empty; c1 == c2 gives an
    empty middle (a real case FIM training keeps). Docs under
    ``min_tokens`` tokens pass through unchanged (fim_text = text,
    n_middle = 0 convention with n_prefix = n, n_suffix = 0) so the
    output stays corpus-complete for packing.

    ONE stateless scan: two hashes per doc, list slicing + joins.
    """
    if min_tokens < 3:
        raise ValueError("min_tokens must be >= 3 (need room for "
                         "non-empty prefix and suffix)")

    def cut(d: int, i: int, n: int) -> int:
        h = int(hashlib.md5(f"{d}:fim{i}".encode()).hexdigest()[:8],
                16)
        return 1 + h % (n - 1)

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {id_col: [], "n_prefix": [], "n_middle": [],
                "n_suffix": [], "fim_text": []}
        ids = batch[id_col].to_numpy(dtype="int64")
        texts = batch[text_col].fillna("")
        toks = texts.str.split()
        for d, raw, t in zip(ids, texts, toks):
            n = len(t)
            if n < min_tokens:
                rows[id_col].append(d)
                rows["n_prefix"].append(n)
                rows["n_middle"].append(0)
                rows["n_suffix"].append(0)
                rows["fim_text"].append(" ".join(t))
                continue
            c1, c2 = cut(int(d), 1, n), cut(int(d), 2, n)
            lo, hi = min(c1, c2), max(c1, c2)
            rows[id_col].append(d)
            rows["n_prefix"].append(lo)
            rows["n_middle"].append(hi - lo)
            rows["n_suffix"].append(n - hi)
            rows["fim_text"].append(" ".join(
                ["<PRE>"] + t[:lo] + ["<SUF>"] + t[hi:]
                + ["<MID>"] + t[lo:hi]))
        out = pd.DataFrame(rows)
        return out.astype({id_col: "int64", "n_prefix": "int64",
                           "n_middle": "int64", "n_suffix": "int64"})

    return ds.map_batches(scan, batch_format="pandas")
