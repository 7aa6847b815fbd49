"""C4-style web-text cleaning (Raffel et al. 2020, the public C4
rule set): line-level retention — a line survives only if it ends in
terminal punctuation (. ! ? "), has at least ``min_words`` words and
does not mention javascript — plus document-level kill rules: fewer
than ``min_lines`` surviving lines, a "lorem ipsum" placeholder, or a
curly brace (code leakage) drops the whole page.

This is the canonical heuristic-cleaning rung of the quality family:
unlike the gopher/statistics scorers (thresholds over corpus-level
ratios) it is a pure per-document decision procedure, so the stage is
a stateless, shuffle-free ``map_batches`` scan — embarrassingly
parallel at any corpus size, no driver state, nothing materialized.

Every rule is exact string arithmetic (no floats, no tokenizer), so a
SQL oracle replays the decision bit-for-bit; the op returns the md5 of
the cleaned text so byte-level agreement of the REBUILT document (not
just the verdict) is part of the contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["c4_quality_filter"]


def c4_quality_filter(ds, id_col: str = "doc_id", text_col: str = "text",
                      min_words: int = 5, min_lines: int = 3):
    """Dataset of (id_col, n_lines, n_kept_lines, kept, clean_md5).

    Line kept iff: >= min_words ``\\S+`` words AND ends with one of
    ``. ! ? "`` AND lowercased line does not contain ``javascript``.
    Doc kept iff: >= min_lines kept lines AND full text contains
    neither ``lorem ipsum`` (case-insensitive) nor ``{``.
    ``clean_md5`` is the md5 hex of the kept lines re-joined with
    ``\\n`` (computed for every doc, kept or not). An empty text has
    0 lines by definition (NOT one empty line).
    """

    def stage(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype="int64")
        texts = batch[text_col].fillna("").astype(str)
        split = texts.str.split("\n")
        counts = np.where(texts.str.len().to_numpy() == 0,
                          0, split.str.len().to_numpy()).astype("int64")
        doc_of = np.repeat(np.arange(len(batch)), counts)
        lines = pd.Series(
            [l for t, c in zip(split, counts) if c for l in t],
            dtype="object")
        if len(lines):
            words = lines.str.count(r"\S+").to_numpy()
            term = lines.str.contains(r'[.!?"]$', regex=True,
                                      na=False).to_numpy()
            bl = lines.str.lower().str.contains(
                "javascript", regex=False, na=False).to_numpy()
            keep = (words >= min_words) & term & ~bl
        else:
            keep = np.zeros(0, dtype=bool)
        n_kept = np.bincount(doc_of[keep], minlength=len(batch)) \
            .astype("int64")
        cleaned = [""] * len(batch)
        if keep.any():
            kept_ser = pd.Series(lines.to_numpy()[keep]) \
                .groupby(doc_of[keep]).agg("\n".join)
            for i, s in kept_ser.items():
                cleaned[i] = s
        lower = texts.str.lower()
        poisoned = (lower.str.contains("lorem ipsum", regex=False)
                    | texts.str.contains("{", regex=False)).to_numpy()
        kept_doc = ((n_kept >= min_lines) & ~poisoned).astype("int64")
        return pd.DataFrame({
            id_col: ids,
            "n_lines": counts,
            "n_kept_lines": n_kept,
            "kept": kept_doc,
            "clean_md5": [hashlib.md5(c.encode()).hexdigest()
                          for c in cleaned]})

    return ds.select_columns([id_col, text_col]) \
        .map_batches(stage, batch_format="pandas")
