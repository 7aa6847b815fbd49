"""Stylometry — Burrows' Delta (Burrows 2002, "'Delta': a Measure of
Stylistic Difference"), the standard authorship-attribution distance:
sources are compared by how far their FUNCTION-WORD frequency profiles
sit from the corpus norm, z-scored per word so no single common word
dominates. In a crawl pipeline this is the mirror-site / content-farm
attribution signal: two hosts pushing the same ghost-written template
sit at tiny Delta even when their topical vocabulary differs.

Exact-integer contract (SQL-replayable bit-for-bit):
  - function words = top ``f`` corpus terms by count, ties term asc
    (the ``top_terms`` combiner rule);
  - relative frequency is quantized: Q = (n_sw << 40) // N_s
    (nonnegative, floor == trunc);
  - per-word deviation uses the scaled form d = S*Q - sum_s(Q) (no
    floored mean, no bias), variance numerator sum(d^2) in Python
    ints, sigma = math.isqrt (exact integer sqrt);
  - z = sign(d) * ((|d| << 20) // max(sigma, 1)) — sign-decomposed so
    the SQL side's truncating HUGEINT division agrees;
  - Delta(a, b) = sum_w |z_aw - z_bw| (exact int64, NOT divided by f
    — a monotone rescale that keeps the result integer).

Shape at scale: ONE stateless scan emits per-batch (source, term)
count partials restricted to the broadcast function-word set plus a
per-source total sentinel; one bounded groupby (S x (f+1) cells) is
the only shuffle; the driver finishes on that tiny grid. The top-f
vocabulary pass is the ``top_terms`` vocab-bounded combiner.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["burrows_delta"]

_TOTAL = ""  # sentinel term for per-source token totals (terms are \S+ runs,
             # never empty, so it cannot collide)


def burrows_delta(ds, f: int = 20, text_col: str = "text",
                  group_col: str = "source") -> pd.DataFrame:
    """Pairwise Burrows' Delta between groups (sources).

    Returns a DataFrame (source_a, source_b, delta) for every
    unordered group pair (a < b as strings), delta = the exact-integer
    scaled sum over the ``f`` function words of |z_a - z_b|.
    """
    import ray
    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks
    from warcio_ray.ops.textstats import top_terms

    fw = top_terms(ds.select_columns([text_col]), k=f)
    fset_ref = ray.put(frozenset(fw["term"].tolist()))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        fset = ray.get(fset_ref)
        cells: Counter = Counter()
        for src, text in zip(batch[group_col].astype(str),
                             batch[text_col]):
            toks = (text or "").split()
            cells[(src, _TOTAL)] += len(toks)
            for w in toks:
                if w in fset:
                    cells[(src, w)] += 1
        if not cells:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "term": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        keys = list(cells.keys())
        return pd.DataFrame({
            group_col: [k[0] for k in keys],
            "term": [k[1] for k in keys],
            "n": np.fromiter(cells.values(), dtype="int64")})

    grid = arrow_blocks(ds.select_columns([group_col, text_col])
                        .map_batches(partial, batch_format="pandas")) \
        .groupby([group_col, "term"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()

    if len(grid) == 0:
        return pd.DataFrame({"source_a": pd.Series(dtype="object"),
                             "source_b": pd.Series(dtype="object"),
                             "delta": pd.Series(dtype="int64")})

    # Drop sources with zero tokens: they have no frequency profile,
    # and the SQL replay (which derives sources by unnesting tokens)
    # never sees them — both sides must agree on the source set.
    totals = {s: int(n) for s, t, n in
              grid.itertuples(index=False) if t == _TOTAL and int(n) > 0}
    counts = {(s, t): int(n) for s, t, n in
              grid.itertuples(index=False) if t != _TOTAL}
    sources = sorted(totals)
    words = fw["term"].tolist()
    S = len(sources)

    # quantized relative frequencies, exact Python ints throughout
    q = {(s, w): (counts.get((s, w), 0) << 40) // max(totals[s], 1)
         for s in sources for w in words}
    z = {}
    for w in words:
        tv = sum(q[(s, w)] for s in sources)
        devs = {s: S * q[(s, w)] - tv for s in sources}
        sig = math.isqrt(sum(d * d for d in devs.values()))
        sig = max(sig, 1)
        for s, d in devs.items():
            z[(s, w)] = (abs(d) << 20) // sig * (1 if d >= 0 else -1)

    rows = []
    for i in range(S):
        for j in range(i + 1, S):
            a, b = sources[i], sources[j]
            rows.append((a, b, sum(abs(z[(a, w)] - z[(b, w)])
                                   for w in words)))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "delta"]) \
        .astype({"delta": "int64"})
