"""Greedy k-center coreset selection over an embedding column — the
classic diversity-maximizing data-selection primitive (farthest-point
traversal, 2-approximation to the k-center objective per Gonzalez
1985; used for active-learning / training-subset coresets, cf. Sener &
Savarese 2018). Picks the min-id vector, then k-1 times the vector
farthest (max min-distance) from everything selected so far.

Exact integer arithmetic end to end: vectors quantize to int64 at a
fixed scale (the kmeans/pq precedent), distances are int64 squared-L2
sums, the per-round winner is (max distance, tie -> min vec_id) — so
the selection is partitioning-invariant and SQL-replayable by
unrolling the k rounds.

Scale shape: the selected set is k codes broadcast via ``ray.put``;
each round is ONE stateless streamed scan emitting a single partial
winner row per batch (id, min-dist, code), reduced driver-side over
O(batches) rows. The corpus never shuffles and never materializes; the
stateless recompute against all r selected codes (O(k^2 d n / 2) total
work) deliberately trades k-fold compute for ZERO per-round
materializations of the n-row running-min column — the right trade
while k stays coreset-sized (tens to thousands), since a broadcast
code matrix is k*d int64s.

No reference counterpart — training-data curation operator per the
build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from warcio_ray.ops.kmeans import _quantize

__all__ = ["kcenter_select"]


def kcenter_select(ds, k: int, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   scale: int = 1 << 16) -> pd.DataFrame:
    """Greedy farthest-point selection of ``k`` vectors. Returns a
    pandas DataFrame (sel_rank, vec_id, mind) where ``mind`` is the
    exact int64 squared-L2 distance (quantized space) from the winner
    to the previously-selected set at the moment of selection (0 for
    the min-id seed). Ties break to the lowest vec_id, matching the
    unrolled SQL oracle; the selected set may in principle re-pick on
    an all-duplicate corpus (both engines agree)."""
    import ray

    seed_id = int(ds.min(id_col))

    def fetch_seed(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[id_col] == seed_id]

    seed_row = ds.map_batches(fetch_seed,
                              batch_format="pandas").to_pandas()
    seed_code = _quantize(seed_row[vec_col], scale)[0]

    sel_ids = [seed_id]
    sel_mind = [0]
    codes = seed_code.reshape(1, -1)

    for _ in range(1, k):
        cref = ray.put(codes)

        def winner(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({
                    "vec_id": pd.Series(dtype="int64"),
                    "mind": pd.Series(dtype="int64"),
                    "code": pd.Series(dtype="object")})
            c = ray.get(cref)                       # (r, d) int64
            q = _quantize(batch[vec_col], scale)    # (b, d) int64
            # min over selected of squared L2, exact int64
            mind = np.full(len(q), np.iinfo(np.int64).max,
                           dtype=np.int64)
            for row in c:
                diff = q - row
                mind = np.minimum(mind, np.einsum("ij,ij->i", diff,
                                                  diff))
            ids = batch[id_col].to_numpy(dtype="int64")
            # partial winner: max mind, tie -> min id
            best = np.lexsort((ids, -mind))[0]
            return pd.DataFrame({"vec_id": [ids[best]],
                                 "mind": [mind[best]],
                                 "code": [q[best].tolist()]})

        parts = ds.map_batches(winner,
                               batch_format="pandas").to_pandas()
        parts = parts.sort_values(["mind", "vec_id"],
                                  ascending=[False, True])
        top = parts.iloc[0]
        sel_ids.append(int(top["vec_id"]))
        sel_mind.append(int(top["mind"]))
        codes = np.vstack([codes, np.asarray(top["code"],
                                             dtype=np.int64)])

    return pd.DataFrame({
        "sel_rank": np.arange(k, dtype="int64"),
        "vec_id": np.asarray(sel_ids, dtype="int64"),
        "mind": np.asarray(sel_mind, dtype="int64")})
