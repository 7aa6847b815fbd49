"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a Ray
Data combiner — approximate per-key cardinality where an exact
count-distinct would shuffle every value.

Scale shape (the whole point of the sketch): each batch folds its
values into at most ``m = 2**b`` register rows PER KEY before anything
shuffles, the global merge is a ``groupby(key, bucket).max`` over those
bounded partials, and the estimate is a per-key fold over m rows. At
100 TB the exchange is O(#keys x 1024) rows regardless of corpus size;
an exact distinct would be O(distinct values).

Determinism / oracle: value hashes are md5-derived 64-bit ints and the
harmonic-mean denominator is accumulated as EXACT integer numerators
(2^-M_j == 2^(64-M_j) / 2^64, with M_j <= 64), so register tables and
estimates are reproducible at any partitioning and recomputable in
DuckDB (bucket = h >> (64-b); rank via length(bin(w))).

No reference counterpart (warcio has no sketches).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

__all__ = ["hll_distinct", "hll_estimate_from_registers",
           "count_min_probe", "misra_gries_heavy", "hyperball",
           "hyperball_harmonic", "effective_diameter"]

# per-worker-process token hash memo, keyed by precision b
_hash_memo: dict = {}


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_estimate_from_registers(regs: np.ndarray, b: int) -> float:
    """regs: dense array of m register values (0 for never-hit).
    Exact-integer harmonic denominator, then the standard small-range
    (linear counting) correction."""
    m = 1 << b
    # pure-Python ints: 2^(64-0) overflows int64, and the sum must be
    # exact for order-independence
    denom_int = sum(1 << (64 - int(r)) for r in regs) if len(regs) \
        else m << 64
    est = _alpha(m) * m * m * float(1 << 64) / float(denom_int)
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_distinct(ds, key_col: str, value_col: str, b: int = 10,
                 tokenize: bool = False):
    """Approximate COUNT(DISTINCT value) per key.

    ``tokenize=True`` treats ``value_col`` as text and counts distinct
    whitespace tokens instead of distinct whole values. Returns a
    pandas DataFrame (key, n_distinct_est) — O(#keys) rows.
    """
    m = 1 << b
    shift = 64 - b
    wmask = (1 << (64 - b)) - 1

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        # worker-global (bucket, rho) memo: distinct tokens hash once
        # per worker, not once per occurrence (the task-cache pattern —
        # an actor pool's spin-up buys nothing for microsecond state)
        hmemo = _hash_memo.setdefault(b, {})
        keys_out, buckets_out, rhos_out = [], [], []
        memo: dict = {}
        for key, val in zip(batch[key_col], batch[value_col]):
            vals = (val or "").split() if tokenize else [val]
            best = memo.setdefault(key, {})
            for v in vals:
                br = hmemo.get(v)
                if br is None:
                    h = int(hashlib.md5(
                        str(v).encode("utf-8")).hexdigest()[:16], 16)
                    w = h & wmask
                    br = (h >> shift, (64 - b) - w.bit_length() + 1)
                    if len(hmemo) < 4_000_000:  # bound worker memory
                        hmemo[v] = br
                bucket, rho = br
                if rho > best.get(bucket, 0):
                    best[bucket] = rho
        for key, best in memo.items():
            for bucket, rho in best.items():
                keys_out.append(key)
                buckets_out.append(bucket)
                rhos_out.append(rho)
        return pd.DataFrame({
            key_col: keys_out,
            "bucket": np.array(buckets_out, dtype="int64"),
            "rho": np.array(rhos_out, dtype="int64")})

    from warcio_ray.ops.blocks import tree_aggregate

    # bounded key space (#keys x m registers) -> vectorized combiner
    # tree, not Ray's per-group sort aggregate (~3ms/group of Python)
    merged = tree_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        [key_col, "bucket"], maxs=("rho",))  # O(#keys x m) rows

    rows = []
    for key, grp in merged.groupby(key_col, sort=True):
        regs = np.zeros(m, dtype=np.int64)
        regs[grp["bucket"].to_numpy(dtype="int64")] = \
            grp["rho"].to_numpy(dtype="int64")
        rows.append((key, hll_estimate_from_registers(regs, b)))
    return pd.DataFrame(rows, columns=[key_col, "n_distinct_est"])


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def count_min_probe(ds, value_col: str, probes, d: int = 4, w: int = 2048,
                    tokenize: bool = True) -> pd.DataFrame:
    """Count-min frequency estimates for a probe set of tokens, with
    exact counts alongside (est_count >= true_count always; equality
    unless the probe's d cells all collide with other tokens).

    Scale shape: counts fold into a d x w integer sketch INSIDE each
    batch, so at most d*w + len(probes) partial rows leave any task
    regardless of batch size; the global merge is a
    ``groupby(r, col).sum`` over that bounded key space (registers are
    additive, the combiner-friendliest sketch there is); the driver fold
    is O(d*w + len(probes)), corpus-size independent. At 100 TB the
    exchange is ~8k rows per task, full stop.

    Determinism / oracle: a token's d columns are disjoint 8-hex-char
    slices of ONE md5 (col_r = int(md5(tok)[8r:8r+8], 16) % w), and all
    arithmetic is integer, so DuckDB recomputes the sketch and the
    estimates exactly (d <= 4 enforced by the 32-hex digest).

    ``probes`` must be tokens that occur in the corpus (guaranteed when
    sampled from it): a probe's own occurrences make its d cells
    nonzero, so the emitted-cells join in the SQL mirror sees all d
    rows. No reference counterpart (warcio has no sketches).
    """
    if not 1 <= d <= 4:
        raise ValueError("d must be in 1..4 (md5 gives four 32-bit slices)")
    probe_list = sorted(map(str, probes))
    probe_index = {t: i for i, t in enumerate(probe_list)}

    def tok_cols(tok: str, memo: dict):
        cols = memo.get(tok)
        if cols is None:
            hx = hashlib.md5(tok.encode("utf-8")).hexdigest()
            cols = tuple(int(hx[8 * r:8 * r + 8], 16) % w for r in range(d))
            if len(memo) < 4_000_000:  # bound worker memory
                memo[tok] = cols
        return cols

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        memo = _hash_memo.setdefault(("cms", d, w), {})
        toks: list = []
        for val in batch[value_col]:
            if tokenize:
                toks.extend((val or "").split())
            elif val is not None:
                toks.append(str(val))
        sketch = np.zeros((d, w), dtype=np.int64)
        probe_counts = np.zeros(len(probe_list), dtype=np.int64)
        for tok, c in pd.Series(toks, dtype="object").value_counts().items():
            cols = tok_cols(tok, memo)
            for r in range(d):
                sketch[r, cols[r]] += c
            pi = probe_index.get(tok)
            if pi is not None:
                probe_counts[pi] += c
        rs, cs = np.nonzero(sketch)
        out_r = [rs.astype("int64")]
        out_c = [cs.astype("int64")]
        out_n = [sketch[rs, cs]]
        pnz = np.nonzero(probe_counts)[0]
        if len(pnz):
            # probe true-count partials ride the same shuffle as r = -1
            out_r.append(np.full(len(pnz), -1, dtype="int64"))
            out_c.append(pnz.astype("int64"))
            out_n.append(probe_counts[pnz])
        return pd.DataFrame({"r": np.concatenate(out_r),
                             "col": np.concatenate(out_c),
                             "c": np.concatenate(out_n)})

    from warcio_ray.ops.blocks import tree_aggregate

    # bounded key space (d*w cells + probes) -> vectorized combiner
    # tree, not Ray's per-group sort aggregate (~3ms/group of Python)
    merged = tree_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        ["r", "col"], sums=("c",))  # <= d*w + len(probes) rows

    sketch = np.zeros((d, w), dtype=np.int64)
    true_counts = np.zeros(len(probe_list), dtype=np.int64)
    if len(merged) == 0:  # empty corpus: zero sketch, zero counts
        merged = pd.DataFrame({"r": [], "col": [], "c": []})
    for r, col, c in zip(merged["r"], merged["col"], merged["c"]):
        if r >= 0:
            sketch[int(r), int(col)] = c
        else:
            true_counts[int(col)] = c
    memo: dict = {}
    ests = [min(sketch[r, tok_cols(t, memo)[r]] for r in range(d))
            for t in probe_list]
    return pd.DataFrame({"term": probe_list,
                         "est_count": np.array(ests, dtype="int64"),
                         "true_count": true_counts})


def bloom_bits(ds, value_col: str, m_bits: int = 1 << 18,
               k_hashes: int = 3) -> "np.ndarray":
    """Distributed Bloom-filter BUILD over a string column — the
    crawl URL-seen-set structure as a data op (the frontier's
    counting-bloom sibling in ``frontier/filters.py`` serves the live
    crawl; this one materializes the set-membership sketch from a
    corpus pass). Bit rule (md5, SQL-replayable):

        bit_i(v) = int(md5(f"{v}:{i}")[:8], 16) % m_bits,  i < k

    Returns the SORTED int64 array of set bit indices (<= m_bits,
    bounded driver state). Shape: each batch emits its DISTINCT bit
    indices (map-side dedup), ONE bounded groupby collapses them —
    set-bit union is exactly the duplicate-collapse of a bounded key
    space, no bit-twiddling aggregate needed.
    """
    import hashlib

    from ray.data.aggregate import Count

    from warcio_ray.ops.blocks import arrow_blocks

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[value_col].dropna().astype(str)
        bits = {
            int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:8], 16)
            % m_bits
            for v in vals for i in range(k_hashes)}
        return pd.DataFrame({"bit": sorted(bits)}, dtype="int64")

    agg = arrow_blocks(
        ds.map_batches(fold, batch_format="pandas")) \
        .groupby("bit").aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).to_pandas()
    return np.sort(agg["bit"].to_numpy(dtype="int64")) \
        if len(agg) else np.array([], dtype="int64")


def bloom_probe(bits: "np.ndarray", probes, m_bits: int = 1 << 18,
                k_hashes: int = 3) -> pd.DataFrame:
    """Probe a built Bloom bit set: (probe, maybe_present) — the
    standard no-false-negative / possible-false-positive contract.
    Vectorized searchsorted over the sorted bit array."""
    import hashlib

    rows = []
    for v in probes:
        pos = [int(hashlib.md5(f"{v}:{i}".encode()).hexdigest()[:8],
                   16) % m_bits for i in range(k_hashes)]
        p = np.searchsorted(bits, pos)
        ok = bool(np.all((p < len(bits)) & (bits[np.minimum(
            p, len(bits) - 1)] == pos))) if len(bits) else False
        rows.append((str(v), int(ok)))
    return pd.DataFrame(rows, columns=["probe", "maybe_present"])


def misra_gries_heavy(ds, text_col: str = "text", k: int = 64):
    """Misra-Gries mergeable heavy-hitters (Misra & Gries 1982;
    mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
    every term whose corpus frequency exceeds N/(k+1) tokens, with its
    EXACT count — the frequent-vocabulary miner (stopword discovery,
    boilerplate tokens, tokenizer seed lists) that never shuffles the
    full term space.

    Two passes, both bounded:
      1. each batch folds its tokens into an exact local count table
         and COMPRESSES it to <= k counters (subtract the (k+1)-th
         largest count from all, drop non-positives) — the MG compress;
         a '' sentinel row carries the batch token total. The global
         merge is pointwise addition (one groupby(term).sum over
         <= (k+1) rows per batch) followed by one more compress — by
         the mergeable-summaries theorem every compress removes
         >= (k+1) x (subtracted value) of total weight, so the summed
         decrement is <= N/(k+1) and every term with true count
         > N/(k+1) survives with a positive residual.
      2. the <= k surviving candidates broadcast into an exact recount
         (vectorized isin per batch, groupby sum), and the output
         keeps exactly {term : count x (k+1) > N} — an integer
         inequality, so the result is EXACT and partitioning-invariant
         even though the sketch itself is approximate.

    Scale shape: the exchange is O(k x #batches) rows in pass 1 and
    O(k x #batches) in pass 2, independent of vocabulary size; an
    exact top-frequency scan would shuffle O(vocab) rows. Returns a
    pandas DataFrame (term, n_occ) sorted by count desc, term asc —
    at most k rows by construction.

    No reference counterpart (warcio has no sketches).
    """
    from warcio_ray.ops.blocks import arrow_blocks

    def compress(cts: pd.Series, cap: int) -> pd.Series:
        """MG compress: keep <= cap counters. cts index=term."""
        if len(cts) <= cap:
            return cts
        vals = np.sort(cts.to_numpy(dtype="int64"))[::-1]
        thr = int(vals[cap])  # the (cap+1)-th largest
        out = cts - thr
        return out[out > 0]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].astype("string").fillna("") \
            .str.findall(r"\S+")
        n_tok = int(toks.str.len().sum())
        if n_tok == 0:
            return pd.DataFrame({"term": [""], "cnt": [0]}) \
                .astype({"cnt": "int64"})
        flat = pd.Series(np.concatenate(
            [np.asarray(t, dtype=object) for t in toks]))
        cts = compress(flat.value_counts(), k)
        return pd.DataFrame({
            "term": np.concatenate([cts.index.to_numpy(dtype=object),
                                    np.asarray([""], dtype=object)]),
            "cnt": np.concatenate([cts.to_numpy(dtype="int64"),
                                   np.asarray([n_tok], dtype="int64")]),
        })

    merged = arrow_blocks(
        ds.map_batches(partial, batch_format="pandas")) \
        .groupby("term").sum("cnt").to_pandas()  # O(k x batches) rows
    total = int(merged.loc[merged["term"] == "", "sum(cnt)"].sum())
    summary = merged[merged["term"] != ""].set_index("term")["sum(cnt)"]
    summary = compress(summary.astype("int64"), k)
    cands = sorted(summary.index.tolist())
    if not cands or total == 0:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "n_occ": pd.Series([], dtype="int64")})

    cand_arr = np.asarray(cands, dtype=object)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].astype("string").fillna("") \
            .str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype="int64")
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        flat = pd.Series(np.concatenate(
            [np.asarray(t, dtype=object) for t in toks]))
        cts = flat[flat.isin(cand_arr)].value_counts()
        return pd.DataFrame({"term": cts.index.to_numpy(dtype=object),
                             "cnt": cts.to_numpy(dtype="int64")})

    exact = arrow_blocks(
        ds.map_batches(recount, batch_format="pandas")) \
        .groupby("term").sum("cnt").to_pandas()
    exact = exact.rename(columns={"sum(cnt)": "n_occ"})
    exact["n_occ"] = exact["n_occ"].astype("int64")
    out = exact[exact["n_occ"] * (k + 1) > total]
    return out.sort_values(["n_occ", "term"],
                           ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)


def hll_cube(ds, dim1: str, dim2: str, value_col: str, b: int = 10,
             tokenize: bool = True) -> pd.DataFrame:
    """HyperLogLog CUBE: approximate distinct counts at every rollup
    level of two dimensions — (d1, d2), (d1, *), (*, d2), (*, *) —
    where every coarser level is computed by MERGING the finest
    level's REGISTERS (per-bucket max), never by rescanning. This is
    the property that justifies sketches at 100 TB: one scan builds
    the finest cube; every report slice above it is a register fold
    over O(cells x m) tiny rows.

    Same register definition as ``hll_distinct`` (md5 -> b=10 bucket,
    rho over the 54 low bits), so the SQL oracle replays the cube via
    GROUPING SETS over the same exact-integer registers.

    Returns (dim1, dim2, n_distinct_est) with '*' marking rolled-up
    dimensions."""
    m = 1 << b
    shift = 64 - b
    wmask = (1 << (64 - b)) - 1

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        hmemo = _hash_memo.setdefault(b, {})
        best: dict = {}
        for k1, k2, val in zip(batch[dim1].astype(str),
                               batch[dim2].astype(str),
                               batch[value_col]):
            vals = (val or "").split() if tokenize else [val]
            cell = best.setdefault((k1, k2), {})
            for v in vals:
                br = hmemo.get(v)
                if br is None:
                    h = int(hashlib.md5(
                        str(v).encode("utf-8")).hexdigest()[:16], 16)
                    w = h & wmask
                    br = (h >> shift, (64 - b) - w.bit_length() + 1)
                    if len(hmemo) < 4_000_000:
                        hmemo[v] = br
                bucket, rho = br
                if rho > cell.get(bucket, 0):
                    cell[bucket] = rho
        k1s, k2s, bs, rs = [], [], [], []
        for (k1, k2), cell in best.items():
            for bucket, rho in cell.items():
                k1s.append(k1)
                k2s.append(k2)
                bs.append(bucket)
                rs.append(rho)
        return pd.DataFrame({
            dim1: k1s, dim2: k2s,
            "bucket": np.array(bs, dtype="int64"),
            "rho": np.array(rs, dtype="int64")})

    from warcio_ray.ops.blocks import tree_aggregate

    finest = tree_aggregate(
        ds.map_batches(partials, batch_format="pandas"),
        [dim1, dim2, "bucket"], maxs=("rho",))

    def level(df: pd.DataFrame, keys):
        return df.groupby(keys + ["bucket"], as_index=False) \
            .agg({"rho": "max"})

    rows = []
    for keys, stars in (([dim1, dim2], {}),
                        ([dim1], {dim2: "*"}),
                        ([dim2], {dim1: "*"}),
                        ([], {dim1: "*", dim2: "*"})):
        lv = finest.copy()
        if keys:
            lv = level(lv, keys)
            grouped = lv.groupby(keys, sort=True)
        else:
            lv = lv.groupby("bucket", as_index=False) \
                .agg({"rho": "max"})
            grouped = [((), lv)]
        for gk, grp in grouped:
            regs = np.zeros(m, dtype=np.int64)
            regs[grp["bucket"].to_numpy(dtype="int64")] = \
                grp["rho"].to_numpy(dtype="int64")
            est = hll_estimate_from_registers(regs, b)
            gk = gk if isinstance(gk, tuple) else (gk,)
            named = dict(zip(keys, gk))
            named.update(stars)
            rows.append((named[dim1], named[dim2], est))
    out = pd.DataFrame(rows, columns=[dim1, dim2, "n_distinct_est"])
    return out.sort_values([dim1, dim2]).reset_index(drop=True)


def misra_gries_grouped(ds, group_col: str, text_col: str = "text",
                        k: int = 8):
    """Per-GROUP Misra-Gries heavy hitters: every (group, term) whose
    frequency exceeds that group's N_g/(k+1), with exact counts — the
    per-host frequent-token miner (host-level boilerplate vocabulary,
    per-site template words) under the same mergeable-summary
    guarantee as the corpus-level ``misra_gries_heavy``, with state
    bounded at k counters PER GROUP rather than k overall.

    Same two-pass shape: per-batch per-group MG compress (exchange
    O(G x (k+1)) rows per batch), pointwise merge + final compress
    per group, then a broadcast exact recount of the <= G x k
    candidates and the exact integer gate cnt * (k+1) > N_g. The
    sketch is approximate; the OUTPUT is exact and partitioning-
    invariant. Returns (group, term, n_occ) sorted."""
    import ray

    from warcio_ray.ops.blocks import arrow_blocks

    def compress(cts: pd.Series, cap: int) -> pd.Series:
        if len(cts) <= cap:
            return cts
        vals = np.sort(cts.to_numpy(dtype="int64"))[::-1]
        thr = int(vals[cap])
        out = cts - thr
        return out[out > 0]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        gs, ts, cs = [], [], []
        for g, grp in batch.groupby(group_col, sort=False):
            toks = grp[text_col].astype("string").fillna("") \
                .str.findall(r"\S+")
            n_tok = int(toks.str.len().sum())
            if n_tok:
                flat = pd.Series(np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks]))
                cts = compress(flat.value_counts(), k)
                gs.extend([g] * len(cts))
                ts.extend(cts.index.tolist())
                cs.extend(cts.to_numpy(dtype="int64").tolist())
            gs.append(g)
            ts.append("")
            cs.append(n_tok)
        return pd.DataFrame({group_col: gs, "term": ts,
                             "cnt": np.array(cs, dtype="int64")})

    merged = arrow_blocks(ds.map_batches(partial, batch_format="pandas")) \
        .groupby([group_col, "term"]).sum("cnt").to_pandas() \
        .rename(columns={"sum(cnt)": "cnt"})
    totals = merged[merged["term"] == ""] \
        .set_index(group_col)["cnt"].astype("int64").to_dict()
    cands: dict = {}
    for g, grp in merged[merged["term"] != ""].groupby(group_col):
        s = compress(grp.set_index("term")["cnt"].astype("int64"), k)
        if len(s):
            cands[g] = frozenset(s.index)
    if not cands:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "term": pd.Series(dtype=object),
                             "n_occ": pd.Series(dtype="int64")})
    cref = ray.put(cands)

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cref)
        gs, ts, cs = [], [], []
        for g, grp in batch.groupby(group_col, sort=False):
            want = cmap.get(g)
            if not want:
                continue
            toks = grp[text_col].astype("string").fillna("") \
                .str.findall(r"\S+")
            lens = toks.str.len().to_numpy(dtype="int64")
            if lens.sum() == 0:
                continue
            flat = pd.Series(np.concatenate(
                [np.asarray(t, dtype=object) for t in toks]))
            cts = flat[flat.isin(list(want))].value_counts()
            gs.extend([g] * len(cts))
            ts.extend(cts.index.tolist())
            cs.extend(cts.to_numpy(dtype="int64").tolist())
        return pd.DataFrame({group_col: gs, "term": ts,
                             "cnt": np.array(cs, dtype="int64")})

    exact = arrow_blocks(ds.map_batches(recount, batch_format="pandas")) \
        .groupby([group_col, "term"]).sum("cnt").to_pandas() \
        .rename(columns={"sum(cnt)": "cnt"})
    keep = [(g, t, int(c)) for g, t, c in exact.itertuples(index=False)
            if int(c) * (k + 1) > totals.get(g, 0)]
    return pd.DataFrame(keep, columns=[group_col, "term", "n_occ"]) \
        .sort_values([group_col, "term"]).reset_index(drop=True) \
        .astype({"n_occ": "int64"})


def _hyperball_machine(edges_ds, b: int, num_partitions):
    """Shared HyperBall state builder: fold the input to distinct
    undirected pairs, emit both directions, seed one md5 HLL register
    row per node, and return (dir_edges, regs0, grow, add_part) where
    ``grow`` advances the counters one hop (edges⋈registers hash join
    + (node, bucket) groupby-max) and ``add_part`` stamps the key-hash
    partition column for per-node sweeps."""
    import hashlib

    import ray
    from ray.data.aggregate import Count, Max

    from warcio_ray.ops.blocks import arrow_blocks, safe_join

    shift = 64 - b
    wmask = (1 << shift) - 1

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[["src", "dst"]].dropna().astype("int64")
        df = df[df["src"] != df["dst"]]
        out = pd.DataFrame({"lo": np.minimum(df["src"], df["dst"]),
                            "hi": np.maximum(df["src"], df["dst"])})
        return out.drop_duplicates()

    und = arrow_blocks(edges_ds.map_batches(fold, batch_format="pandas")) \
        .groupby(["lo", "hi"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]).materialize()
    if num_partitions is None:
        # size to data as well as CPUs (ops/graph._data_partitions):
        # toy inputs must not fan into 32 near-empty partitions
        from warcio_ray.ops.graph import _data_partitions
        num_partitions = _data_partitions(und.count())

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        return pd.DataFrame({"a": np.concatenate([lo, hi]),
                             "b": np.concatenate([hi, lo])})

    dir_edges = und.map_batches(both_dirs,
                                batch_format="pandas").materialize()

    def init_regs(batch: pd.DataFrame) -> pd.DataFrame:
        lo = batch["lo"].to_numpy(dtype="int64")
        hi = batch["hi"].to_numpy(dtype="int64")
        nodes = np.unique(np.concatenate([lo, hi]))
        bks = np.empty(len(nodes), dtype="int64")
        rhs = np.empty(len(nodes), dtype="int64")
        for i, node in enumerate(nodes):
            h = int(hashlib.md5(str(int(node)).encode()).hexdigest()[:16],
                    16)
            w = h & wmask
            bks[i] = h >> shift
            rhs[i] = shift - w.bit_length() + 1
        return pd.DataFrame({"node": nodes, "bucket": bks, "rho": rhs})

    regs0 = arrow_blocks(und.map_batches(init_regs,
                                         batch_format="pandas")) \
        .groupby(["node", "bucket"]).aggregate(Max("rho",
                                                   alias_name="rho")) \
        .materialize()

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = batch["node"].to_numpy().astype(np.uint64, copy=False)
        batch["_part"] = (h % np.uint64(num_partitions)).astype("int32")
        return batch

    def grow(regs):
        j = safe_join(dir_edges, regs, "inner", num_partitions,
                      ("b",), right_on=("node",))

        def nbr_regs(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": batch["a"].to_numpy(dtype="int64"),
                "bucket": batch["bucket"].to_numpy(dtype="int64"),
                "rho": batch["rho"].to_numpy(dtype="int64")})

        return arrow_blocks(
            regs.union(j.map_batches(nbr_regs, batch_format="pandas"))) \
            .groupby(["node", "bucket"]) \
            .aggregate(Max("rho", alias_name="rho")).materialize()

    return dir_edges, regs0, grow, add_part


def hyperball(edges_ds, rounds: int = 3, b: int = 4,
              scale: int = 1 << 20, num_partitions=None) -> pd.DataFrame:
    """HyperBall neighborhood function (Boldi & Vigna 2013, "In-Core
    Computation of Geometric Centralities with HyperBall"): one HLL
    counter per node, grown one hop per round by register-max merges
    over the undirected neighborhood — THE web-graph way to estimate
    how many pages sit within t clicks without any all-pairs BFS.
    N(t) = sum over nodes of the estimated ball size |B_t(u)|.

    Determinism contract: registers use the repo's md5 HLL convention
    (``hll_distinct``: bucket = top b bits, rho over the low 64-b
    bits), the per-node estimate is ``hll_estimate_from_registers``
    (exact-integer harmonic denominator; libm-ln linear-counting
    branch per the repo's ln precedent), and each per-node estimate
    quantizes to ``floor(est * scale + 0.5)`` BEFORE the corpus sum —
    so N(t) is an exact int64, partitioning-invariant, and the SQL
    oracle replays it round for round.

    Scale shape: register state is a (node, bucket, rho) Dataset
    (<= m rows per node, m = 2^b = 16 by default); each round is ONE
    edges⋈registers hash join + ONE (node, bucket) groupby-max (the
    pagerank join-path idiom — no node-sized driver state); each
    measurement is ONE key-hash partition sweep emitting a single
    exact partial sum per partition. Register rows, not payloads,
    are all that ever shuffles.

    Returns a DataFrame (t, sum_ball_q) for t = 0..rounds."""
    import math

    import ray

    m = 1 << b
    _dir, regs, grow, add_part = _hyperball_machine(edges_ds, b,
                                                    num_partitions)

    def est_sweep(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns=["_part"])
        total = 0
        for _node, grp in part.groupby("node", sort=False):
            dense = np.zeros(m, dtype=np.int64)
            dense[grp["bucket"].to_numpy(dtype="int64")] = \
                grp["rho"].to_numpy(dtype="int64")
            est = hll_estimate_from_registers(dense, b)
            total += int(math.floor(est * scale + 0.5))
        return pd.DataFrame({"q": np.array([total], dtype="int64")})

    def measure(cur) -> int:
        parts = cur.map_batches(add_part, batch_format="pandas") \
            .groupby("_part") \
            .map_groups(est_sweep, batch_format="pandas").to_pandas()
        return int(parts["q"].sum())

    out_rows = [(0, measure(regs))]
    for t in range(1, rounds + 1):
        regs = grow(regs)
        out_rows.append((t, measure(regs)))

    return pd.DataFrame(out_rows, columns=["t", "sum_ball_q"]) \
        .astype("int64")


def hyperball_harmonic(edges_ds, rounds: int = 3, b: int = 4,
                       scale: int = 1 << 20, k: int = 20,
                       num_partitions=None) -> pd.DataFrame:
    """Harmonic centrality via HyperBall — the paper's actual payload
    (Boldi & Vigna 2013): H(u) = sum over distances t of
    (|B_t(u)| - |B_{t-1}(u)|) / t, i.e. every reachable page weighted
    by 1/distance, estimated from the same per-node HLL counters with
    NO all-pairs BFS. The top-k central pages are the crawl's natural
    hub shortlist.

    Exact-integer contract: per-node ball estimates quantize at
    ``scale`` per round (the hyperball convention); the 1/t weights
    become EXACT integers by multiplying through with
    L = lcm(1..rounds), and the telescoped per-round coefficients
    (coef_t = L/t - L/(t+1), coef_rounds = L/rounds, coef_0 = -L) make
    H_num(u) = L * H(u) * scale one integer sum per node — bit-stable
    at any partitioning and replayable by the generated SQL chain.

    Scale shape: identical to ``hyperball`` (register Dataset, one
    join + one groupby-max per round) plus one per-node quantize sweep
    per round; the final top-k is a per-partition top-k merge, never a
    global sort. Returns (node, h_num) — the k highest, ties by node
    asc."""
    import math

    import ray

    m = 1 << b
    _dir, regs, grow, add_part = _hyperball_machine(edges_ds, b,
                                                    num_partitions)

    L = math.lcm(*range(1, rounds + 1))
    # H_num = sum_t coef_t * q_t with w_t = L//t (w_{rounds+1} = 0):
    # telescoping sum_t>=1 w_t (q_t - q_{t-1})
    coefs = {0: -(L // 1)}
    for t in range(1, rounds + 1):
        coefs[t] = (L // t) - (L // (t + 1) if t < rounds else 0)

    def q_sweep(coef):
        def sweep(part: pd.DataFrame) -> pd.DataFrame:
            part = part.drop(columns=["_part"])
            nodes_out, hq = [], []
            for node, grp in part.groupby("node", sort=False):
                dense = np.zeros(m, dtype=np.int64)
                dense[grp["bucket"].to_numpy(dtype="int64")] = \
                    grp["rho"].to_numpy(dtype="int64")
                est = hll_estimate_from_registers(dense, b)
                nodes_out.append(node)
                hq.append(coef * int(math.floor(est * scale + 0.5)))
            return pd.DataFrame({
                "node": np.array(nodes_out, dtype="int64"),
                "hq": np.array(hq, dtype="int64")})
        return sweep

    contribs = []
    for t in range(rounds + 1):
        if t > 0:
            regs = grow(regs)
        contribs.append(
            regs.map_batches(add_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(q_sweep(coefs[t]), batch_format="pandas")
            .materialize())

    acc = contribs[0]
    for c in contribs[1:]:
        acc = acc.union(c)

    from ray.data.aggregate import Sum

    from warcio_ray.ops.blocks import arrow_blocks

    h = arrow_blocks(acc).groupby("node") \
        .aggregate(Sum("hq", alias_name="h_num"))

    def topk_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["h_num", "node"],
                                ascending=[False, True],
                                kind="mergesort")
        return part.head(k)[["node", "h_num"]]

    parts = h.map_batches(add_part, batch_format="pandas") \
        .groupby("_part") \
        .map_groups(topk_part, batch_format="pandas").to_pandas()
    out = parts.sort_values(["h_num", "node"],
                            ascending=[False, True],
                            kind="mergesort").head(k)
    return out.reset_index(drop=True).astype("int64")


def effective_diameter(edges_ds, rounds: int = 3, b: int = 4,
                       scale: int = 1 << 20, pct: int = 90,
                       num_partitions=None) -> pd.DataFrame:
    """Effective diameter from the HyperBall neighborhood function —
    the famous "how many clicks across the web" scalar (Broder 2000 /
    Boldi-Vigna): the interpolated distance d at which N(d) reaches
    ``pct``% of N(rounds), with N(t) the exact quantized HyperBall
    curve from ``hyperball``.

    Exact-rational interpolation: with t the first round where
    100*N(t) >= pct*N_max, the fractional part is
    (pct*N_max - 100*N(t-1)) / (100*(N(t) - N(t-1))) — kept as the
    integer pair (d_num, d_den) with d_eff = d_num/d_den, so the
    result is bit-stable and SQL-replayable; the convenience float is
    round(d_num/d_den, 6). Flat curves (N(t) == N(t-1) at the
    crossing, only possible when the threshold was already met at
    t-1) cannot occur by minimality of t.

    Returns ONE row (t_hi, d_num, d_den, d_eff)."""
    nf = hyperball(edges_ds, rounds=rounds, b=b, scale=scale,
                   num_partitions=num_partitions)
    ns = nf["sum_ball_q"].tolist()
    n_max = int(ns[-1])
    t_hi = next(t for t, n in enumerate(ns) if 100 * int(n)
                >= pct * n_max)
    if t_hi == 0:
        d_num, d_den = 0, 1
    else:
        prev, cur = int(ns[t_hi - 1]), int(ns[t_hi])
        d_den = 100 * (cur - prev)
        d_num = (t_hi - 1) * d_den + (pct * n_max - 100 * prev)
    return pd.DataFrame([{
        "t_hi": t_hi, "d_num": d_num, "d_den": d_den,
        "d_eff": round(d_num / d_den, 6)}]) \
        .astype({"t_hi": "int64", "d_num": "int64", "d_den": "int64"})
