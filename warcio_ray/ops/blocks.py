"""Block-level sanitation for Ray Data 2.49 join inputs.

Ray's hash-shuffle join builds each partition from the shards it
receives; a zero-schema EMPTY block (the natural output of a map_groups
/ aggregate / filter branch that produced no rows) is forwarded to every
partition and poisons the ArrowBlockBuilder — `pa.Table.join` then fails
with "No match ... for key field reference" nondeterministically,
depending on which partitions also received real rows. No map-based
normalization can fix this: the streaming executor BYPASSES empty blocks
around map_batches entirely (verified: the map fn is never called).

``drop_empty_blocks`` is the airtight cure: materialize, then re-wrap
ONLY the non-empty block refs (zero-copy — blocks stay in the object
store; only driver-side metadata is touched). Every non-empty block
carries its schema, so joins downstream always see key columns.
"""

from __future__ import annotations

# Logical operators that can NOT introduce zero-schema empty blocks:
# reads and from_* stamp a schema on every block (including empty
# files), map_batches/project outputs carry their table's columns, and
# union only forwards its inputs' blocks. Everything else — filter,
# aggregate, sort/map_groups, repartition, limit, join — has produced
# schema-less empties in this Ray version and must be sanitized.
_EMPTY_SAFE_OPS = frozenset({
    "Read", "MapBatches", "Project", "Union",
    "FromPandas", "FromArrow", "FromNumpy", "FromItems",
})


def _may_emit_empty_blocks(ds) -> bool:
    """Walk the logical plan: False only when EVERY operator in the
    lineage is in the empty-safe set (then the materialize barrier in
    ``drop_empty_blocks`` can be skipped). Unknown plans or Ray
    internals changes degrade to True (sanitize)."""
    try:
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if type(op).__name__ not in _EMPTY_SAFE_OPS:
                return True
            stack.extend(op.input_dependencies)
        return False
    except Exception:
        return True


def drop_empty_blocks(ds):
    """Dataset -> Dataset with zero-row blocks removed (zero-copy).

    Use on BOTH inputs of a ``Dataset.join`` whose upstream contains a
    groupby/aggregate/filter that may emit empty blocks. A fully-empty
    dataset is returned materialized as-is (callers handle emptiness
    explicitly).

    GATED (round 4): when the lineage is provably empty-safe (reads,
    map_batches, project, union only — see ``_may_emit_empty_blocks``)
    the dataset is returned UNTOUCHED, skipping the materialize
    barrier so the join's shuffle pipelines with its input's
    computation. The barrier only remains where the hazard exists; an
    already-materialized input costs one metadata scan either way."""
    if not _may_emit_empty_blocks(ds):
        return ds
    import pandas as pd
    import ray
    import ray.data

    import pyarrow as pa

    mat = ds.materialize()
    refs = []
    first_schema = None
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                refs.append(ref)
                if first_schema is None:
                    first_schema = bundle.schema
    if not refs:
        return mat
    # blocks of one materialized dataset share a type; the bundle
    # metadata schema (already driver-side) tells pandas from arrow —
    # never ray.get a whole data block just to sniff its type
    if isinstance(first_schema, pa.Schema):
        return ray.data.from_arrow_refs(refs)
    if first_schema is not None:
        return ray.data.from_pandas_refs(refs)
    first = ray.get(refs[0])  # schema metadata missing: sniff one block
    if isinstance(first, pd.DataFrame):
        return ray.data.from_pandas_refs(refs)
    return ray.data.from_arrow_refs(refs)


def safe_join(left, right, join_type: str, num_partitions: int,
              on, right_on=None):
    """``Dataset.join`` with both inputs sanitized through
    ``drop_empty_blocks`` — use instead of a bare join whenever either
    side descends from a groupby/aggregate/filter/map_groups (i.e.
    almost always). Encodes the zero-schema empty-block pitfall once.

    A FULLY-empty side cannot be sanitized (no block carries a schema),
    so those cases short-circuit semantically instead of joining:
    empty right + anti/left_outer keeps the left; any other empty side
    yields ``left.limit(0)`` (note: left schema only — callers that
    need the joined schema must stamp it, which every caller in this
    repo already does after a join).

    Sides whose lineage is empty-safe pass through unsanitized (and
    unmaterialized — no count() either, which would force execution):
    their blocks always carry schemas, so both the poison and the
    fully-empty-side hazard are absent by construction."""
    clean_left = drop_empty_blocks(left)
    clean_right = drop_empty_blocks(right)
    # count() only on sanitized (already-materialized) sides: free
    # there, a full pipeline execution on a gated side
    if clean_left is not left and clean_left.count() == 0:
        return clean_left.limit(0)
    if clean_right is not right and clean_right.count() == 0:
        if join_type in ("left_anti", "left_outer"):
            return clean_left
        return clean_left.limit(0)
    return clean_left.join(
        clean_right, join_type=join_type,
        num_partitions=num_partitions, on=on, right_on=right_on)


def guarded_to_pandas(ds, op_name: str, ds_variant: str,
                      max_rows: int = 5_000_000):
    """Collect a Dataset to a driver DataFrame with a size guard —
    the shared gate for every driver-convenience wrapper that has a
    scale-safe Dataset sibling. Nothing stops a caller pointing a
    convenience wrapper at a 100 TB corpus; this does: above
    ``max_rows`` it raises and names the ``_ds`` variant to use
    instead (pass ``max_rows=None`` to bypass deliberately). The
    input is materialized once, so the count is a metadata read and
    the collect does not recompute."""
    mat = ds.materialize()
    if max_rows is not None:
        n = mat.count()
        if n > max_rows:
            raise ValueError(
                f"{op_name}: result has {n:,} rows (> {max_rows:,}) — "
                f"this driver-side convenience wrapper is for small "
                f"results; use {ds_variant} and keep it distributed, "
                f"or pass max_rows=None to collect anyway")
    return mat.to_pandas()


def tree_aggregate(ds, key_cols, sums=(), maxs=(), fanout: int = 32):
    """Vectorized combiner-tree replacement for
    ``groupby(keys).aggregate(...)`` when the group key space is
    BOUNDED (sketch registers, histogram cells, matrix cells): Ray's
    sort-based aggregate falls into per-ROW Python for PANDAS blocks
    (root cause isolated after this helper landed — see
    ``arrow_blocks`` below; 13 s CPU for 20k pandas rows in one task),
    while a pandas groupby folds the same block in milliseconds. For
    bounded key spaces this tree also keeps the final merge off the
    shuffle entirely; for unbounded keys use ``arrow_blocks`` + the
    real ``groupby().aggregate()``.

    Shape: per-block pandas fold (each block collapses to <= #groups
    rows) -> repartition(fanout) -> second per-block fold -> driver
    fold over <= fanout * #groups rows. All aggs must be associative
    (sum / max over exact values keeps results partitioning-invariant).
    Returns a pandas DataFrame, unsorted — callers order.

    Only for bounded key spaces: an UNBOUNDED key (doc_id, token)
    would make every fold O(distinct keys) driver-side — use the real
    ``groupby().aggregate()`` there.
    """
    import pandas as pd

    key_cols = list(key_cols)
    agg_map = {c: "sum" for c in sums}
    agg_map.update({c: "max" for c in maxs})

    def fold_df(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: Ray's aggregate keeps null group keys; a
        # drop-in replacement must too
        return df.groupby(key_cols, sort=False, as_index=False,
                          dropna=False).agg(agg_map)

    folded = ds.map_batches(fold_df, batch_format="pandas",
                            batch_size=None) \
        .repartition(fanout) \
        .map_batches(fold_df, batch_format="pandas", batch_size=None)
    out = folded.to_pandas()
    if len(out) == 0:
        return out
    return fold_df(out)


def arrow_blocks(ds):
    """Re-encode blocks as Arrow IMMEDIATELY before a
    ``groupby().aggregate(...)``: Ray 2.49's sort-based aggregate has a
    vectorized path for Arrow blocks but falls into per-ROW Python for
    pandas blocks (measured on 100k rows / 4k int groups: 19.8 s from
    pandas-emitting map_batches vs 1.5 s after this identity
    conversion — 13x). map_groups does NOT have the pathology (its
    per-group fn dominates either way); only aggregate call sites need
    this. The conversion itself is C-speed columnar and per-block
    (batch_size=None), so it adds no rebatching."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow",
                          batch_size=None)
