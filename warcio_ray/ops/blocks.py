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


def drop_empty_blocks(ds):
    """Dataset -> Dataset with zero-row blocks removed (zero-copy).

    Use on BOTH inputs of a ``Dataset.join`` whose upstream contains a
    groupby/aggregate/filter that may emit empty blocks. A fully-empty
    dataset is returned materialized as-is (callers handle emptiness
    explicitly)."""
    import pandas as pd
    import ray
    import ray.data

    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if (meta.num_rows or 0) > 0:
                refs.append(ref)
    if not refs:
        return mat
    # blocks of one materialized dataset share a type; sniff the first
    first = ray.get(refs[0])
    if isinstance(first, pd.DataFrame):
        return ray.data.from_pandas_refs(refs)
    return ray.data.from_arrow_refs(refs)


def safe_join(left, right, join_type: str, num_partitions: int,
              on, right_on=None):
    """``Dataset.join`` with both inputs sanitized through
    ``drop_empty_blocks`` — use instead of a bare join whenever either
    side descends from a groupby/aggregate/filter/map_groups (i.e.
    almost always). Encodes the zero-schema empty-block pitfall once."""
    return drop_empty_blocks(left).join(
        drop_empty_blocks(right), join_type=join_type,
        num_partitions=num_partitions, on=on, right_on=right_on)
