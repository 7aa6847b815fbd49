"""Check pipeline: digest-verify every record of every archive
(the reference's ``warcio check`` CLI, checker.py:15-71).

Dataset shape: read_warc(check_digests=True) already computes the
tri-state verdict per record in the parse task, so checking is a
vectorized filter + tiny aggregate — no payload bytes move past the
parse stage.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from warcio_ray.codec.records import ParseOptions
from warcio_ray.sources.warc import read_warc


def _failures_only(batch: pa.Table) -> pa.Table:
    keep = pc.or_kleene(
        pc.equal(batch["digest_passed"], pa.scalar(False)),
        pc.is_valid(batch["parse_error"]))
    out = batch.filter(pc.fill_null(keep, False))
    return out.select(["filename", "offset", "rec_type", "url",
                       "digest_problems", "parse_error"])


def check_dataset(paths, **read_kwargs):
    """Dataset of failure rows (empty == all digests pass).

    compute_digests=False: verification sha1s run inside the codec; the
    separate dedup-key digest columns would hash every payload a second
    time for nothing."""
    ds = read_warc(paths, parse_options=ParseOptions(check_digests=True),
                   compute_digests=False, **read_kwargs)
    return ds.map_batches(_failures_only, batch_format="pyarrow")


def check(paths, **read_kwargs) -> dict:
    """Aggregate verdict: exit_value (0/1) + failure rows (small)."""
    failures = check_dataset(paths, **read_kwargs).to_pandas()
    return {"exit_value": int(len(failures) > 0),
            "failures": failures}
