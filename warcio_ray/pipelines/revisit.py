"""Payload-digest dedup -> revisit records (the reference's dedup
primitive, recordbuilder.py:62-80 + README.rst:259-273 filter_func).

Semantics: within a warc_records dataset, the FIRST record per payload
digest (by (warc_date, url) order — deterministic) stays a full response;
every later duplicate becomes a ``revisit`` record carrying
WARC-Profile + WARC-Refers-To-Target-URI/Date + the shared payload
digest, exactly the records warcio's capture filter_func writes.

Shuffle shape: only (digest, url, date) key rows move through the
groupby; payloads stay put — duplicates are rewritten by a second pass
that streams the full table and looks up the winner set broadcast via
ray.put (duplicate groups are a small fraction of a web corpus).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
import pyarrow as pa

from warcio_ray.codec.build import build_revisit, default_warc_id
from warcio_ray.codec.timeutil import datetime_to_iso_date


def find_revisit_targets(ds) -> pd.DataFrame:
    """warc_records dataset -> one row per duplicated digest:
    (payload_digest, refers_to_uri, refers_to_date). Winner = first by
    (warc_date, url, offset)."""

    def keys_only(batch: pa.Table) -> pa.Table:
        return batch.select(["payload_digest", "url", "warc_date",
                             "offset", "rec_type"]).filter(
            pa.compute.equal(batch["rec_type"], "response"))

    def pick_winner(grp: pd.DataFrame) -> pd.DataFrame:
        if len(grp) < 2:
            return grp.head(0)[["payload_digest", "url", "warc_date"]] \
                .rename(columns={"url": "refers_to_uri",
                                 "warc_date": "refers_to_date"})
        grp = grp.sort_values(["warc_date", "url", "offset"],
                              kind="mergesort")
        first = grp.iloc[0]
        return pd.DataFrame([{
            "payload_digest": first["payload_digest"],
            "refers_to_uri": first["url"],
            "refers_to_date": first["warc_date"],
        }])

    return ds.map_batches(keys_only, batch_format="pyarrow") \
        .groupby("payload_digest") \
        .map_groups(pick_winner, batch_format="pandas") \
        .to_pandas()


def rewrite_duplicates_as_revisits(
        ds, id_fn: Callable[[], str] = default_warc_id):
    """Second pass: stream the full table; responses whose digest has an
    earlier winner (and which are not the winner) become revisit rows.

    Returns a dataset in the same T2 schema with duplicates rewritten.
    """
    import ray

    from warcio_ray.sinks.warc import row_to_record
    from warcio_ray.sources.warc import records_to_table

    targets = find_revisit_targets(ds)
    lookup = {row.payload_digest: (row.refers_to_uri, row.refers_to_date)
              for row in targets.itertuples(index=False)}
    lookup_ref = ray.put(lookup)

    def rewrite(batch: pa.Table) -> pa.Table:
        winners = ray.get(lookup_ref)
        records = []
        filenames = []
        for row in batch.to_pylist():
            digest = row.get("payload_digest")
            target = winners.get(digest) if row.get("rec_type") == "response" \
                else None
            if target is None or (row.get("url"), row.get("warc_date")) == target:
                records.append(row_to_record(row))
            else:
                uri, date = target
                date_str = datetime_to_iso_date(date) if date is not None else ""
                rec = build_revisit(
                    row.get("url") or "", digest, uri, date_str,
                    id_fn=id_fn,
                    date_fn=lambda m, d=row.get("warc_date"): (
                        datetime_to_iso_date(d) if d is not None
                        else "1970-01-01T00:00:00Z"))
                # revisit rows keep the byte provenance of the record
                # they replace
                rec.offset = row.get("offset") or 0
                rec.record_length = row.get("length") or 0
                records.append(rec)
            # batches can coalesce blocks from different files: carry the
            # filename per ROW, never stamp the batch with the first one
            filenames.append(row.get("filename") or "")
        return records_to_table(records, "", filenames=filenames)

    return ds.map_batches(rewrite, batch_format="pyarrow")
