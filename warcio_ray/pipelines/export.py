"""Training-shard export flagship: the LAST mile of a pretraining data
pipeline, composed end to end from stages already proven alone —

    quality filter (Gopher-style signals, pretrain.quality_filter)
      -> exact dedup (md5 winner + hash-join semi-filter)
      -> deterministic global shuffle (shuffle_order prefix-sum rank)
      -> concat-and-chop sequence packing IN SHUFFLE ORDER
         (pack_sequences over the rank key)

The output is the GPT-style segment table a tokenizer-sharder consumes:
one row per (doc, bin) span, with bins numbered over the shuffled
stream so consecutive bins mix sources instead of replaying crawl
order.  Every stage is the scale-safe shape: vectorized batch filters,
primitive-column hash joins (never a driver keep-set), O(2^bits) rank
state, integer prefix sums — nothing doc-sized is ever collected.

The whole chain is hard-oracle checkable (export_packed in
__ray_entry__): filter WHERE-clause -> min-id dedup -> row_number
shuffle rank -> window cumsum packing, one SQL statement.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["export_packed", "export_bpe_packed"]


def export_packed(ds, window: int = 256, num_partitions: int = 8,
                  bpe_merges: "pd.DataFrame" = None):
    """documents (doc_id, text) -> one row per packed segment:
    (doc_id, shuffle_rank, bin_id, doc_off, bin_off, n_tok).

    With ``bpe_merges`` (a trained merge table from
    ``ops.bpe.train_bpe``) the packed counts are BPE token counts —
    the stateless encode scan replaces the whitespace count pass; the
    rest of the chain is identical."""
    import functools

    from warcio_ray.ops.blocks import safe_join
    from warcio_ray.ops.pack import pack_sequences
    from warcio_ray.ops.textstats import shuffle_order
    from warcio_ray.pipelines.pretrain import (exact_dedup_filter,
                                               quality_filter)

    clean = exact_dedup_filter(quality_filter(ds),
                               num_partitions=num_partitions) \
        .materialize()  # consumed twice: rank pass + packing join
    ranks = shuffle_order(clean.select_columns(["doc_id"]))

    # pack over the rank key: pack_sequences packs in ascending id
    # order, so re-keying doc_id := shuffle_rank packs the shuffled
    # stream (ranks are dense 0..n-1 -> bucket prefix sums stay exact)
    keyed = safe_join(clean, ranks, join_type="inner",
                      num_partitions=num_partitions, on=("doc_id",))

    def rekey(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["shuffle_rank"].astype("int64"),
            "text": batch["text"]})

    rekeyed = keyed.map_batches(rekey, batch_format="pandas")
    if bpe_merges is not None:
        from warcio_ray.ops.bpe import encode_bpe_batch

        def as_counts(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": batch["doc_id"].astype("int64"),
                "n": batch["n_bpe_tokens"].astype("int64")})

        counts = rekeyed.map_batches(
            functools.partial(encode_bpe_batch, merges_df=bpe_merges),
            batch_format="pandas") \
            .map_batches(as_counts, batch_format="pandas")
        packed = pack_sequences(counts, window=window, precounted=True)
    else:
        packed = pack_sequences(rekeyed, window=window)

    def as_rank(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.rename(columns={"doc_id": "shuffle_rank"})
        return batch

    segs = safe_join(
        packed.map_batches(as_rank, batch_format="pandas"),
        ranks, join_type="inner", num_partitions=num_partitions,
        on=("shuffle_rank",))
    cols = ["doc_id", "shuffle_rank", "bin_id", "doc_off", "bin_off",
            "n_tok"]

    def order_cols(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch.columns) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        return batch[cols].astype("int64")

    return segs.map_batches(order_cols, batch_format="pandas")


def export_bpe_packed(ds, window: int = 256, n_merges: int = 30,
                      num_partitions: int = 8):
    """The export flagship packing REAL tokenizer output end to end:
    BPE train (full corpus) -> quality -> exact dedup -> deterministic
    shuffle -> pack BPE token counts. The merge table is the only
    model state (O(n_merges) rows, broadcast in the encode closure);
    everything else is export_packed's scale shape unchanged.

    Hard-oracled end to end: the SQL replays BPE training as a
    generated merge-round CTE chain (see __ray_entry__._bpe_sql_ctes)
    and the packing arithmetic as integer window sums."""
    from warcio_ray.ops.bpe import train_bpe

    merges = train_bpe(ds.select_columns(["text"]), n_merges=n_merges)
    return export_packed(ds, window=window,
                         num_partitions=num_partitions,
                         bpe_merges=merges)
