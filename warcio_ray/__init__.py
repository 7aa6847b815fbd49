"""warcio_ray — a Ray-Data-native web-archive ingest + crawl-frontier engine.

Re-implements the record semantics of webrecorder/warcio (the reference at
/root/reference) on top of ``ray.data.Dataset`` pipelines over zero-copy
Arrow batches, and adds a deterministic sharded crawl frontier plus the
large-scale training-data operators (dedup, similarity search, text
analysis) a 100 TB pipeline needs.

Layout:
  codec/     pure-Python WARC/ARC record codec (no Ray) — parse, build,
             serialize, digest; byte-compatible with warcio 1.8.1
  sources/   Ray Data datasources (WARC splitter over .warc/.warc.gz files)
  sinks/     Ray Data datasinks (per-shard .warc.gz writer)
  stages/    stateless map_batches transforms (parse, extract, links, surt)
  frontier/  URL-seen set (counting bloom + cuckoo), politeness, priority,
             single-node reference crawl + distributed actor-pool crawl
  ops/       dedup / knn / text-stats / multimodal / relational operators
  pipelines/ end-to-end pipelines (index, check, recompress, crawl)
"""

__version__ = "0.1.0"
