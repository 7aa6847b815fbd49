"""CLI mirroring the reference's ``warcio`` commands (cli.py:19-92) on
top of the Ray pipelines: index, check, recompress, extract.

Usage: python -m warcio_ray.cli <command> [args]
(This is the only module besides bench.py allowed to own a Ray session.)
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_RAY = False


def _ray_session():
    global _OWNS_RAY
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        _OWNS_RAY = True
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_index(args) -> int:
    from warcio_ray.pipelines.index import index_dataset

    ray = _ray_session()
    import ray.data
    fields = args.fields.split(",")
    # stream batches straight to the sink (the reference emits a per-file
    # NDJSON stream; driver-side sort of the whole index would not scale).
    # preserve_order keeps blocks in input-path + in-file offset order.
    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds = index_dataset(args.inputs, fields)
        out = sys.stdout if args.output == "-" else open(args.output, "w")
        try:
            for batch in ds.iter_batches(batch_size=1024,
                                         batch_format="pyarrow"):
                for row in batch.to_pylist():
                    clean = {k: v for k, v in row.items() if v is not None}
                    out.write(json.dumps(clean) + "\n")
        finally:
            if out is not sys.stdout:
                out.close()
    finally:
        ctx.execution_options.preserve_order = prev
    return 0


def cmd_check(args) -> int:
    from warcio_ray.pipelines.check import check

    _ray_session()
    result = check(args.inputs)
    for row in result["failures"].itertuples(index=False):
        print(row.filename)
        print(" ", "offset", row.offset, row.rec_type or "")
        problems = row.digest_problems
        for problem in (list(problems) if problems is not None else []):
            print("   ", problem)
        if row.parse_error:
            print("   ", "saw exception:", row.parse_error)
    return result["exit_value"]


def cmd_recompress(args) -> int:
    from warcio_ray.pipelines.recompress import recompress

    _ray_session()
    stats = recompress(args.inputs, args.output)
    print(f"{stats['records']} records read and recompressed to: "
          f"{stats['out_dir']}")
    return 0


def cmd_extract(args) -> int:
    from warcio_ray.codec.headers import EndOfData
    from warcio_ray.codec.records import ArchiveFormatError
    from warcio_ray.pipelines.extract import extract_bytes

    try:
        blob = extract_bytes(args.filename, int(args.offset),
                             payload_only=args.payload,
                             headers_only=args.headers)
    except (ArchiveFormatError, EndOfData, OSError) as e:
        print(f"error: no record found at offset {args.offset} in "
              f"{args.filename}: {str(e)[:120]}", file=sys.stderr)
        return 1
    sys.stdout.buffer.write(blob)
    return 0


def cmd_wet(args) -> int:
    from warcio_ray.pipelines.wet import wet_export

    _ray_session()
    paths = wet_export(args.inputs, args.output, gzip=not args.no_gzip)
    print(f"wrote {len(paths)} WET shard(s) to {args.output}")
    return 0


def cmd_wat(args) -> int:
    from warcio_ray.pipelines.wat import wat_export

    _ray_session()
    paths = wat_export(args.inputs, args.output, gzip=not args.no_gzip)
    print(f"wrote {len(paths)} WAT shard(s) to {args.output}")
    return 0


def cmd_cdxj(args) -> int:
    from warcio_ray.pipelines.index import build_cdxj_layout, cdxj_lookup

    _ray_session()
    if args.lookup is None:
        build_cdxj_layout(args.inputs, args.layout, force=args.force)
        print(f"built CDXJ layout at {args.layout}")
        return 0
    build_cdxj_layout(args.inputs, args.layout, force=args.force)
    rows = cdxj_lookup(args.layout, [args.lookup])
    for _, r in rows.iterrows():
        print(f"{r.surt_key} {r.ts14} {r.url} {r.filename} {r.offset}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="warcio_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("index", help="NDJSON index of archive files")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-f", "--fields",
                   default="offset,warc-type,warc-target-uri")
    p.add_argument("-o", "--output", default="-")
    p.set_defaults(func=cmd_index)

    p = sub.add_parser("check", help="verify digests in archive files")
    p.add_argument("inputs", nargs="+")
    p.set_defaults(func=cmd_check)

    p = sub.add_parser("recompress",
                       help="rewrite archives as per-record-gzip shards")
    p.add_argument("inputs", nargs="+")
    p.add_argument("output")
    p.set_defaults(func=cmd_recompress)

    p = sub.add_parser("wet", help="WET text-conversion shards from WARCs")
    p.add_argument("inputs", nargs="+")
    p.add_argument("output")
    p.add_argument("--no-gzip", action="store_true")
    p.set_defaults(func=cmd_wet)

    p = sub.add_parser("wat", help="WAT metadata-JSON shards from WARCs")
    p.add_argument("inputs", nargs="+")
    p.add_argument("output")
    p.add_argument("--no-gzip", action="store_true")
    p.set_defaults(func=cmd_wat)

    p = sub.add_parser("cdxj", help="range-partitioned CDXJ capture "
                       "layout (+ optional prefix lookup)")
    p.add_argument("inputs", nargs="+")
    p.add_argument("layout")
    p.add_argument("--lookup", default=None,
                   help="SURT prefix to query after building")
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_cdxj)

    p = sub.add_parser("extract", help="extract one record by offset")
    p.add_argument("filename")
    p.add_argument("offset")
    group = p.add_mutually_exclusive_group()
    group.add_argument("--payload", action="store_true")
    group.add_argument("--headers", action="store_true")
    p.set_defaults(func=cmd_extract)

    args = parser.parse_args(argv)
    rc = args.func(args)
    # only tear down a session this CLI created (never a caller's)
    import ray
    if _OWNS_RAY and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
