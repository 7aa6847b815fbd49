#!/usr/bin/env python
"""Driver-RSS evidence for the scan-crawl funnel removal (VERDICT r4
item 2 'Done' criterion): run the big-corpus scan crawl at 1x and 4x
the in-process threshold in FRESH processes and report each run's
driver peak RSS (ru_maxrss) plus urls/s. With the partition-sweep OPIC
fold, per-link contribution rows never reach the driver, so peak RSS
should stay ~flat while the corpus grows 4x.

Usage: python tools/rss_crawl_probe.py [mult ...]   (default: 1 4)
Prints one JSON line per multiplier.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, resource, sys, time
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False)
sys.path.insert(0, %(repo)r)
from bench import build_big_sf
from warcio_ray.pages import build_pages
from warcio_ray.pipelines.crawl import (IN_PROCESS_CRAWL_MAX_BYTES,
                                        build_pages_bucketed, crawl_pages,
                                        layout_nbytes)
from warcio_ray.frontier.rounds import CrawlConfig

mult = %(mult)d
sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
t0 = time.time()
bigsf = build_big_sf(sf, int(IN_PROCESS_CRAWL_MAX_BYTES * 1.1 * mult))
pages_mb = layout_nbytes(build_pages(bigsf)) / 1e6
build_pages_bucketed(bigsf)
setup_s = time.time() - t0

rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
t0 = time.time()
order = crawl_pages(bigsf, CrawlConfig(num_shards=8, max_rounds=10),
                    n_seeds=256)
crawl_s = time.time() - t0
rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
ray.shutdown()
print(json.dumps({
    "mult": mult, "pages_mb": round(pages_mb, 1),
    "setup_s": round(setup_s, 1),
    "crawl_s": round(crawl_s, 2), "urls": len(order),
    "urls_s": round(len(order) / max(crawl_s, 1e-3), 1),
    "driver_peak_rss_mb": round(rss_after / 1024, 1),
    "rss_before_crawl_mb": round(rss_before / 1024, 1)}))
"""


def main() -> int:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4]
    for mult in mults:
        code = CHILD % {"repo": REPO, "mult": mult}
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(json.dumps({"mult": mult, "error": r.returncode,
                              "tail": r.stderr[-400:]}))
            return 1
        print(line[-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
