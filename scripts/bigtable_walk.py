"""Catalog walk against a realistic-scale count table: host vs device.

At bundled-fixture scale (4-32 KB tables) the numpy host path wins the
catalog walk — every lookup is an L1 hit. A real RNA-seq sample's
table is ~1e8-1e9 records (reference: example/README.rst:29,41-48 —
jellyfish sizes its hash in the hundreds of millions), where each host
binary-search probe takes ~27 cache-missing hops over GBs. This script
builds that table honestly: the bundled fixture's records UNIONED with
``--extra`` million random k-mers whose counts are all below the
``-c 5`` child threshold — so every walk, path, and report row is
byte-identical to the fixture-only run (asserted), while every lookup
pays real big-table cost.

Reports host and device warm walk times for the 400-target catalog +
the one-time table upload cost. Run with the cache warm.

Usage: python scripts/bigtable_walk.py [--extra 100] [--targets 400]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from km_tpu.utils.jaxcache import enable  # noqa: E402

enable()

import numpy as np  # noqa: E402

import bench as B  # noqa: E402
from km_tpu.models.batch import run_catalog  # noqa: E402
from km_tpu.models.table import CountTable  # noqa: E402
from km_tpu.ops.device_table import DeviceCountTable  # noqa: E402
from km_tpu.refdata import jf_path  # noqa: E402


def main():
    extra_m = 100
    n_targets = 400
    args = sys.argv[1:]
    if "--extra" in args:
        extra_m = int(args[args.index("--extra") + 1])
    if "--targets" in args:
        n_targets = int(args[args.index("--targets") + 1])

    fixture = CountTable.from_jf(jf_path("03H116_ITD"))
    targets = B._make_catalog_targets(n_targets, fixture.k)

    # big table = fixture ∪ random keys with counts 1..4: the child
    # threshold max(sum*ratio, count=5) >= 5 rejects every random key,
    # so results must equal the fixture-only run — while every lookup
    # searches the full table
    rng = np.random.default_rng(0)
    n_extra = extra_m * 1_000_000
    rand = rng.integers(0, 1 << 62, n_extra, dtype=np.uint64)
    keys = np.concatenate([fixture.keys, rand])
    counts = np.concatenate([
        fixture.counts.astype(np.uint32),
        rng.integers(1, 5, n_extra, dtype=np.int64).astype(np.uint32)])
    order = np.argsort(keys, kind="stable")
    keys, counts = keys[order], counts[order]
    # random collisions with fixture keys are ~1e-11 likely; dedupe
    # defensively anyway (keep the first = stable)
    uniq = np.concatenate([[True], keys[1:] != keys[:-1]])
    keys, counts = keys[uniq], counts[uniq]
    big = CountTable.from_arrays(keys, counts, fixture.k,
                                 fixture.canonical, name=fixture.name,
                                 presorted=True)
    print("table records: %d (%.1f GB host)" % (
        len(keys), keys.nbytes / 1e9), file=sys.stderr)

    rows_small = run_catalog(targets, fixture, walk="host")
    t0 = time.perf_counter()
    rows_host = run_catalog(targets, big, walk="host")
    host_s = time.perf_counter() - t0
    print("host warm: %.3fs" % host_s, file=sys.stderr)

    t0 = time.perf_counter()
    dev = DeviceCountTable.from_host(big)
    rows_dev = run_catalog(targets, dev)  # cold-ish (class warm-up)
    upload_plus_first_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rows_dev = run_catalog(targets, dev)
        best = min(best, time.perf_counter() - t0)
    print("device warm best: %.3fs" % best, file=sys.stderr)

    as_str = lambda rs: [[str(r) for r in row] for row in rs]  # noqa: E731
    assert as_str(rows_host) == as_str(rows_small), \
        "below-threshold random keys changed the host rows"
    assert as_str(rows_dev) == as_str(rows_small), \
        "below-threshold random keys changed the device rows"

    print(json.dumps({
        "metric": "catalog_walk_bigtable",
        "table_records": int(len(keys)),
        "targets": n_targets,
        "host_warm_s": round(host_s, 3),
        "device_warm_s": round(best, 3),
        "device_upload_plus_first_s": round(upload_plus_first_s, 1),
        "rows_match_fixture_only_run": True,
    }))


if __name__ == "__main__":
    main()
