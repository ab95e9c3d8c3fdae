"""Per-view feed-side CPU costs + thread-pool scaling for the stall model.

The BASELINE <2% input-stall target (reference operating point:
main.py:61-64 — RAM-cached compressed bytes + DataLoader workers) cannot
be demonstrated end-to-end on the dev rig (1 CPU core, remote-relay H2D),
so bench.py projects production stall from measured per-view costs
(`_project_stalls`). This script IS that measurement: it times every feed
format's host-side work per view through the native thread pool
(decoder.cpp) and sweeps nthreads to show the pool's scaling behavior as
far as the box allows.

On this 1-core box the sweep is necessarily flat (hardware_concurrency
== 1); the projection's linear-scaling-with-0.9-efficiency model rests on
the pool's structure instead: work is handed out as whole independent
views via one atomic counter (decoder.cpp run_pool), there is no shared
state, and the memory-bandwidth ceiling sits far above the projected
multi-core demand (inflate writes ~1.5 MB/view; 14 cores x the measured
per-core rate stays under ~2 GB/s against >10 GB/s host memory bw).

Usage: python dev/feed_scaling.py [--src 512] [--views 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, trials: int = 3) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()

    from bench import _bench_dataset
    from rxtpu.data.decode import decode_batch
    from rxtpu.data.pack import PackStore
    from rxtpu.data.pipeline import ByteStore
    from rxtpu.data.records import load_metadata, read_metadata_csvs

    root = _bench_dataset(args.src, min_records=2 * args.views)
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    keys = [(r, site) for r in idx.records for site in (1, 2)][: args.views]
    n = len(keys)
    view_mb = 6 * args.src * args.src / 1e6

    stores = {
        "raw": PackStore(os.path.join(root, "pack", "train.rxpack")),
        "zlib": PackStore(os.path.join(root, "pack_z", "train.rxpack")),
        "zf": PackStore(os.path.join(root, "pack_zf", "train.rxpack")),
        "zs": PackStore(os.path.join(root, "pack_zs", "train.rxpack")),
        "zsf": PackStore(os.path.join(root, "pack_zsf", "train.rxpack")),
    }
    byte_store = ByteStore(idx, root, preload=True)
    jpeg_bufs = []
    for r, site in keys:
        jpeg_bufs.extend(byte_store.get(r, site))

    raw_bytes = os.path.getsize(os.path.join(root, "pack", "train.rxpack"))
    pack_files = {"raw": "pack", "zlib": "pack_z", "zf": "pack_zf",
                  "zs": "pack_zs", "zsf": "pack_zsf"}
    out = {"src": args.src, "views": n, "view_MB": round(view_mb, 3),
           "nproc": os.cpu_count(), "formats": {}}
    for tag, store in stores.items():
        row = {"ratio": round(raw_bytes / os.path.getsize(
            os.path.join(root, pack_files[tag], "train.rxpack")), 3)}
        for nt in args.threads:
            # warm page cache + pool, then best-of-3
            store.get_decoded_batch(keys, nthreads=nt)
            dt = _time(lambda: store.get_decoded_batch(keys, nthreads=nt))
            row[f"ms_per_view_t{nt}"] = round(1000 * dt / n, 3)
        row["MBps_per_thread"] = round(
            view_mb / (row["ms_per_view_t1"] / 1000), 1)
        out["formats"][tag] = row
    row = {}
    for nt in args.threads:
        dec = np.empty((len(jpeg_bufs), args.src, args.src), np.uint8)
        decode_batch(jpeg_bufs, args.src, args.src, nthreads=nt, out=dec)
        dt = _time(lambda: decode_batch(jpeg_bufs, args.src, args.src,
                                        nthreads=nt, out=dec))
        row[f"ms_per_view_t{nt}"] = round(1000 * dt / n, 3)
    row["MBps_per_thread"] = round(view_mb / (row["ms_per_view_t1"] / 1000), 1)
    out["formats"]["jpeg"] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
