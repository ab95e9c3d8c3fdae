"""Offline data tools (CLI): streaming stats pass + PNG->JPEG conversion.

``python -m rxtpu.tools stats --data data [--out stats_experiments.json]``
    TPU-native replacement for ``compute_stats_experiments.py``: walks
    ``data/{train,test}/{experiment}/Plate*/*.{ext}``, decodes in batches
    with the native decoder and accumulates per-(experiment, channel)
    mean/std in ONE jit-compiled streaming pass on device. ``--verify``
    reproduces the reference's normalization check (mean~0 / std~1).

``python -m rxtpu.tools png2jpeg --data data [--quality 95]``
    Replacement for ``png_to_jpeg.py``: converts every ``.png`` under the
    data dir to grayscale JPEG (quality 95 parity, png_to_jpeg.py:16)
    using batch decode (cv2) + the native threaded encoder instead of a
    process pool. Note the main pipeline can read PNG directly
    (``--image-ext png``), so this step is optional — kept for capability
    parity.
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from rxtpu.data.decode import encode_batch_jpeg
from rxtpu.data.stats import (
    channel_from_path,
    compute_stats_streaming,
    save_stats,
    verify_stats,
)


def list_experiments(data_dir: str) -> List[str]:
    """Experiment names from data/{train,test}/*/ (compute_stats_experiments.py:29-33).

    Deduplicated (unlike the reference, which can tolerate duplicates only
    because Kaggle train/test experiment names are disjoint).
    """
    exps: dict = {}
    for split in ("train", "test"):
        for p in sorted(glob.glob(os.path.join(data_dir, split, "*", ""))):
            exps.setdefault(os.path.basename(os.path.dirname(p)), None)
    return list(exps)


def experiment_paths(data_dir: str, experiment: str, ext: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(data_dir, "*", experiment, "*", f"*.{ext}"))
    )


def _probe_size(path: str) -> int:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape[0] == img.shape[1], path
    return img.shape[0]


def _stats_batches(
    data_dir: str, experiments: Sequence[str], ext: str, size: int, batch: int,
    nthreads: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    exp_ix = {e: i for i, e in enumerate(experiments)}
    todo: List[Tuple[str, int]] = []
    for exp in experiments:
        for p in experiment_paths(data_dir, exp, ext):
            todo.append((p, exp_ix[exp] * 6 + channel_from_path(p) - 1))
    from rxtpu.data.decode import decode_files

    for i in range(0, len(todo), batch):
        chunk = todo[i : i + batch]
        paths = [p for p, _ in chunk]
        ids = np.full(batch, -1, np.int32)
        for j, (_, bucket) in enumerate(chunk):
            ids[j] = bucket
        while len(paths) < batch:
            paths.append(paths[0])  # pad (masked by id == -1)
        # open/read/decode all inside the C++ thread pool — per-file
        # Python IO here would serialize the whole stats pass on the GIL
        images = decode_files(paths, size, size, nthreads=nthreads,
                              strict=True)
        yield images, ids


def run_stats(
    data_dir: str,
    out_path: str,
    ext: str = "jpeg",
    batch: int = 256,
    verify: bool = False,
    nthreads: int = 0,
) -> Dict:
    experiments = list_experiments(data_dir)
    if not experiments:
        raise SystemExit(f"no experiments found under {data_dir}/{{train,test}}/")
    first = experiment_paths(data_dir, experiments[0], ext)
    if not first:
        raise SystemExit(f"no .{ext} images for experiment {experiments[0]}")
    size = _probe_size(first[0])
    stats = compute_stats_streaming(
        _stats_batches(data_dir, experiments, ext, size, batch, nthreads), experiments
    )
    save_stats(stats, out_path)
    print(f"wrote {out_path} ({len(experiments)} experiments, size {size})")
    if verify:
        print("Verification:")

        def triples():
            import cv2

            for exp in experiments:
                for p in experiment_paths(data_dir, exp, ext):
                    yield exp, channel_from_path(p), cv2.imread(p, cv2.IMREAD_GRAYSCALE)

        ver = verify_stats(stats, triples())
        for exp in experiments:
            print("mean=", ver[exp]["mean"])
            print("std=", ver[exp]["std"])
    return stats


def run_png2jpeg(data_dir: str, quality: int = 95, batch: int = 256, nthreads: int = 0) -> int:
    import cv2

    paths = sorted(glob.glob(os.path.join(data_dir, "**", "*.png"), recursive=True))
    n_done = 0
    expect_shape = None
    for i in range(0, len(paths), batch):
        chunk = paths[i : i + batch]
        planes = []
        for p in chunk:
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise SystemExit(f"png2jpeg: cannot read {p}")
            if expect_shape is None:
                expect_shape = img.shape
            elif img.shape != expect_shape:
                # the recursive glob sweeps in ANY png under data/ — fail
                # loud (naming the file) before writing a half-converted
                # tree rather than crashing in np.stack mid-run
                raise SystemExit(
                    f"png2jpeg: {p} has size {img.shape}, expected "
                    f"{expect_shape} (non-dataset png under the data dir?)"
                )
            planes.append(img)
        planes = np.stack(planes)
        bufs = encode_batch_jpeg(planes, quality=quality, nthreads=nthreads)
        for p, buf in zip(chunk, bufs):
            out = p.rsplit(".", 1)[0] + ".jpeg"
            with open(out, "wb") as f:
                f.write(buf)
            n_done += 1
    print(f"converted {n_done} png -> jpeg (quality {quality})")
    return n_done


def run_iobench(data_dir: str, ext: str = "jpeg", batch: int = 288,
                nthreads: int = 0, seconds: float = 5.0,
                train_views_per_s: float = 770.0) -> dict:
    """Measure the host input pipeline's decode throughput.

    Decodes files from data/train in batches through the native loader.
    One "view" is a 6-channel image = 6 single-channel files, so the
    supply is ``views_per_s_supported = decode_rate / 6``; against the
    device's consumption (``train_views_per_s``, default the measured
    bs32 v5e train step) the projected decode-bound input stall is
    ``max(0, 1 - supply/demand)`` — the <2% north-star metric.
    """
    import time

    exps = list_experiments(data_dir)
    paths: List[str] = []
    for e in exps:
        paths += experiment_paths(data_dir, e, ext)
        if len(paths) >= batch * 4:
            break
    if not paths:
        raise SystemExit(f"no .{ext} files under {data_dir}")
    size = _probe_size(paths[0])
    from rxtpu.data.decode import decode_files

    # warm
    decode_files(paths[:batch], size, size, nthreads=nthreads)
    n_done, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        chunk = [paths[(n_done + i) % len(paths)] for i in range(batch)]
        decode_files(chunk, size, size, nthreads=nthreads)
        n_done += batch
    dt = time.perf_counter() - t0
    rate = n_done / dt
    supply = rate / 6.0
    out = {
        "decode_images_per_s": round(rate, 1),
        "image_size": size,
        "threads": nthreads or os.cpu_count(),
        "views_per_s_supported": round(supply, 1),
        "projected_decode_stall_pct": round(
            100.0 * max(0.0, 1.0 - supply / train_views_per_s), 1),
    }
    print(out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rxtpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("stats", help="streaming per-experiment mean/std pass")
    sp.add_argument("--data", default="data")
    sp.add_argument("--out", default="stats_experiments.json")
    sp.add_argument("--ext", default="jpeg")
    sp.add_argument("--batch", type=int, default=256)
    sp.add_argument("--threads", type=int, default=0)
    sp.add_argument("--verify", action="store_true")

    pk = sub.add_parser("pack", help="write decode-free rxpack dataset files")
    pk.add_argument("--data", default="data")
    pk.add_argument("--out", default="packs")
    pk.add_argument("--ext", default="jpeg")
    pk.add_argument("--threads", type=int, default=0)
    pk.add_argument("--splits", default="train,test")
    pk.add_argument("--compress", default="none",
                    choices=["none", "zlib", "zstd"],
                    help="lossless per-view compression: ~2-4x smaller pack "
                         "for storage-bandwidth-bound hosts; readers "
                         "decompress in the native pool. zstd decompresses "
                         "3-5x faster than zlib (recommended)")
    pk.add_argument("--compress-level", type=int, default=None,
                    help="codec scale: zlib 1-9 (default 6), zstd 1-22 "
                         "(default 19; one-time pack cost)")
    pk.add_argument("--filter", default="none", choices=["none", "png"],
                    help="png: per-row adaptive pre-filter before the codec "
                         "(~2x better ratio on smooth microscopy planes)")

    ib = sub.add_parser("iobench", help="host decode-throughput benchmark")
    ib.add_argument("--data", default="data")
    ib.add_argument("--ext", default="jpeg")
    ib.add_argument("--batch", type=int, default=288)
    ib.add_argument("--threads", type=int, default=0)
    ib.add_argument("--seconds", type=float, default=5.0)

    cp = sub.add_parser("png2jpeg", help="batch convert PNGs to grayscale JPEG")
    cp.add_argument("--data", default="data")
    cp.add_argument("--quality", type=int, default=95)
    cp.add_argument("--batch", type=int, default=256)
    cp.add_argument("--threads", type=int, default=0)

    args = ap.parse_args(argv)
    if args.cmd == "pack":
        from rxtpu.data.pack import write_pack
        from rxtpu.data.records import load_metadata, read_metadata_csvs

        for split in args.splits.split(","):
            df, dfc = read_metadata_csvs(os.path.join(args.data, "metadata"), split)
            idx = load_metadata(df, dfc, split)
            level = args.compress_level
            if level is None:
                level = 19 if args.compress == "zstd" else 6
            path = write_pack(idx, args.data, args.out, ext=args.ext,
                              decoder_threads=args.threads, verbose=True,
                              compress=(None if args.compress == "none"
                                        else args.compress),
                              compress_level=level,
                              filter=(None if args.filter == "none"
                                      else args.filter))
            print(f"wrote {path} ({os.path.getsize(path)/1e6:.1f} MB)")
        return
    if args.cmd == "stats":
        run_stats(args.data, args.out, args.ext, args.batch, args.verify, args.threads)
    elif args.cmd == "iobench":
        run_iobench(args.data, args.ext, args.batch, args.threads, args.seconds)
    elif args.cmd == "png2jpeg":
        run_png2jpeg(args.data, args.quality, args.batch, args.threads)


if __name__ == "__main__":
    main()
