"""rxpack: packed raw dataset format — decode-free input at pod scale.

Why: at the north-star rate (thousands of 6-channel views/s/chip) the JPEG
path needs ~18 decodes per view; libjpeg manages ~200 512^2 decodes/s/core,
so a v5e-8 host runs out of cores long before the chips saturate. The
literature fix (FFCV; L3, see PAPERS.md) is to pay the decode once offline
and stream raw pixels: 6x512^2 uint8 = 1.5 MB/view reads at NVMe/page-cache
bandwidth with ZERO decode cost, trivially holding input stall under the 2%
target.

Format: one pack per split —
  {out}/{split}.rxpack       consecutive (C, H, W) uint8 blocks per
                             (experiment, plate, well, site)
  {out}/{split}.rxpack.json  {"h","w","channels","entries":{key: ordinal}}

Readers memory-map the pack; batch assembly is pure memcpy. ``PackStore``
is a drop-in for ``ByteStore`` in ``rxtpu.data.pipeline`` (the pipeline
detects the decoded fast path via ``get_decoded``).

Compressed variant (``write_pack(compress="zlib"|"zstd")``): views are
stored as variable-length compressed streams, located by
``"offsets"``/``"lengths"`` arrays in the JSON (indexed by ordinal) with
``"compress": "zlib"|"zstd"``. A raw 512^2 pack demands ~1.2 GB/s of
storage bandwidth per v5e chip at the measured step rate (bench
`storage_MBps_required`); fluorescent cell planes deflate ~2-4x, so
storage-bandwidth-bound hosts can trade pool-thread CPU
(``rxtpu_inflate_batch``, decoder.cpp) for that factor. ``PackStore``
auto-detects the variant from the JSON — the Pipeline needs no flag (it
batch-inflates via ``get_decoded_batch``). zstd decompresses 3-5x faster
than zlib at comparable ratios (pool cores are the binding resource on a
reference host), so ``"zstd"`` is the recommended lossless compressed
format; zstd levels go to 22 (compression is a one-time pack cost —
decompression speed is essentially level-independent).

``filter="png"`` additionally pre-filters every plane row with the PNG
none/sub/up/avg/paeth family (adaptive per row, decoder.cpp
``filter_plane``) before the codec. Smooth microscopy planes leave
near-zero residuals, roughly doubling the compression ratio of the plain
codec; readers inflate+unfilter in one native pool call
(``rxtpu_inflate_unfilter_batch``). JSON gains ``"filter": "png"``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np

from rxtpu.data.decode import decode_files
from rxtpu.data.records import (
    MetadataIndex,
    WellRecord,
    all_records,
    image_path,
)


def _key(experiment: str, plate: int, well: str, site: int) -> str:
    return f"{experiment}|{plate}|{well}|{site}"


_all_records = all_records  # moved to records.py (shared with ByteStore)


def write_pack(
    index: MetadataIndex,
    img_dir: str,
    out_dir: str,
    ext: str = "jpeg",
    channels: Sequence[int] = (1, 2, 3, 4, 5, 6),
    src_size: int = None,
    decoder_threads: int = 0,
    batch_wells: int = 64,
    verbose: bool = False,
    compress: str = None,
    compress_level: int = 6,
    filter: str = None,
) -> str:
    """Decode every (well, site) of the index once and write the pack.

    Returns the pack path. Decoding runs through the native thread-pool
    loader in batches of ``batch_wells`` wells. ``compress="zlib"`` or
    ``"zstd"`` writes the variable-length compressed variant;
    ``filter="png"`` adds the per-row adaptive pre-filter (see module
    docstring). ``compress_level`` follows the codec's scale (zlib 1-9,
    zstd 1-22).
    """
    if compress not in (None, "zlib", "zstd"):
        raise ValueError(f"unknown pack compression {compress!r}")
    if filter not in (None, "png"):
        raise ValueError(f"unknown pack filter {filter!r}")
    if filter and not compress:
        raise ValueError("filter requires a compress codec")
    import cv2

    records = _all_records(index)
    if src_size is None:
        r0 = records[0]
        probe_path = image_path(img_dir, index.split, r0.experiment,
                                r0.plate, r0.well, 1, channels[0], ext)
        probe = cv2.imread(probe_path, cv2.IMREAD_GRAYSCALE)
        if probe is None:
            raise FileNotFoundError(
                f"cannot read probe image {probe_path!r} to infer src_size; "
                "pass src_size explicitly or fix the source tree"
            )
        if probe.shape[0] != probe.shape[1]:
            raise ValueError(
                f"pack format assumes square sources, got {probe.shape} "
                f"from {probe_path!r}"
            )
        src_size = probe.shape[0]
    c, h, w = len(channels), src_size, src_size
    plane_bytes = c * h * w

    os.makedirs(out_dir, exist_ok=True)
    pack_path = os.path.join(out_dir, f"{index.split}.rxpack")
    entries: Dict[str, int] = {}
    it = range(0, len(records), batch_wells)
    if verbose:
        from tqdm import tqdm

        it = tqdm(it, desc=f"Packing {index.split}")
    offsets, lengths = [], []
    pos = 0
    with open(pack_path, "wb") as f:
        ordinal = 0
        for start in it:
            chunk = records[start : start + batch_wells]
            paths, keys = [], []
            for r in chunk:
                for site in (1, 2):
                    keys.append(_key(r.experiment, r.plate, r.well, site))
                    for ch in channels:
                        paths.append(
                            image_path(img_dir, index.split, r.experiment,
                                       r.plate, r.well, site, ch, ext)
                        )
            # strict: a corrupt source image must fail here, not be baked
            # into the pack as silent all-zero planes (same fail-loud
            # invariant as Pipeline._make_batch)
            planes = decode_files(paths, h, w, nthreads=decoder_threads,
                                  strict=True)
            planes = planes.reshape(len(keys), c, h, w)
            if compress:
                from rxtpu.data.decode import deflate_filtered_batch

                blobs = deflate_filtered_batch(
                    planes, level=compress_level,
                    use_filter=(filter == "png"), nthreads=decoder_threads,
                    codec=compress)
            else:
                blobs = [view.tobytes() for view in planes]
            for k, blob in zip(keys, blobs):
                entries[k] = ordinal
                if compress:
                    offsets.append(pos)
                    lengths.append(len(blob))
                    pos += len(blob)
                f.write(blob)
                ordinal += 1
    meta = {"h": h, "w": w, "channels": c, "entries": entries}
    if compress:
        meta["compress"] = compress
        meta["offsets"] = offsets
        meta["lengths"] = lengths
        if filter:
            meta["filter"] = filter
    with open(pack_path + ".json", "w") as f:
        json.dump(meta, f)
    return pack_path


class PackStore:
    """Memory-mapped reader over a pack; drop-in store for the Pipeline.

    ``get_decoded(record, site)`` returns a zero-copy uint8 view
    [C, H, W]; batch assembly is then a straight memcpy (no decode).
    For a compressed pack (auto-detected from the JSON) views inflate
    through the native thread pool — ``get_decoded_batch`` serves a whole
    batch in one C call (the Pipeline prefers it when present).
    """

    def __init__(self, pack_path: str):
        with open(pack_path + ".json") as f:
            meta = json.load(f)
        self.h, self.w = meta["h"], meta["w"]
        self.n_channels = meta["channels"]
        self.channels = tuple(range(1, self.n_channels + 1))
        self._entries = meta["entries"]
        self._mm = np.memmap(pack_path, dtype=np.uint8, mode="r")
        self._view_elems = self.n_channels * self.h * self.w
        self.compress = meta.get("compress")
        self.filter = meta.get("filter")
        if self.compress:
            self._offsets = np.asarray(meta["offsets"], dtype=np.int64)
            self._lengths = np.asarray(meta["lengths"], dtype=np.int64)
        self.preloaded = True  # decoded fast path; pipeline never re-decodes

    def _ordinal(self, r: WellRecord, site: int) -> int:
        return self._entries[_key(r.experiment, r.plate, r.well, site)]

    def get_decoded(self, r: WellRecord, site: int) -> np.ndarray:
        shape = (self.n_channels, self.h, self.w)
        ordinal = self._ordinal(r, site)
        if self.compress:
            return self._inflate([ordinal], nthreads=1).reshape(shape)
        off = ordinal * self._view_elems
        return self._mm[off : off + self._view_elems].reshape(shape)

    def get_decoded_batch(self, keys, nthreads: int = 0) -> np.ndarray:
        """uint8 [len(keys), C, H, W] for (record, site) pairs, one C call."""
        n = len(keys)
        shape = (n, self.n_channels, self.h, self.w)
        ordinals = [self._ordinal(r, site) for r, site in keys]
        if self.compress:
            return self._inflate(ordinals, nthreads=nthreads).reshape(shape)
        out = np.empty((n, self._view_elems), np.uint8)
        for i, o in enumerate(ordinals):
            off = o * self._view_elems
            out[i] = self._mm[off : off + self._view_elems]
        return out.reshape(shape)

    def _inflate(self, ordinals, nthreads: int) -> np.ndarray:
        # strict: a corrupt pack record must fail loudly (same invariant
        # as Pipeline._make_batch / write_pack)
        if self.filter == "png":
            from rxtpu.data.decode import inflate_unfilter_batch

            return inflate_unfilter_batch(
                self._mm, self._offsets[ordinals], self._lengths[ordinals],
                self.n_channels, self.h, self.w, nthreads=nthreads,
                strict=True, codec=self.compress,
            ).reshape(len(ordinals), self._view_elems)
        from rxtpu.data.decode import inflate_batch

        return inflate_batch(
            self._mm, self._offsets[ordinals], self._lengths[ordinals],
            self._view_elems, nthreads=nthreads, strict=True,
            codec=self.compress,
        )
