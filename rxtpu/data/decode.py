"""Batch image decode: native C++/libjpeg thread-pool with cv2 fallback.

The reference decodes each of a sample's 18 JPEGs one at a time with
``cv2.imdecode`` inside DataLoader worker processes
(``dataloader.py:141-146``). Here the whole batch of compressed buffers
crosses into C once (``rxtpu/native/decoder.cpp``) and is decoded by a
std::thread pool directly into one contiguous uint8 tensor — no Python
loop, no per-image array allocation, no worker processes. PNG sources are
also supported (via cv2), which removes the need for the reference's lossy
offline PNG->JPEG conversion step (``png_to_jpeg.py``) while keeping the
JPEG path for parity.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "decoder.cpp")

_lib: Optional[ctypes.CDLL] = None
_native_failed = False


def _host_fingerprint() -> str:
    """CPU identity for the compiled .so: -march=native binaries are only
    valid on the CPU family that built them (a foreign binary can SIGILL,
    which ctypes cannot catch)."""
    import platform

    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _lib_path() -> str:
    """Per-CPU-family .so path: the fingerprint lives IN the filename, so a
    -march=native binary built by a different host on a shared filesystem
    can never be paired with this host's stamp (no sidecar race)."""
    return os.path.join(
        _NATIVE_DIR, f"librxtpu_decode.{_host_fingerprint()}.so")


def _build_native(lib_path: str) -> None:
    # compile to a per-process temp name and promote atomically: a second
    # process (pytest next to a trainer, the 2-process distributed tests)
    # must never dlopen a half-written .so
    tmp = f"{lib_path}.build{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", tmp, "-ljpeg", "-lz", "-lzstd", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib_path)


def _needs_rebuild(lib_path: str) -> bool:
    if not os.path.exists(lib_path):
        return True
    return os.path.getmtime(lib_path) < os.path.getmtime(_SRC)


def get_native_lib(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib, _native_failed
    if _lib is not None and not rebuild:
        return _lib
    if _native_failed and not rebuild:
        return None
    try:
        lib_path = _lib_path()
        if rebuild or _needs_rebuild(lib_path):
            _build_native(lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.rxtpu_decode_batch.restype = ctypes.c_int
        lib.rxtpu_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.rxtpu_encode_batch.restype = ctypes.c_int
        lib.rxtpu_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.rxtpu_decode_files.restype = ctypes.c_int
        lib.rxtpu_decode_files.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.rxtpu_inflate_batch.restype = ctypes.c_int
        lib.rxtpu_inflate_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rxtpu_deflate_filtered_batch.restype = ctypes.c_int
        lib.rxtpu_deflate_filtered_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.rxtpu_inflate_unfilter_batch.restype = ctypes.c_int
        lib.rxtpu_inflate_unfilter_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib
    except Exception:
        _native_failed = True
        return None


# ---------------------------------------------------------------------------
# Compression codec plumbing (compressed rxpack): codec 0 = zlib, 1 = zstd.
# zstd decompresses 3-5x faster than zlib at comparable ratios, which is what
# lets a lossless compressed pack meet the <2% input-stall envelope at
# reference host cores (zlib inflate alone needed >14). The Python fallback
# binds libzstd directly via ctypes (this Python has no zstd stdlib module).
# ---------------------------------------------------------------------------

_CODECS = {"zlib": 0, "zstd": 1}

_zstd_lib: Optional[ctypes.CDLL] = None


def _codec_id(codec: str) -> int:
    try:
        return _CODECS[codec]
    except KeyError:
        raise ValueError(f"unknown codec {codec!r} (want 'zlib' or 'zstd')")


def _get_zstd() -> ctypes.CDLL:
    global _zstd_lib
    if _zstd_lib is None:
        import ctypes.util

        name = ctypes.util.find_library("zstd") or "libzstd.so.1"
        lib = ctypes.CDLL(name)
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_int,
        ]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _zstd_lib = lib
    return _zstd_lib


def _compress_py(raw: bytes, codec: str, level: int) -> bytes:
    if codec == "zlib":
        import zlib

        return zlib.compress(raw, level)
    lib = _get_zstd()
    cap = len(raw) + (len(raw) >> 7) + 1024  # >= ZSTD_compressBound
    dst = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(dst, cap, raw, len(raw), level)
    if lib.ZSTD_isError(n):
        raise ValueError("zstd compress failed")
    return dst.raw[:n]


def _decompress_py(blob: bytes, codec: str, expect_bytes: int) -> bytes:
    """Decompress one stream; returns b'' on any failure/size mismatch."""
    if codec == "zlib":
        import zlib

        try:
            raw = zlib.decompress(blob)
        except zlib.error:
            return b""
        return raw if len(raw) == expect_bytes else b""
    lib = _get_zstd()
    dst = ctypes.create_string_buffer(expect_bytes)
    n = lib.ZSTD_decompress(dst, expect_bytes, blob, len(blob))
    if lib.ZSTD_isError(n) or n != expect_bytes:
        return b""
    return dst.raw


def _decode_batch_cv2(buffers: Sequence[bytes], out: np.ndarray) -> int:
    import cv2

    failures = 0
    for i, buf in enumerate(buffers):
        if not buf:  # cv2.imdecode raises on empty input; count it instead
            out[i] = 0
            failures += 1
            continue
        img = cv2.imdecode(np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
        if img is None or img.shape != out.shape[1:]:
            out[i] = 0
            failures += 1
        else:
            out[i] = img
    return failures


def decode_batch(
    buffers: Sequence[bytes],
    height: int,
    width: int,
    nthreads: int = 0,
    use_native: bool = True,
    out: Optional[np.ndarray] = None,
    strict: bool = False,
) -> np.ndarray:
    """Decode a batch of grayscale JPEG byte buffers to uint8 [N, H, W].

    Failed/mismatched images decode to zeros; ``strict=True`` raises
    instead (the reference crashes on any corrupt file — np.stack over a
    None from cv2.imdecode — so strict mode is its parity behavior).
    """
    n = len(buffers)
    if out is None:
        out = np.empty((n, height, width), dtype=np.uint8)
    if n == 0:
        return out
    lib = get_native_lib() if use_native else None
    # route PER BUFFER: a mixed JPEG/PNG batch (e.g. a partially-converted
    # dataset) must not push PNGs through libjpeg
    jpeg = [len(b) >= 2 and b[:2] == b"\xff\xd8" for b in buffers]
    if lib is None or not any(jpeg):
        failures = _decode_batch_cv2(buffers, out)
    elif all(jpeg):
        failures = _decode_batch_native(lib, buffers, out, nthreads)
    else:
        jp = [i for i, m in enumerate(jpeg) if m]
        other = [i for i, m in enumerate(jpeg) if not m]
        sub = np.empty((len(jp), height, width), dtype=np.uint8)
        failures = _decode_batch_native(
            lib, [buffers[i] for i in jp], sub, nthreads)
        out[jp] = sub
        sub = np.empty((len(other), height, width), dtype=np.uint8)
        failures += _decode_batch_cv2([buffers[i] for i in other], sub)
        out[other] = sub
    if strict and failures:
        raise ValueError(f"{failures}/{n} images failed to decode")
    return out


def _decode_batch_native(lib, buffers: Sequence[bytes], out: np.ndarray,
                         nthreads: int) -> int:
    n = len(buffers)
    data = b"".join(buffers)
    lengths = np.array([len(b) for b in buffers], dtype=np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    arr = np.frombuffer(data, dtype=np.uint8)
    return lib.rxtpu_decode_batch(
        arr.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
        n, out.ctypes.data, out.shape[1], out.shape[2], nthreads,
    )


def inflate_batch(
    data: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    item_bytes: int,
    nthreads: int = 0,
    use_native: bool = True,
    out: Optional[np.ndarray] = None,
    strict: bool = False,
    codec: str = "zlib",
) -> np.ndarray:
    """Decompress N zlib/zstd streams out of ONE contiguous uint8 buffer.

    ``data`` is the whole pack (typically a memmap — slices are read
    lazily by the pool threads, so the OS readahead overlaps inflate);
    ``offsets``/``lengths`` (int64 [N]) locate each stream. Every stream
    must inflate to exactly ``item_bytes`` (fixed-size raw views, the
    compressed-rxpack contract). Failures zero-fill, or raise with
    ``strict=True`` (same fail-loud invariant as ``decode_batch``).
    Returns uint8 [N, item_bytes].
    """
    n = len(offsets)
    if out is None:
        out = np.empty((n, item_bytes), dtype=np.uint8)
    if n == 0:
        return out
    data = np.ascontiguousarray(data)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    codec_id = _codec_id(codec)
    lib = get_native_lib() if use_native else None
    if lib is not None:
        failures = lib.rxtpu_inflate_batch(
            data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
            n, out.ctypes.data, item_bytes, codec_id, nthreads,
        )
    else:
        failures = 0
        for i in range(n):
            raw = _decompress_py(
                data[offsets[i]:offsets[i] + lengths[i]].tobytes(),
                codec, item_bytes)
            if not raw:
                out[i] = 0
                failures += 1
            else:
                out[i] = np.frombuffer(raw, dtype=np.uint8)
    if strict and failures:
        raise ValueError(f"{failures}/{n} records failed to decompress")
    return out


# ---------------------------------------------------------------------------
# PNG-style adaptive row pre-filter (compressed-rxpack "filter": "png").
# Raw microscopy planes are spatially smooth; predicting each pixel from its
# raw left/up/up-left neighbors (per-row best of none/sub/up/avg/paeth by the
# libpng min-|residual| heuristic) leaves near-zero residuals that deflate
# 2-4x where the unfiltered plane manages ~1.3x. The numpy implementations
# below are the portable fallback AND the test oracle for decoder.cpp's
# filter_plane/unfilter_plane.
# ---------------------------------------------------------------------------

def filter_plane_py(plane: np.ndarray) -> np.ndarray:
    """uint8 [H, W] -> filtered uint8 [H, W+1] (filter id + residual row)."""
    h, w = plane.shape
    p = plane.astype(np.int32)
    left = np.zeros_like(p)
    left[:, 1:] = p[:, :-1]
    up = np.zeros_like(p)
    up[1:, :] = p[:-1, :]
    upleft = np.zeros_like(p)
    upleft[1:, 1:] = p[:-1, :-1]
    pa = np.abs(up - upleft)
    pb = np.abs(left - upleft)
    pc = np.abs(left + up - 2 * upleft)
    paeth = np.where((pa <= pb) & (pa <= pc), left,
                     np.where(pb <= pc, up, upleft))
    cand = np.stack([
        p,
        p - left,
        p - up,
        p - ((left + up) >> 1),
        p - paeth,
    ]).astype(np.uint8)
    cost = np.abs(cand.astype(np.int8).astype(np.int32)).sum(axis=2)  # [5, H]
    choice = cost.argmin(axis=0)
    out = np.empty((h, w + 1), np.uint8)
    out[:, 0] = choice
    out[:, 1:] = cand[choice, np.arange(h)]
    return out


def unfilter_plane_py(filt: np.ndarray) -> np.ndarray:
    """Inverse of :func:`filter_plane_py`: uint8 [H, W+1] -> [H, W].

    Raises ValueError on a corrupt filter id (matches the native path's
    fail-loud contract).
    """
    h = filt.shape[0]
    w = filt.shape[1] - 1
    out = np.empty((h, w), np.uint8)
    for y in range(h):
        ft = int(filt[y, 0])
        row = filt[y, 1:].astype(np.int32)
        above = out[y - 1].astype(np.int32) if y else np.zeros(w, np.int32)
        if ft == 0:
            cur = row
        elif ft == 1:  # sub: recon = running mod-256 cumsum
            cur = np.cumsum(row) & 0xFF
        elif ft == 2:
            cur = (row + above) & 0xFF
        elif ft in (3, 4):  # left-dependent recurrences: scalar fallback
            cur = np.empty(w, np.int32)
            a = c = 0
            for x in range(w):
                b = int(above[x])
                if ft == 3:
                    a = (int(row[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    a = (int(row[x]) + pred) & 0xFF
                    c = b
                cur[x] = a
        else:
            raise ValueError(f"corrupt filter id {ft} at row {y}")
        out[y] = cur
    return out


def deflate_filtered_batch(
    views: np.ndarray,
    level: int = 6,
    use_filter: bool = True,
    nthreads: int = 0,
    use_native: bool = True,
    codec: str = "zlib",
) -> List[bytes]:
    """Pre-filter (optionally) + zlib/zstd-compress uint8 views [N,C,H,W].

    Returns one compressed byte string per view. The native path runs
    filter+compress per view inside the C++ thread pool; the fallback uses
    :func:`filter_plane_py` + the codec's Python binding. Raises on any
    failed compress (a truncated blob baked into a pack would poison every
    later read). Level semantics follow the codec (zlib 1-9, zstd 1-22).
    """
    n, c, h, w = views.shape
    views = np.ascontiguousarray(views)
    codec_id = _codec_id(codec)
    lib = get_native_lib() if use_native else None
    if lib is not None:
        src_bytes = c * h * (w + 1) if use_filter else c * h * w
        # >= compressBound for BOTH codecs (zlib: n/1000+128; zstd: n/128+~512)
        cap = src_bytes + src_bytes // 128 + 1024
        out = np.empty((n, cap), np.uint8)
        out_lengths = np.zeros(n, np.int64)
        failures = lib.rxtpu_deflate_filtered_batch(
            views.ctypes.data, n, c, h, w, level, int(use_filter),
            out.ctypes.data, cap, out_lengths.ctypes.data, codec_id, nthreads,
        )
        if failures:
            raise ValueError(f"{failures}/{n} views failed to compress")
        return [out[i, : out_lengths[i]].tobytes() for i in range(n)]
    blobs = []
    for i in range(n):
        if use_filter:
            filtered = np.concatenate(
                [filter_plane_py(views[i, p]).reshape(-1) for p in range(c)])
            blobs.append(_compress_py(filtered.tobytes(), codec, level))
        else:
            blobs.append(_compress_py(views[i].tobytes(), codec, level))
    return blobs


def inflate_unfilter_batch(
    data: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    c: int,
    h: int,
    w: int,
    nthreads: int = 0,
    use_native: bool = True,
    out: Optional[np.ndarray] = None,
    strict: bool = False,
    codec: str = "zlib",
) -> np.ndarray:
    """Inflate + unfilter N filtered zlib/zstd streams to uint8 [N,C,H,W].

    The read side of the "png"-filtered compressed rxpack; same contract
    as :func:`inflate_batch` (zero-fill or raise with ``strict=True``).
    """
    n = len(offsets)
    if out is None:
        out = np.empty((n, c, h, w), dtype=np.uint8)
    if n == 0:
        return out
    data = np.ascontiguousarray(data)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    codec_id = _codec_id(codec)
    lib = get_native_lib() if use_native else None
    if lib is not None:
        failures = lib.rxtpu_inflate_unfilter_batch(
            data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
            n, out.ctypes.data, c, h, w, codec_id, nthreads,
        )
    else:
        filtered_bytes = c * h * (w + 1)
        failures = 0
        for i in range(n):
            try:
                raw = _decompress_py(
                    data[offsets[i]:offsets[i] + lengths[i]].tobytes(),
                    codec, filtered_bytes)
                if not raw:
                    raise ValueError("bad stream")
                filt = np.frombuffer(raw, np.uint8).reshape(c, h, w + 1)
                for p in range(c):
                    out[i, p] = unfilter_plane_py(filt[p])
            except ValueError:
                out[i] = 0
                failures += 1
    if strict and failures:
        raise ValueError(f"{failures}/{n} records failed to decompress")
    return out


def decode_files(
    paths: Sequence[str],
    height: int,
    width: int,
    nthreads: int = 0,
    use_native: bool = True,
    out: Optional[np.ndarray] = None,
    strict: bool = False,
) -> np.ndarray:
    """Read + decode grayscale JPEG files to uint8 [N, H, W].

    The native path runs open/read/decode entirely inside the C++ thread
    pool (streaming mode — no Python per-file IO). Non-JPEG sources or a
    missing native lib fall back to cv2.imread. Failed files decode to
    zeros; ``strict=True`` raises instead (reference crash-on-corrupt
    parity, dataloader.py:141-146).
    """
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width), dtype=np.uint8)
    if n == 0:
        return out
    lib = get_native_lib() if use_native else None
    # route PER PATH so a mixed jpeg/png file list decodes correctly
    jpeg = [p.endswith((".jpeg", ".jpg")) for p in paths]
    if lib is None or not any(jpeg):
        failures = _decode_files_cv2(paths, out)
    elif all(jpeg):
        failures = _decode_files_native(lib, paths, out, nthreads)
    else:
        jp = [i for i, m in enumerate(jpeg) if m]
        other = [i for i, m in enumerate(jpeg) if not m]
        sub = np.empty((len(jp), height, width), dtype=np.uint8)
        failures = _decode_files_native(
            lib, [paths[i] for i in jp], sub, nthreads)
        out[jp] = sub
        sub = np.empty((len(other), height, width), dtype=np.uint8)
        failures += _decode_files_cv2([paths[i] for i in other], sub)
        out[other] = sub
    if strict and failures:
        raise ValueError(f"{failures}/{n} files failed to read/decode")
    return out


def _decode_files_cv2(paths: Sequence[str], out: np.ndarray) -> int:
    import cv2

    failures = 0
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None or img.shape != out.shape[1:]:
            out[i] = 0
            failures += 1
        else:
            out[i] = img
    return failures


def _decode_files_native(lib, paths: Sequence[str], out: np.ndarray,
                         nthreads: int) -> int:
    n = len(paths)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    offsets = np.zeros(n, dtype=np.int64)
    lens = np.array([len(p.encode()) + 1 for p in paths], dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return lib.rxtpu_decode_files(
        blob, offsets.ctypes.data, n, out.ctypes.data,
        out.shape[1], out.shape[2], nthreads,
    )


def encode_batch_jpeg(
    planes: np.ndarray, quality: int = 95, nthreads: int = 0
) -> List[bytes]:
    """Encode uint8 [N, H, W] planes to grayscale JPEG buffers (quality 95
    matching png_to_jpeg.py:16). Uses the native encoder when available.

    Raises on any failed encode — a silently-empty buffer would be written
    to disk as a 0-byte .jpeg and poison later runs.
    """
    n, h, w = planes.shape
    lib = get_native_lib()
    if lib is None:
        import cv2

        bufs = []
        for i in range(n):
            ok, enc = cv2.imencode(
                ".jpeg", planes[i], [cv2.IMWRITE_JPEG_QUALITY, quality])
            if not ok:
                raise ValueError(f"jpeg encode failed for plane {i}")
            bufs.append(enc.tobytes())
        return bufs
    cap = h * w + 4096
    out = np.empty((n, cap), dtype=np.uint8)
    out_lengths = np.zeros(n, dtype=np.int64)
    planes = np.ascontiguousarray(planes)
    failures = lib.rxtpu_encode_batch(
        planes.ctypes.data, n, h, w, quality,
        out.ctypes.data, cap, out_lengths.ctypes.data, nthreads,
    )
    if failures:
        raise ValueError(f"{failures}/{n} planes failed to encode")
    return [out[i, : out_lengths[i]].tobytes() for i in range(n)]
