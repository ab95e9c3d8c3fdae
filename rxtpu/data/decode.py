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
           "-o", tmp, "-ljpeg", "-lz", "-lpthread"]
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
        ]
        _lib = lib
        return _lib
    except Exception:
        _native_failed = True
        return None


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
) -> np.ndarray:
    """Decompress N zlib streams out of ONE contiguous uint8 buffer.

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
    lib = get_native_lib() if use_native else None
    if lib is not None:
        failures = lib.rxtpu_inflate_batch(
            data.ctypes.data, offsets.ctypes.data, lengths.ctypes.data,
            n, out.ctypes.data, item_bytes, nthreads,
        )
    else:
        import zlib

        failures = 0
        for i in range(n):
            try:
                raw = zlib.decompress(
                    data[offsets[i]:offsets[i] + lengths[i]].tobytes())
            except zlib.error:
                raw = b""
            if len(raw) != item_bytes:
                out[i] = 0
                failures += 1
            else:
                out[i] = np.frombuffer(raw, dtype=np.uint8)
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
