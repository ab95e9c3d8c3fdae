"""Input pipeline tests: byte store, assembly parity, decode, prefetch."""

import os

import numpy as np
import pytest

from rxtpu.data.decode import decode_batch, encode_batch_jpeg, get_native_lib
from rxtpu.data.pipeline import ByteStore, Pipeline, device_prefetch
from rxtpu.data.records import load_metadata, read_metadata_csvs
from rxtpu.data.stats import compute_stats_numpy

SRC = 64


def _stats_for(index):
    # flat stats (exact values irrelevant to pipeline mechanics)
    exps = index.experiments
    return {e: {"mean": np.full(6, 0.4), "std": np.full(6, 0.2)} for e in exps}


@pytest.fixture(scope="module")
def train_setup(synthetic_root):
    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, preload=True)
    return idx, store


def test_native_roundtrip_matches_cv2():
    import cv2

    rng = np.random.default_rng(0)
    planes = rng.integers(0, 256, size=(4, SRC, SRC), dtype=np.uint8)
    bufs = encode_batch_jpeg(planes)
    dec_native = decode_batch(bufs, SRC, SRC, use_native=True)
    dec_cv2 = np.stack(
        [cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_GRAYSCALE) for b in bufs]
    )
    np.testing.assert_array_equal(dec_native, dec_cv2)


def test_bytestore_preload_equals_disk(train_setup):
    idx, store = train_setup
    r = idx.records[0]
    lazy = ByteStore(idx, store.img_dir, preload=False)
    assert store.get(r, 1) == lazy.get(r, 1)
    assert len(store.get(r, 2)) == 6


def test_train_batch_shapes(train_setup):
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=4, mode="train", src_size=SRC)
    batch = next(iter(pipe.epoch(0)))
    assert batch["images"].shape == (4, 3, 6, SRC, SRC)
    assert batch["images"].dtype == np.uint8
    assert batch["labels"].shape == (4,)
    assert batch["mean"].shape == (4, 6)
    assert (batch["valid"] == 1).all()
    # decoded content is non-degenerate
    assert batch["images"].std() > 1.0


def test_test_mode_g6_layout(train_setup):
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=2, mode="test", src_size=SRC)
    batch = next(iter(pipe.epoch(0)))
    # G=6: [img_s1, img_s2, neg_s1, neg_s2, pos_s1, pos_s2] (dataloader.py:182-207)
    assert batch["images"].shape == (2, 6, 6, SRC, SRC)
    assert batch["id_codes"][0] != ""


def test_partial_batch_padding_and_masking(train_setup):
    idx, store = train_setup
    n = len(idx)
    bs = 5
    assert n % bs != 0
    pipe = Pipeline(
        idx, store, _stats_for(idx), batch_size=bs, mode="val", src_size=SRC,
        drop_last=False, shuffle=False,
    )
    batches = list(pipe.epoch(0))
    assert len(batches) == (n + bs - 1) // bs
    last = batches[-1]
    n_real = n - (len(batches) - 1) * bs
    assert last["valid"].sum() == n_real
    assert (last["valid"][:n_real] == 1).all() and (last["valid"][n_real:] == 0).all()
    # total valid across epoch == dataset size
    assert sum(b["valid"].sum() for b in batches) == n


def test_train_drop_last(train_setup):
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=5, mode="train", src_size=SRC)
    assert len(pipe) == len(idx) // 5


def test_epoch_determinism_and_shuffling(train_setup):
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=4, mode="train",
                    src_size=SRC, seed=3)
    a = next(iter(pipe.epoch(1)))
    b = next(iter(pipe.epoch(1)))
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    c = next(iter(pipe.epoch(2)))
    assert not np.array_equal(a["images"], c["images"])


def test_producer_error_propagates(train_setup):
    idx, store = train_setup

    class BoomStore(ByteStore):
        def get(self, r, site):
            raise RuntimeError("boom")

        def paths(self, r, site):
            raise RuntimeError("boom")

    boom = BoomStore(idx, store.img_dir, preload=False)
    pipe = Pipeline(idx, boom, _stats_for(idx), batch_size=2, mode="train", src_size=SRC)
    with pytest.raises(RuntimeError, match="boom"):
        list(pipe.epoch(0))


def test_device_prefetch_order(train_setup):
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=4, mode="val",
                    src_size=SRC, shuffle=False, drop_last=False)
    host = list(pipe.epoch(0))
    dev = list(device_prefetch(iter(host)))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(np.asarray(d["images"]), h["images"])
        assert d["id_codes"] == h["id_codes"]


def test_png_direct_pipeline(tmp_path):
    """PNG sources feed the pipeline directly — no offline conversion step."""
    from rxtpu.data.synthetic import make_synthetic_dataset

    root = str(tmp_path / "pngdata")
    make_synthetic_dataset(root, ext="png", experiments=("HUVEC-01",),
                           plates=(1,), wells_per_plate=2)
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = ByteStore(idx, root, ext="png", preload=True)
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=2, mode="train",
                    src_size=SRC)
    batch = next(iter(pipe.epoch(0)))
    assert batch["images"].shape == (2, 3, 6, SRC, SRC)
    assert batch["images"].std() > 1.0  # actually decoded content


def test_decode_files_native_matches_buffers(synthetic_root):
    """Streaming file decode == preloaded buffer decode, bit-exact."""
    import glob

    from rxtpu.data.decode import decode_files

    root, _ = synthetic_root
    paths = sorted(glob.glob(os.path.join(root, "train", "*", "*", "*.jpeg")))[:12]
    via_files = decode_files(paths, SRC, SRC, use_native=True)
    bufs = []
    for p in paths:
        with open(p, "rb") as f:
            bufs.append(f.read())
    via_bufs = decode_batch(bufs, SRC, SRC, use_native=True)
    np.testing.assert_array_equal(via_files, via_bufs)
    # missing file zero-fills
    bad = decode_files([paths[0], "/nonexistent/x.jpeg"], SRC, SRC)
    assert bad[1].max() == 0 and np.array_equal(bad[0], via_files[0])


def test_streaming_pipeline_equals_preloaded(synthetic_root):
    """preload=False (native file streaming) yields identical batches."""
    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    pre = ByteStore(idx, root, preload=True)
    lazy = ByteStore(idx, root, preload=False)
    stats = _stats_for(idx)
    kw = dict(batch_size=4, mode="train", src_size=SRC, seed=11)
    a = next(iter(Pipeline(idx, pre, stats, **kw).epoch(2)))
    b = next(iter(Pipeline(idx, lazy, stats, **kw).epoch(2)))
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])


def test_strict_decode_raises():
    from rxtpu.data.decode import decode_batch

    good = encode_batch_jpeg(np.zeros((1, SRC, SRC), np.uint8))[0]
    with pytest.raises(ValueError, match="failed to decode"):
        decode_batch([good, b"\xff\xd8garbage"], SRC, SRC, strict=True)
    # non-strict zero-fills quietly (framework default)
    out = decode_batch([good, b"\xff\xd8garbage"], SRC, SRC, strict=False)
    assert out[1].max() == 0


def test_two_site_train_mode(train_setup):
    """two_site=True: train batches carry G=6 (both sites per view group)."""
    idx, store = train_setup
    pipe = Pipeline(idx, store, _stats_for(idx), batch_size=2, mode="train",
                    src_size=SRC, two_site=True)
    batch = next(iter(pipe.epoch(0)))
    assert batch["images"].shape == (2, 6, 6, SRC, SRC)
    # sites 1 and 2 of the sample are genuinely different images
    assert not np.array_equal(batch["images"][:, 0], batch["images"][:, 1])


def test_rxpack_roundtrip_and_pipeline_equivalence(synthetic_root, tmp_path):
    """Pack contents == decoded JPEGs; pipeline batches identical via pack."""
    from rxtpu.data.pack import PackStore, write_pack

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    pack = write_pack(idx, root, str(tmp_path / "packs"))
    store = PackStore(pack)
    byte_store = ByteStore(idx, root, preload=True)
    # per-view raw equality vs native-decoded JPEG bytes
    r = idx.records[0]
    got = np.asarray(store.get_decoded(r, 1))
    want = decode_batch(byte_store.get(r, 1), SRC, SRC)
    np.testing.assert_array_equal(got, want)
    # full pipeline batch equality (same seed -> same view draws)
    stats = _stats_for(idx)
    kw = dict(batch_size=4, mode="train", src_size=SRC, seed=21)
    a = next(iter(Pipeline(idx, byte_store, stats, **kw).epoch(1)))
    b = next(iter(Pipeline(idx, store, stats, **kw).epoch(1)))
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    # test-mode G=6 also works through the pack
    t = next(iter(Pipeline(idx, store, stats, batch_size=2, mode="test",
                           src_size=SRC).epoch(0)))
    assert t["images"].shape == (2, 6, 6, SRC, SRC)


@pytest.mark.parametrize("codec", ["zlib", "zstd"])
def test_rxpack_compressed(synthetic_root, tmp_path, codec):
    """Compressed pack == raw pack bit-for-bit through every read path."""
    from rxtpu.data.decode import _compress_py, inflate_batch
    from rxtpu.data.pack import PackStore, write_pack

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    raw = write_pack(idx, root, str(tmp_path / "raw"))
    comp = write_pack(idx, root, str(tmp_path / "z"), compress=codec)
    assert os.path.getsize(comp) < os.path.getsize(raw)  # it actually deflates
    rs, cs = PackStore(raw), PackStore(comp)
    assert cs.compress == codec
    # per-view and batch-hook equality, native inflate vs raw memmap
    r = idx.records[0]
    np.testing.assert_array_equal(cs.get_decoded(r, 1), rs.get_decoded(r, 1))
    keys = [(rec, site) for rec in idx.records[:3] for site in (1, 2)]
    np.testing.assert_array_equal(cs.get_decoded_batch(keys),
                                  rs.get_decoded_batch(keys))
    # python fallback == native pool
    got = inflate_batch(cs._mm, cs._offsets[:4], cs._lengths[:4],
                        cs._view_elems, use_native=False, codec=codec)
    want = inflate_batch(cs._mm, cs._offsets[:4], cs._lengths[:4],
                        cs._view_elems, use_native=True, codec=codec)
    np.testing.assert_array_equal(got, want)
    # full pipeline batch equality (same seed -> same view draws)
    stats = _stats_for(idx)
    kw = dict(batch_size=4, mode="train", src_size=SRC, seed=33)
    a = next(iter(Pipeline(idx, rs, stats, **kw).epoch(1)))
    b = next(iter(Pipeline(idx, cs, stats, **kw).epoch(1)))
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
    # fail-loud: a corrupt record must raise, not feed zero planes
    mm = np.array(cs._mm)  # writable copy
    mm[cs._offsets[0]:cs._offsets[0] + 8] = 0xFF
    with pytest.raises(ValueError, match="failed to decompress"):
        inflate_batch(mm, cs._offsets[:1], cs._lengths[:1],
                      cs._view_elems, strict=True, codec=codec)
    # ...and a stream inflating to the WRONG size is a failure, not a
    # silent short write (catches index/format drift)
    blob = np.frombuffer(_compress_py(b"x" * 10, codec, 6), np.uint8)
    with pytest.raises(ValueError, match="failed to decompress"):
        inflate_batch(blob, np.zeros(1, np.int64),
                      np.asarray([len(blob)], np.int64), 99, strict=True,
                      codec=codec)


@pytest.mark.parametrize("codec", ["zlib", "zstd"])
def test_rxpack_png_filtered(synthetic_root, tmp_path, codec):
    """PNG-filtered compressed pack == raw pack bit-for-bit, every path."""
    from rxtpu.data.decode import inflate_unfilter_batch
    from rxtpu.data.pack import PackStore, write_pack

    root, _ = synthetic_root
    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    raw = write_pack(idx, root, str(tmp_path / "raw"))
    zf = write_pack(idx, root, str(tmp_path / "zf"), compress=codec,
                    filter="png")
    rs, fs = PackStore(raw), PackStore(zf)
    assert fs.compress == codec and fs.filter == "png"
    r = idx.records[0]
    np.testing.assert_array_equal(fs.get_decoded(r, 1), rs.get_decoded(r, 1))
    keys = [(rec, site) for rec in idx.records[:3] for site in (1, 2)]
    np.testing.assert_array_equal(fs.get_decoded_batch(keys),
                                  rs.get_decoded_batch(keys))
    # python fallback == native pool on the same streams
    got = inflate_unfilter_batch(fs._mm, fs._offsets[:4], fs._lengths[:4],
                                 6, SRC, SRC, use_native=False, codec=codec)
    want = inflate_unfilter_batch(fs._mm, fs._offsets[:4], fs._lengths[:4],
                                  6, SRC, SRC, use_native=True, codec=codec)
    np.testing.assert_array_equal(got, want)
    # full pipeline batch equality (same seed -> same view draws)
    stats = _stats_for(idx)
    kw = dict(batch_size=4, mode="train", src_size=SRC, seed=33)
    a = next(iter(Pipeline(idx, rs, stats, **kw).epoch(1)))
    b = next(iter(Pipeline(idx, fs, stats, **kw).epoch(1)))
    np.testing.assert_array_equal(a["images"], b["images"])
    # fail-loud: corrupting a stream must raise through strict mode
    mm = np.array(fs._mm)
    mm[fs._offsets[0]:fs._offsets[0] + 8] = 0xFF
    with pytest.raises(ValueError, match="failed to decompress"):
        inflate_unfilter_batch(mm, fs._offsets[:1], fs._lengths[:1],
                               6, SRC, SRC, strict=True, codec=codec)
    # filter requires the compressed container
    with pytest.raises(ValueError, match="filter requires"):
        write_pack(idx, root, str(tmp_path / "bad"), filter="png")


def test_png_filter_oracle_and_ratio():
    """Native filter+deflate == numpy oracle; filtering wins on smooth
    microscopy-like content (the whole point of the pre-filter)."""
    from rxtpu.data.decode import (deflate_filtered_batch, filter_plane_py,
                                   get_native_lib, inflate_unfilter_batch,
                                   unfilter_plane_py)
    from rxtpu.data.synthetic import cells_image

    rng = np.random.default_rng(7)
    # 256^2: large enough for cell structure to dominate the sensor noise
    # (the filter's win grows with size — 1.09x over plain zlib here,
    # 1.34x at the bench's 512^2); tiny planes are all noise and tie
    views = np.stack([
        np.stack([cells_image(rng, 256, s, ch) for ch in range(1, 4)])
        for s in range(2)
    ])
    n, c, h, w = views.shape
    # python filter/unfilter are exact inverses, incl. every filter type
    for plane in (views[0, 0], views[1, 2]):
        filt = filter_plane_py(plane)
        assert set(np.unique(filt[:, 0])) <= {0, 1, 2, 3, 4}
        np.testing.assert_array_equal(unfilter_plane_py(filt), plane)
    with pytest.raises(ValueError, match="corrupt filter id"):
        bad = filter_plane_py(views[0, 0]).copy()
        bad[0, 0] = 9
        unfilter_plane_py(bad)
    # native and python make the same adaptive filter CHOICES (sizes match
    # within noise) — but not necessarily identical bytes: asserting
    # stream identity would couple the test to both paths linking the
    # exact same zlib build (zlib-ng / version skew produce different,
    # equally-valid streams). Cross-decode below is the real invariant.
    bn = deflate_filtered_batch(views, use_native=True)
    bp = deflate_filtered_batch(views, use_native=False)
    assert abs(sum(map(len, bn)) - sum(map(len, bp))) \
        <= 0.02 * sum(map(len, bp))
    # cross-decode: each path decodes BOTH paths' streams back to the input
    for blobs in (bn, bp):
        data = np.frombuffer(b"".join(blobs), np.uint8)
        lengths = np.asarray([len(b) for b in blobs], np.int64)
        offsets = np.zeros(n, np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        for use_native in (True, False):
            out = inflate_unfilter_batch(data, offsets, lengths, c, h, w,
                                         use_native=use_native)
            np.testing.assert_array_equal(out, views)
    if get_native_lib() is None:
        pytest.skip("native lib unavailable; oracle equality already checked")
    # the filter buys real ratio on smooth content vs plain zlib
    plain = deflate_filtered_batch(views, use_filter=False)
    assert sum(map(len, bn)) < 0.95 * sum(map(len, plain))
