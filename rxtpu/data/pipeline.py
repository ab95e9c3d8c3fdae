"""Host input pipeline: byte cache -> native batch decode -> prefetched batches.

Rebuilds the capability of the reference ``ImagesDS`` + ``DataLoader``
stack (``cell_classifier/dataloader.py``, ``train.py:28-35``) TPU-style:

- ``ByteStore`` keeps the whole split's *compressed* JPEG buffers in RAM,
  exactly like ``ImagesDS._load_imgs`` (``dataloader.py:55-109``), or reads
  lazily from disk when ``preload=False`` (removing the tens-of-GB RAM
  assumption, SURVEY.md §2 quirk 4).
- Sample assembly parity: train/val draws one random site for the image,
  the B02 negative control and a random positive-control well
  (``dataloader.py:153-173``); test stacks both sites of each for the
  G=6 two-site TTA layout ``[img_s1, img_s2, neg_s1, neg_s2, pos_s1,
  pos_s2]`` (``dataloader.py:182-207``).
- The batch that leaves the host is RAW uint8 channel planes
  ``[B, G, 6, H, W]`` plus per-sample experiment mean/std; all geometric
  augmentation and normalization run on device (``rxtpu.ops``), so host
  work is just decode + memcpy — the reference instead burns CPU workers
  on albumentations.
- A background thread decodes ahead into a bounded queue
  (``prefetch_depth``), and ``device_prefetch`` keeps the next batch's
  host->device copy in flight while the current step runs (double
  buffering).
- Reproducibility: all random draws come from a generator seeded by
  (seed, epoch), independent of thread timing.

Batches are padded to a static shape with a ``valid`` mask so every step
hits the same compiled XLA program (no dynamic shapes).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rxtpu.data.decode import decode_batch, decode_files
from rxtpu.data.records import (
    MetadataIndex,
    WellRecord,
    all_records,
    image_path,
)
from rxtpu.data.stats import stats_table


class ByteStore:
    """Compressed-buffer store for one split's samples + controls."""

    def __init__(
        self,
        index: MetadataIndex,
        img_dir: str,
        ext: str = "jpeg",
        channels: Sequence[int] = (1, 2, 3, 4, 5, 6),
        preload: bool = True,
        verbose: bool = False,
    ):
        self.index = index
        self.img_dir = img_dir
        self.ext = ext
        self.channels = tuple(channels)
        self._cache: Dict[Tuple[str, int, str, int], List[bytes]] = {}
        if preload:
            records = all_records(index)
            it = records
            if verbose:
                from tqdm import tqdm

                it = tqdm(records, desc=f"Preloading {index.split} bytes")
            for r in it:
                for site in (1, 2):
                    self._cache[(r.experiment, r.plate, r.well, site)] = self._read(r, site)

    def _read(self, r: WellRecord, site: int) -> List[bytes]:
        bufs = []
        for ch in self.channels:
            p = image_path(self.img_dir, self.index.split, r.experiment, r.plate, r.well, site, ch, self.ext)
            with open(p, "rb") as f:
                bufs.append(f.read())
        return bufs

    def get(self, r: WellRecord, site: int) -> List[bytes]:
        key = (r.experiment, r.plate, r.well, site)
        cached = self._cache.get(key)
        if cached is None:
            return self._read(r, site)
        return cached

    def paths(self, r: WellRecord, site: int) -> List[str]:
        return [
            image_path(self.img_dir, self.index.split, r.experiment, r.plate,
                       r.well, site, ch, self.ext)
            for ch in self.channels
        ]

    @property
    def preloaded(self) -> bool:
        return bool(self._cache)


class Pipeline:
    """Batched sample-assembly pipeline over a MetadataIndex.

    mode 'train'/'val': G=3 views [img, neg, pos] with random sites;
    mode 'test': G=6 views (both sites of each).
    ``two_site=True`` makes train/val also use BOTH sites per view group
    (G=6) so training sees the same two-site averaging as inference
    (BASELINE config 3 "two-site training").
    """

    def __init__(
        self,
        index: MetadataIndex,
        store: ByteStore,
        stats: Dict[str, Dict[str, np.ndarray]],
        batch_size: int,
        mode: str,
        src_size: int = 512,
        seed: int = 0,
        shuffle: Optional[bool] = None,
        drop_last: Optional[bool] = None,
        decoder_threads: int = 0,
        use_native: bool = True,
        prefetch_depth: int = 2,
        two_site: bool = False,
        num_hosts: int = 1,
        host_id: int = 0,
    ):
        assert mode in ("train", "val", "test")
        assert 0 <= host_id < num_hosts, (host_id, num_hosts)
        assert batch_size % num_hosts == 0, (batch_size, num_hosts)
        self.index = index
        self.store = store
        self.batch_size = batch_size
        self.mode = mode
        self.src_size = src_size
        self.seed = seed
        self.shuffle = shuffle if shuffle is not None else (mode == "train")
        self.drop_last = drop_last if drop_last is not None else (mode == "train")
        self.decoder_threads = decoder_threads
        self.use_native = use_native
        self.prefetch_depth = prefetch_depth
        self.n_channels = len(store.channels)
        exps = sorted(stats.keys())
        missing = {r.experiment for r in index.records} - set(exps)
        if missing:
            raise ValueError(
                f"stats artifact lacks experiments {sorted(missing)}; "
                "regenerate it with `python -m rxtpu.tools stats`"
            )
        self._exp_index = {e: i for i, e in enumerate(exps)}
        self._mean_table, self._std_table = stats_table(stats, exps)
        self.two_site = two_site
        self.G = 6 if (mode == "test" or two_site) else 3
        # multi-host SPMD input: every host computes the identical global
        # epoch order and decodes only its contiguous rows of each batch
        # (SURVEY §5; see rxtpu.parallel.multihost). Per-sample randomness is
        # keyed by (seed, epoch, global stream position) so a sample's view
        # draws are identical no matter how many hosts feed — sliced input
        # is bit-identical to the single-host global batch.
        self.num_hosts = num_hosts
        self.host_id = host_id

    def __len__(self) -> int:
        n = len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def steps_per_epoch(self) -> int:
        return len(self)

    # -- assembly ----------------------------------------------------------

    def _view_keys(self, r: WellRecord, rng: np.random.Generator):
        """The G (record, site) pairs for one sample, in view order."""
        neg, pos = self.index.control_views(r.experiment, r.plate, _NpRandom(rng))
        if self.mode in ("train", "val") and not self.two_site:
            # independent random site per view (dataloader.py:156,161,169)
            return [
                (r, int(rng.integers(1, 3))),
                (neg, int(rng.integers(1, 3))),
                (pos, int(rng.integers(1, 3))),
            ]
        return [(r, 1), (r, 2), (neg, 1), (neg, 2), (pos, 1), (pos, 2)]

    def _sample_rng(self, epoch: int, stream_pos: int) -> np.random.Generator:
        """Per-sample generator keyed by global stream position.

        Independent of host count and decode order: host h drawing for
        global row j gets the same stream as a single host would.
        """
        return np.random.default_rng(
            np.random.SeedSequence((self.seed, 0x5EED, epoch, stream_pos))
        )

    def _make_batch(
        self, recs: List[WellRecord], epoch: int, row0: int
    ) -> Dict[str, np.ndarray]:
        """Assemble this host's rows [lo, hi) of one global batch.

        ``recs`` is the batch's full (unpadded) global record list; ``row0``
        its epoch stream offset. Single-host degenerates to the whole batch.
        """
        g, c, s = self.G, self.n_channels, self.src_size
        lo, hi = self._host_rows()
        bs = hi - lo
        n_real = len(recs)
        # three source modes: decoded fast path (rxpack memmap, no decode at
        # all), streaming (file paths into the native open/read/decode
        # thread pool), preloaded (cached compressed buffers -> native decode)
        decoded = hasattr(self.store, "get_decoded")
        streaming = not decoded and not self.store.preloaded
        items: List = []
        view_lists = []
        labels = np.zeros(bs, np.int32)
        exp_ids = np.zeros(bs, np.int32)
        valid = np.zeros(bs, np.float32)
        # id_codes span the GLOBAL batch on every host (a host-side python
        # list, never device-put): the prediction path keeps/aligns rows by
        # id without reading back the sharded `valid` array on a pod
        id_codes: List[str] = [
            recs[i].id_code if i < n_real else ""
            for i in range(self.batch_size)
        ]
        for k, i in enumerate(range(lo, hi)):
            r = recs[i] if i < n_real else recs[0]  # pad with sample 0, masked
            keys = self._view_keys(r, self._sample_rng(epoch, row0 + i))
            if decoded:
                view_lists.append(keys)
            else:
                for rec, site in keys:
                    if streaming:
                        items.extend(self.store.paths(rec, site))
                    else:
                        items.extend(self.store.get(rec, site))
            labels[k] = r.sirna
            exp_ids[k] = self._exp_index[r.experiment]
            valid[k] = 1.0 if i < n_real else 0.0
        if decoded:
            if hasattr(self.store, "get_decoded_batch"):
                # one call for the whole batch: compressed packs inflate
                # in the native thread pool; raw packs memcpy
                flat = [k for keys in view_lists for k in keys]
                images = self.store.get_decoded_batch(
                    flat, nthreads=self.decoder_threads
                ).reshape(bs, g, c, s, s)
            else:
                images = np.empty((bs, g, c, s, s), np.uint8)
                for i, keys in enumerate(view_lists):
                    for gi, (rec, site) in enumerate(keys):
                        images[i, gi] = self.store.get_decoded(rec, site)
        else:
            # strict: corrupt/missing files must fail loudly (the reference
            # crashes on them; silent all-zero planes would poison training)
            if streaming:
                planes = decode_files(
                    items, s, s, nthreads=self.decoder_threads,
                    use_native=self.use_native, strict=True,
                )
            else:
                planes = decode_batch(
                    items, s, s, nthreads=self.decoder_threads,
                    use_native=self.use_native, strict=True,
                )
            images = planes.reshape(bs, g, c, s, s)
        return {
            "images": images,
            "labels": labels,
            "mean": self._mean_table[exp_ids],
            "std": self._std_table[exp_ids],
            "valid": valid,
            "id_codes": id_codes,
        }

    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.index)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng((self.seed * 1000003 + epoch) & 0x7FFFFFFF)
        return rng.permutation(n)

    def _host_rows(self):
        # the sharding contract lives in one place: parallel.multihost
        from rxtpu.parallel.multihost import host_shard_bounds

        return host_shard_bounds(self.batch_size, self.num_hosts, self.host_id)

    def epoch(self, epoch: int = 0,
              start_batch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield this host's batch slices, decoded ahead by a background thread.

        ``start_batch`` skips the first batches of the (deterministic)
        epoch order without decoding them — mid-epoch resume after a
        preemption replays the exact remaining stream.
        """
        order = self._order(epoch)
        n_batches = len(self)
        batches_recs = [
            [self.index.records[j] for j in order[i * self.batch_size : (i + 1) * self.batch_size]]
            for i in range(n_batches)
        ]

        q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch_depth))
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that re-checks stop: an abandoned consumer must
            # not leave the producer blocked forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for bi in range(start_batch, n_batches):
                    if stop.is_set():
                        return
                    # row0 stays the ABSOLUTE epoch stream offset so the
                    # per-sample RNG draws are identical whether the epoch
                    # starts from 0 or resumes mid-way
                    if not put_or_stop(
                        self._make_batch(batches_recs[bi], epoch,
                                         bi * self.batch_size)
                    ):
                        return
                put_or_stop(None)
            except BaseException as e:  # surface worker errors to the consumer
                put_or_stop(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class _NpRandom:
    """Adapter: numpy Generator -> the tiny random.Random surface records.py uses."""

    def __init__(self, rng: np.random.Generator):
        self._rng = rng

    def randrange(self, n: int) -> int:
        return int(self._rng.integers(0, n))


def double_buffer(host_iter: Iterator, put_fn):
    """Yield ``put_fn(batch)`` one batch AHEAD of consumption.

    device_put / make_array_from_process_local_data are async: by putting
    batch k+1 before yielding batch k, the host->device copy overlaps the
    model step. The single buffering policy shared by device_prefetch,
    sharded_prefetch and multihost_prefetch.
    """
    prev = None
    for batch in host_iter:
        cur = put_fn(batch)
        if prev is not None:
            yield prev
        prev = cur
    if prev is not None:
        yield prev


def device_prefetch(host_iter: Iterator[Dict[str, np.ndarray]], device=None):
    """Keep one batch's host->device transfer in flight ahead of consumption.

    Non-array entries (id_codes) pass through on host.
    """
    import jax

    def put(b):
        return {
            k: jax.device_put(v, device) if isinstance(v, np.ndarray) else v
            for k, v in b.items()
        }

    return double_buffer(host_iter, put)
