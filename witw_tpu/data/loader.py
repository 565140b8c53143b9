"""Host-side input pipeline: decode + resize + batch + prefetch.

The reference decodes with skimage inside torch DataLoader worker processes
and runs *all* transforms there per-sample, including the polar transform —
its main bottleneck (SURVEY.md §2.1). Here the host does only what a TPU
can't: file decode and the resize to canonical geometry; everything else
(crop/normalize/polar/rotation) runs on-device inside the jitted step
(witw_tpu.train.pipeline). A thread pool overlaps decode with device compute
and a small queue provides prefetch.

Decode stack: imageio (TIFF/multiband) with PIL fallback; resize via cv2
INTER_LINEAR (same half-pixel convention as torchvision's bilinear resize
with antialias off, used throughout the reference).
"""

from __future__ import annotations

import concurrent.futures as futures
import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np



def decode_image(path: str) -> np.ndarray:
    """Read an image file to HWC float32 (0-255 scale kept).

    cv2 (SIMD jpeg/png decode) for standard formats; imageio/PIL for
    TIFF/multiband."""
    ext = os.path.splitext(path)[1].lower()
    arr = None
    if ext not in (".tif", ".tiff"):
        try:
            import cv2

            cv2.setNumThreads(1)
            arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if arr is not None:
                if arr.ndim == 3 and arr.shape[2] == 3:
                    arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
                elif arr.ndim == 3 and arr.shape[2] == 4:
                    arr = cv2.cvtColor(arr, cv2.COLOR_BGRA2RGBA)
        except Exception:
            arr = None
    if arr is None:
        try:
            import imageio.v3 as iio

            arr = np.asarray(iio.imread(path))
        except Exception:
            from PIL import Image

            with Image.open(path) as im:
                arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr.astype(np.float32)


def resize_host(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """cv2 bilinear resize (HWC), channel-count agnostic."""
    if img.shape[0] == height and img.shape[1] == width:
        return img
    import cv2

    c = img.shape[2]
    if c <= 4:
        out = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
        if out.ndim == 2:
            out = out[..., None]
        return out
    chans = [
        cv2.resize(img[..., i], (width, height), interpolation=cv2.INTER_LINEAR)
        for i in range(c)
    ]
    return np.stack(chans, axis=-1)


def _decode_pair(args):
    """Worker-side decode+resize of one pair. Module-level so the process
    pool pickles only this small args tuple per item — NOT the loader object
    (whose pairs list can be hundreds of MB)."""
    pair, surface_hw, overhead_hw, channels, dtype, skip_errors = args
    try:
        surface = decode_image(pair[0])
        overhead = decode_image(pair[1])
    except Exception:
        if not skip_errors:
            raise
        surface = np.zeros((*surface_hw, channels), np.float32)
        overhead = np.zeros((*overhead_hw, channels), np.float32)
    surface = resize_host(surface, *surface_hw)
    overhead = resize_host(overhead, *overhead_hw)
    surface = _fix_channels(surface, channels)
    overhead = _fix_channels(overhead, channels)
    if dtype == np.uint8:
        surface = np.clip(np.round(surface), 0, 255).astype(np.uint8)
        overhead = np.clip(np.round(overhead), 0, 255).astype(np.uint8)
    else:
        surface = surface.astype(dtype)
        overhead = overhead.astype(dtype)
    return surface, overhead


class PairLoader:
    """Iterates host batches {'surface': [B,H,W,C], 'overhead': [B,S,S,C]}.

    surface_hw / overhead_hw define the canonical decoded geometry shipped to
    the device. Epoch shuffling is seeded; drop_last mirrors the reference's
    training loader (cvig_fov.py:402). The worker pool is created once and
    persists across epochs (no per-epoch worker spawn/re-pickle); call
    ``close()`` (or rely on interpreter exit) to shut it down.
    """

    def __init__(
        self,
        pairs: Sequence[Tuple[str, str]],
        batch_size: int,
        surface_hw: Tuple[int, int],
        overhead_hw: Tuple[int, int],
        channels: int = 3,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 2,
        dtype=np.uint8,
        worker_mode: Optional[str] = None,
        skip_errors: bool = False,
    ):
        """``dtype=uint8`` (default) quarters pickle + host->device traffic —
        the device pipeline upcasts anyway. ``worker_mode``: 'process'
        (default on multi-core hosts; image decode in CPython is GIL-bound so
        threads don't scale) or 'thread'. ``skip_errors`` substitutes a zero
        image for unreadable files instead of raising (long-running jobs on
        scraped data shouldn't die on one corrupt download)."""
        self.pairs = list(pairs)
        self.batch_size = batch_size
        self.surface_hw = surface_hw
        self.overhead_hw = overhead_hw
        self.channels = channels
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.dtype = dtype
        if worker_mode is None:
            worker_mode = "process" if (os.cpu_count() or 1) > 2 else "thread"
        self.worker_mode = worker_mode
        self.skip_errors = skip_errors
        self.epoch = 0
        self._pool: Optional[futures.Executor] = None

    def __len__(self) -> int:
        n = len(self.pairs)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _get_pool(self) -> futures.Executor:
        """Worker pool, created once and reused across epochs."""
        if self._pool is None:
            pool_cls = (
                futures.ProcessPoolExecutor
                if self.worker_mode == "process"
                else futures.ThreadPoolExecutor
            )
            self._pool = pool_cls(self.num_workers)
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _decode_args(self, pair: Tuple[str, str]):
        return (pair, self.surface_hw, self.overhead_hw, self.channels,
                self.dtype, self.skip_errors)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.pairs))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        self.epoch += 1

        batches: List[List[int]] = []
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                continue
            batches.append(list(idx))

        out_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = self._get_pool()  # persistent across epochs

        def producer():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    args = [self._decode_args(self.pairs[i]) for i in batch_idx]
                    if self.worker_mode == "process":
                        items = list(
                            pool.map(
                                _decode_pair, args,
                                chunksize=max(1, len(args) // self.num_workers),
                            )
                        )
                    else:
                        items = list(pool.map(_decode_pair, args))
                    surface = np.stack([s for s, _ in items])
                    overhead = np.stack([o for _, o in items])
                    out_q.put(
                        {
                            "surface": surface,
                            "overhead": overhead,
                            "idx": np.asarray(batch_idx, np.int32),
                        }
                    )
            except BaseException as err:  # propagate to the consumer
                if isinstance(err, futures.BrokenExecutor):
                    # A dead worker (segfault/OOM-kill) breaks the executor
                    # permanently; drop it so the next epoch gets a fresh
                    # pool instead of failing forever.
                    self.close()
                out_q.put(err)
                return
            out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so a blocked producer can observe the stop flag.
            while not out_q.empty():
                out_q.get_nowait()


_DONE = object()


def prefetch_iter(it: Iterator, depth: int = 2) -> Iterator:
    """Consume ``it`` in a daemon producer thread, yielding its items through
    a bounded queue so production overlaps consumption — the generic double-
    buffer used to overlap host-side work (tile extraction, file decode) with
    blocking device dispatch+fetch (heatmap.sweep; same producer/queue/
    exception-propagation pattern as PairLoader.__iter__). ``depth`` bounds
    the number of produced-but-unconsumed items resident at once; ``depth=0``
    returns ``it`` unchanged (the serial path, for A/B tests)."""
    if depth <= 0:
        return it

    out_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for item in it:
                if stop.is_set():
                    return
                out_q.put(item)
        except BaseException as err:  # propagate to the consumer
            out_q.put(err)
            return
        out_q.put(_DONE)

    def consume():
        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is _DONE:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # Drain so a blocked producer can observe the stop flag.
            while not out_q.empty():
                out_q.get_nowait()

    return consume()


def _fix_channels(img: np.ndarray, channels: int) -> np.ndarray:
    c = img.shape[2]
    if c == channels:
        return img
    if c == 1:
        return np.repeat(img, channels, axis=2)
    if c > channels:
        return img[..., :channels]
    pad = np.zeros((*img.shape[:2], channels - c), img.dtype)
    return np.concatenate([img, pad], axis=2)


def split_train_val(
    pairs: Sequence[Tuple[str, str]], val_quantity: int, seed: int = 0
) -> Tuple[List, List]:
    """Random train/val split (reference torch.utils.data.random_split,
    cvig_fov.py:401), seeded."""
    order = np.arange(len(pairs))
    np.random.default_rng(seed).shuffle(order)
    val_idx = set(order[:val_quantity].tolist())
    train = [p for i, p in enumerate(pairs) if i not in val_idx]
    val = [p for i, p in enumerate(pairs) if i in val_idx]
    return train, val
