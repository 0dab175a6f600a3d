"""Double-buffered host->device frame feed (SURVEY.md §7.3.7, P3).

BASELINE.json:5 mandates "double-buffered host I/O so the optimize/match
loop never leaves HBM": frame t+1 decodes on a background thread and
uploads (async `jax.device_put`) while frame t computes. On 2-CPU hosts the
PNG decode is the bottleneck; the thread pool + depth-2 queue hides it.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class Prefetcher:
    """Wrap a host frame iterator with decode-ahead + async device upload."""

    def __init__(
        self,
        frames: Iterator,
        depth: int = 2,
        transform: Optional[Callable] = None,
        device=None,
        upload: bool = True,
    ):
        """upload=False skips the device_put and yields host f32 arrays —
        used by the chunked VO path, which stacks a whole chunk and uploads
        it as one block instead of per-frame."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._transform = transform
        self._upload = upload
        self._device = device or (jax.devices()[0] if upload else None)
        self._done = object()
        self._thread = threading.Thread(
            target=self._worker, args=(frames,), daemon=True
        )
        self._thread.start()

    def _worker(self, frames):
        from laneslam.runtime.host_preproc import to_f32

        try:
            for item in frames:
                if self._transform is not None:
                    item = self._transform(item)
                # Native u8 -> f32 convert (runtime/_preproc.cpp) before the
                # DMA, so the device receives compute-ready frames and the
                # convert never runs on-chip.
                item = jax.tree_util.tree_map(
                    lambda x: to_f32(x)
                    if isinstance(x, np.ndarray) and x.dtype == np.uint8
                    else x,
                    item,
                )
                # Async upload: device_put returns immediately; the transfer
                # overlaps with the consumer's compute.
                if self._upload:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(np.asarray(x), self._device)
                        if isinstance(x, np.ndarray)
                        else x,
                        item,
                    )
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            # A decode/IO failure must abort the RUN, not silently truncate
            # the sequence (a truncated run would still report ATE/fps over
            # the partial trajectory as if it completed).
            self._q.put(_PrefetchError(e))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            if isinstance(item, _PrefetchError):
                raise RuntimeError("prefetch worker failed") from item.exc
            yield item


class _PrefetchError:
    """Exception container shuttled through the queue to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class ChunkPrefetcher:
    """Batch-decoded chunk feed for the fused chunk path (VERDICT r3 #9).

    Yields (n<=chunk, H, W) uint8 blocks decoded by the native C++ thread
    pool (runtime/_imageio.cpp png_decode_batch): block k+1 decodes on the
    background thread while the consumer's device compute runs on block k.
    Blocks land in a ring of preallocated buffers — one allocation for the
    whole run (BASELINE.json:5 double-buffered host I/O). The consumer gets
    each block as ONE contiguous array, matching process_chunk's one-upload-
    per-chunk contract.
    """

    def __init__(self, paths, chunk: int, depth: int = 2):
        from laneslam.runtime.imageio import decode_batch_gray, peek_size

        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._paths = list(paths)
        self._chunk = max(int(chunk), 1)
        # Ring must exceed queue depth: the consumer may still hold the
        # oldest block while `depth` more are queued and one is decoding.
        self._nslots = depth + 2
        self._decode = decode_batch_gray
        self._peek = peek_size
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            if not self._paths:
                return
            size = self._peek(self._paths[0])
            if size is None:
                from laneslam.runtime.imageio import _cv2_imread_gray

                size = _cv2_imread_gray(self._paths[0]).shape
            ring = [
                np.empty((self._chunk, *size), np.uint8)
                for _ in range(self._nslots)
            ]
            for k, s in enumerate(range(0, len(self._paths), self._chunk)):
                batch = self._paths[s: s + self._chunk]
                slot = ring[k % self._nslots]
                out = self._decode(batch, out=slot[: len(batch)])
                self._q.put(out)
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            self._q.put(_PrefetchError(e))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            if isinstance(item, _PrefetchError):
                raise RuntimeError("chunk prefetch worker failed") from item.exc
            yield item
