"""Host-side batch prefetching.

Packing a flagship batch (ragged -> padded copies of ~1 GB of features) costs
several times the TPU step itself, so the train loops overlap it with
compute: a producer thread packs and `device_put`s batches into a bounded
queue while the consumer runs the jitted step (the TPU-native replacement for
the reference's DataLoader worker processes, reference
tools/train_vidvrd.py:105-112).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax

_SENTINEL = object()


def _on_axon() -> bool:
    """True when the TPU is reached through the axon PJRT tunnel.

    The plugin registers its platform as plain "tpu", so the backend name
    cannot distinguish it; the profile/config platform selection can."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "axon":
        return True
    try:
        return "axon" in (jax.config.jax_platforms or "")
    except Exception:
        return False


def prefetch(iterable: Iterable, size: int = 2,
             device_put: bool = True) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``size`` items ahead.

    Exceptions in the producer are re-raised in the consumer.  With
    ``device_put``, array leaves are transferred to the default device as
    they are enqueued so the H2D copy also overlaps compute.

    On the axon TPU backend the producer-thread ``device_put`` is forced
    off: transfers issued off the main thread serialize against the tunnel
    and stall the whole pipeline (measured 41 s -> 916 s on a 64-video
    eval).  Packing still overlaps; the H2D copy happens at consumer use.
    """
    if device_put and _on_axon():
        device_put = False
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def producer():
        try:
            for item in iterable:
                if device_put:
                    item = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x)
                        if hasattr(x, "shape") else x, item)
                while not stop.is_set():
                    try:
                        q.put(("ok", item), timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put(("err", e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            kind, item = q.get()
            if kind is _SENTINEL:
                return
            if kind == "err":
                raise item
            yield item
    finally:
        # consumer abandoned the generator (exception/break mid-epoch):
        # release the producer — otherwise it blocks on q.put forever,
        # pinning GB-scale packed batches and the dataset iterator
        stop.set()
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
