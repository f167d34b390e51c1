"""Host->device feeding utilities.

``prefetch_to_device`` double-buffers batches onto the accelerator
(optionally sharded over a mesh) so host IO/augmentation, the PCIe/
tunnel transfer, and the device step overlap — the TPU-native
replacement for the reference's synchronous keras Sequence feeding
(SURVEY.md §2.3 intra-host IO row).
"""

import collections
import queue
import threading

import jax
import numpy as np


def prefetch_to_device(iterator, size=2, sharding=None):
    """Yield device-resident batches, keeping ``size`` in flight.

    Args:
        iterator: yields numpy pytrees (e.g. (img, labels) tuples).
        size: number of batches resident ahead of the consumer.
        sharding: optional jax.sharding.Sharding for each array leaf
            (e.g. batch_sharding(mesh)); default: jax's default device.

    Yields:
        the same pytrees with leaves as device arrays.
    """
    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(np.asarray(a), sharding),
                batch)
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.asarray(a)), batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def threaded_prefetch(make_iterator, size=2):
    """Run a host iterator in a background thread with a bounded
    queue (host-side overlap; compose with prefetch_to_device for the
    transfer overlap).

    Cancellation-safe: if the consumer abandons the generator
    mid-epoch (exception in the train step, early break), the producer
    notices via a stop event instead of blocking forever on the full
    queue. Producer exceptions re-raise in the consumer.
    """
    q = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()

    def producer():
        try:
            for item in make_iterator():
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(sentinel)
        except BaseException as exc:      # surface in the consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
