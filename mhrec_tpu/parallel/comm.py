"""Host-level communication & shared-memory utilities.

TPU-native counterparts of the reference comm layer
(``REC/data/comm.py`` + ``REC/data/shareables.py``):

* cross-host picklable broadcast / all-gather — the reference uses a gloo
  process group (comm.py:119-187); here ``jax.experimental.multihost_utils``
  carries small metadata across hosts, with single-process fast paths;
* ``SharedArray`` — POSIX shared-memory numpy arrays for multiple *local*
  processes (reference ``SharedList``, shareables.py:94-173). With JAX's
  one-process-per-host model there are usually no local siblings, so this is
  provided for launcher setups that still fork per-chip workers.
"""

from __future__ import annotations

import pickle
from multiprocessing import shared_memory
from typing import Any, List, Optional

import numpy as np


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from ``root`` to every host."""
    import jax

    if jax.process_count() <= 1:
        return obj
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if jax.process_index() == root else b""
    arr = np.frombuffer(payload.ljust(_gathered_len(len(payload)), b"\0"), np.uint8)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=jax.process_index() == root)
    return pickle.loads(bytes(np.asarray(out)).rstrip(b"\0"))


def _gathered_len(n: int) -> int:
    # fixed-size buffer for the collective; small metadata only
    return max(1 << (max(n, 1) - 1).bit_length(), 1024)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per host; returns a list per host order."""
    import jax

    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj)
    n = len(payload)
    lens = multihost_utils.process_allgather(np.asarray([n], np.int64))
    width = int(lens.max())
    buf = np.frombuffer(payload.ljust(width, b"\0"), np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(bytes(gathered[i][: int(lens[i])])))
    return out


def sync_hosts(name: str = "barrier"):
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


class SharedArray:
    """A numpy array in POSIX shared memory, attachable by sibling processes
    on the same machine by name (reference SharedList equivalent for the
    dense-array case — our flat interaction storage is arrays, not pickled
    object lists, so zero-copy attach needs no serialization)."""

    def __init__(self, array: Optional[np.ndarray] = None, name: Optional[str] = None,
                 shape=None, dtype=None):
        if array is not None:
            self._shm = shared_memory.SharedMemory(create=True, size=array.nbytes)
            self.array = np.ndarray(array.shape, array.dtype, buffer=self._shm.buf)
            self.array[...] = array
            self.owner = True
        else:
            assert name and shape is not None and dtype is not None
            self._shm = shared_memory.SharedMemory(name=name)
            self.array = np.ndarray(shape, dtype, buffer=self._shm.buf)
            self.owner = False

    @property
    def name(self) -> str:
        return self._shm.name

    def handle(self):
        """(name, shape, dtype-str) tuple to send to sibling processes."""
        return (self._shm.name, self.array.shape, str(self.array.dtype))

    @classmethod
    def attach(cls, handle) -> "SharedArray":
        name, shape, dtype = handle
        return cls(name=name, shape=tuple(shape), dtype=np.dtype(dtype))

    def close(self, unlink: Optional[bool] = None):
        self._shm.close()
        if self.owner if unlink is None else unlink:
            try:
                self._shm.unlink()
            except FileNotFoundError:
                pass
