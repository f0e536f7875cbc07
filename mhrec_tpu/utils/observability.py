"""TensorBoard, device-memory reporting, profiler hooks, and eval dumps.

Counterparts of the reference observability surface:
* ``get_tensorboard`` (utils/utils.py:161-203) — tensorboardX writer named
  after the log file;
* ``get_gpu_usage`` (utils/utils.py:205-217) → ``get_device_usage`` reports
  TPU HBM via ``device.memory_stats()``;
* phase timing in the fit loop is built into the Trainer; deep profiling
  uses ``jax.profiler`` traces (``profile_trace``);
* ``save_log_dict`` / ``load_log_dict`` (utils/utils.py:220-291) — per-user
  top-K recommendation dumps with head provenance;
* ``save_for_eval`` npz export of scores/embeddings (trainer.py:904-966).
"""

from __future__ import annotations

import contextlib
import gzip
import json
import logging
import os
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def get_tensorboard(config):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None
    base = config["log_file"] if "log_file" in config.keys() else None
    name = os.path.splitext(os.path.basename(base))[0] if base else "run"
    log_dir = os.path.join(config["checkpoint_dir"] or "./saved", "tensorboard", name)
    os.makedirs(log_dir, exist_ok=True)
    return SummaryWriter(log_dir)


def get_device_usage() -> str:
    import jax

    parts = []
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            parts.append(f"{d.device_kind}: {used:.2f}/{limit:.2f} GiB")
    return "; ".join(parts) or "no device memory stats"


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context; view with tensorboard/xprof."""
    import jax

    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_log_dict(path: str, log_dict: Dict[str, np.ndarray]):
    """Per-user eval dump: npz for arrays + gzip json for metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in log_dict.items()
              if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    meta = {k: v for k, v in log_dict.items() if k not in arrays}
    np.savez_compressed(path + ".npz", **arrays)
    with gzip.open(path + ".json.gz", "wt") as fh:
        json.dump(meta, fh)


def load_log_dict(path: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    npz = path + ".npz"
    if os.path.isfile(npz):
        with np.load(npz, allow_pickle=False) as data:
            out.update({k: data[k] for k in data.files})
    meta = path + ".json.gz"
    if os.path.isfile(meta):
        with gzip.open(meta, "rt") as fh:
            out.update(json.load(fh))
    return out


def save_eval_chunk(
    out_dir: str, chunk_idx: int, *, user_ids, topk_values, topk_indices,
    user_embs=None, head_embs=None,
):
    """save_for_eval export path (reference trainer.py:939-966)."""
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "user_ids": np.asarray(user_ids),
        "topk_values": np.asarray(topk_values),
        "topk_indices": np.asarray(topk_indices),
    }
    if user_embs is not None:
        payload["user_embs"] = np.asarray(user_embs)
    if head_embs is not None:
        payload["head_embs"] = np.asarray(head_embs)
    np.savez_compressed(os.path.join(out_dir, f"eval_chunk_{chunk_idx:05d}.npz"), **payload)
