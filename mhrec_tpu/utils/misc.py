"""Misc utilities: seeding, early stopping, model registry.

Behavior parity with reference ``REC/utils/utils.py``:
* ``early_stopping`` (utils.py:60-102) — best-score tracking with patience.
* ``calculate_valid_score`` (utils.py:104-125) — keyed by
  ``pred_{eval_pred_len-1}`` result dict.
* ``init_seed`` (utils.py:140-158) — numpy/python seeding; JAX PRNG keys are
  threaded explicitly so there is no global framework RNG to seed.
* ``get_model`` (utils.py:38-57) — resolve model class by name.
"""

from __future__ import annotations

import importlib
import random
from typing import Any, Dict, Optional, Tuple

import numpy as np


def init_seed(
    seed: int, reproducibility: bool = True, prng_impl: Optional[str] = None
) -> None:
    """Seed host RNGs and optionally select the JAX PRNG implementation.

    ``prng_impl='rbg'`` swaps threefry bit generation for the TPU-native
    RBG (measured ~5% faster end-to-end on the dropout-heavy HSTU size4
    step); keys derive via threefry so split/fold_in stay well-mixed. Must
    run before any ``jax.random.PRNGKey`` is created for full effect.
    """
    random.seed(seed)
    np.random.seed(seed)
    if prng_impl:
        import jax

        jax.config.update("jax_default_prng_impl", prng_impl)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache (default-on framework
    feature; the reference has no equivalent — torch eager needs none, but
    under XLA every fresh process otherwise re-pays the 20-40 s protocol
    compiles: ``val_only`` reruns, resumed runs, bench tools).

    ``cache_dir``: explicit directory, or None for
    ``$MHREC_COMPILE_CACHE`` → ``~/.cache/mhrec_tpu/xla``. Pass the config
    value of ``compilation_cache_dir``; set ``compilation_cache: false`` in
    config to skip calling this. Returns the directory actually enabled, or
    None when the cache could not be set up (soft failure — compilation
    still works, just uncached).
    """
    import os

    path = (
        cache_dir
        or os.environ.get("MHREC_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "mhrec_tpu", "xla"
        )
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took >=1 s to compile regardless of size —
        # the default floats a min-entry-size gate that skips small-but-
        # slow-to-compile TPU executables
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return path
    except Exception:  # pragma: no cover - depends on jax build/filesystem
        return None


def get_model(model_name: str):
    """Resolve a model class by name from models.idnet then models.hllm."""
    for pkg in ("mhrec_tpu.models.idnet", "mhrec_tpu.models.hllm"):
        try:
            module = importlib.import_module(f"{pkg}.{model_name.lower()}")
        except ImportError:
            continue
        if hasattr(module, model_name):
            return getattr(module, model_name)
    raise ValueError(f"Model {model_name!r} not found in mhrec_tpu.models")


def early_stopping(
    value: float,
    best: Optional[float],
    cur_step: int,
    max_step: int,
    bigger: bool = True,
) -> Tuple[float, int, bool, bool]:
    """Returns (best, cur_step, stop_flag, update_flag)."""
    stop_flag = False
    update_flag = False
    if best is None:
        return value, 0, False, True
    improved = value > best if bigger else value < best
    if improved:
        return value, 0, False, True
    cur_step += 1
    if cur_step > max_step:
        stop_flag = True
    return best, cur_step, stop_flag, update_flag


def calculate_valid_score(
    valid_result: Dict[str, Any],
    valid_metric: Optional[str] = None,
    eval_pred_len: int = 1,
) -> float:
    """Pick the model-selection scalar out of a nested eval-result dict.

    ``valid_result`` maps ``pred_{i}`` / ``shared`` to metric dicts; the
    selection metric lives under ``pred_{eval_pred_len-1}``.
    """
    key = f"pred_{eval_pred_len - 1}"
    if key in valid_result:
        inner = valid_result[key]
    else:
        inner = valid_result
    if valid_metric and valid_metric in inner:
        return float(inner[valid_metric])
    lowered = {k.lower(): v for k, v in inner.items()}
    if valid_metric and valid_metric.lower() in lowered:
        return float(lowered[valid_metric.lower()])
    raise KeyError(f"valid_metric {valid_metric!r} not in result keys {list(inner)[:8]}")


def random_reorder(x, rng_key):
    """[Testing only] Independently permute each row of ``x`` [B, T] — the
    reference's order-sensitivity probe (hllm.py:28-37)."""
    import jax

    B, T = x.shape
    keys = jax.random.split(rng_key, B)
    perms = jax.numpy.stack([jax.random.permutation(k, T) for k in keys])
    return jax.numpy.take_along_axis(x, perms, axis=1)
