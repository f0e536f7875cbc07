"""Relative position / bucketed-time attention biases.

Counterparts of the reference bias modules (hstu.py:53-131). NOTE: in the
reference fork these modules are *constructed* when
``enable_relative_attention_bias`` but the active attention path is
mask-only — the bias is never added to the scores (hstu.py:262-271). We
reproduce both the modules (so the parameter surface matches and future
wiring is possible) and that default behavior; ``HSTU`` instantiates them
under the flag without applying them.

``relative_position_bias``: learned vector w[2N-1] indexed by (j - i + N - 1).
``bucketed_time_bias``: adds a learned bucket embedding of
``log(|t_next - t_cur|)/0.301`` clamped to [0, num_buckets].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RelativePositionalBias(nn.Module):
    max_seq_len: int

    @nn.compact
    def __call__(self, timestamps=None):  # [B, N] unused (parity)
        n = self.max_seq_len
        w = self.param("w", nn.initializers.normal(0.02), (2 * n - 1,))
        # bias[i, j] = w[j - i + n - 1]
        idx = jnp.arange(n)
        rel = idx[None, :] - idx[:, None] + n - 1
        return w[rel][None]  # [1, N, N]


class RelativeBucketedTimeAndPositionBasedBias(nn.Module):
    max_seq_len: int
    num_buckets: int = 128

    @nn.compact
    def __call__(self, timestamps=None):  # [B, N]
        n = self.max_seq_len
        ts_w = self.param("ts_w", nn.initializers.normal(0.02), (self.num_buckets + 1,))
        pos_w = self.param("pos_w", nn.initializers.normal(0.02), (2 * n - 1,))
        if timestamps is None:
            # parameter-surface-only usage (reference constructs but never
            # applies the bias): zero spans land in bucket 0
            timestamps = jnp.zeros((1, n), jnp.int32)
        idx = jnp.arange(n)
        rel = idx[None, :] - idx[:, None] + n - 1
        pos_bias = pos_w[rel][None]  # [1, N, N]
        ext = jnp.concatenate([timestamps, timestamps[:, n - 1 : n]], axis=1)
        span = ext[:, 1:, None] - ext[:, None, :-1]
        bucket = jnp.clip(
            (jnp.log(jnp.clip(jnp.abs(span), 1, None)) / 0.301).astype(jnp.int32),
            0, self.num_buckets,
        )
        return pos_bias + ts_w[bucket]
