"""HSTU pointwise attention: ``silu(q·kᵀ)/n * mask`` — no softmax.

Reference math: ``_hstu_attention_maybe_from_cache``
(code/REC/model/IDNet/hstu.py:137-160): per head, ``A = silu(q kᵀ) / n``
elementwise-masked by the (causal & non-pad) boolean mask, then ``A @ v``.
Because there is no softmax there is no running max/denominator — the Pallas
kernel is a masked-silu matmul pipeline, simpler than flash attention.

Two implementations:
* ``hstu_attention_xla`` — einsum formulation; XLA fuses the silu+mask into
  the matmul epilogue. Used on CPU (tests) and for small shapes.
* ``hstu_attention_pallas`` — tiled Pallas TPU kernel (fwd + custom VJP) for
  long sequences where the O(L²) intermediate would otherwise round-trip
  through HBM.

``hstu_attention`` dispatches on platform/shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def hstu_attention_xla(
    q: jnp.ndarray,  # [B, L, H, Dqk]
    k: jnp.ndarray,  # [B, L, H, Dqk]
    v: jnp.ndarray,  # [B, L, H, Dv]
    mask: jnp.ndarray,  # [B, 1, L, L] or [B, H, L, L] bool / {0,1}
    bias: jnp.ndarray | None = None,  # optional [B|1, L, L] relative bias
) -> jnp.ndarray:  # [B, L, H, Dv]
    n = q.shape[1]
    # NOTE (measured, v5e size4): spelling this as dot_general with the
    # (b, h) batch dims in place — hoping to fold the [B,L,H,D]→[B,H,L,D]
    # transposes into the matmul — changes nothing end-to-end (28.97 vs
    # 28.83 ms); XLA rematerializes the canonical layouts either way.
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k)
    if bias is not None:
        scores = scores + bias[:, None].astype(scores.dtype)
    scores = jax.nn.silu(scores) * (1.0 / n)
    scores = scores * mask.astype(scores.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", scores, v)


@functools.partial(jax.jit, static_argnames=("impl",))
def hstu_attention(q, k, v, mask, impl: str = "auto", bias=None):
    """Dispatching entry point. ``impl``: 'auto' | 'xla' | 'pallas'."""
    if bias is not None:
        return hstu_attention_xla(q, k, v, mask, bias)
    if impl == "pallas":
        from mhrec_tpu.ops.pallas.hstu_attention_tpu import hstu_attention_pallas_v2

        return hstu_attention_pallas_v2(q, k, v, mask)
    if impl == "auto":
        # Measured on TPU v5e (bf16, fwd / fwd+bwd ms):
        #   L=50  B=64 H=16: XLA 0.57/0.83 · pallas-v2 0.65/1.19
        #   L=400 B=32 H=8:  XLA 0.82/1.88 · pallas-v2 0.79/1.74
        # The v2 head-chunked kernel wins the ISOLATED op at L≥400, but in
        # the full STU layer XLA fuses the attention with its neighbors
        # (mask build, gating) and the kernel's layout transposes cost more
        # than it saves — end-to-end merrec-shape step: XLA 34.4 ms vs v2
        # 36.5 ms. 'auto' therefore resolves to XLA at every shape;
        # attn_impl='pallas' opts into the kernel.
        pass
    return hstu_attention_xla(q, k, v, mask)
