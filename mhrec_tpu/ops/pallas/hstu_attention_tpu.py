"""Pallas TPU kernel for HSTU pointwise attention.

Math (reference hstu.py:137-160): per head
    A = silu(q·kᵀ) / n * mask,   out = A @ v
with ``mask[i, j] = causal(j <= i) & nonpad(j)``. No softmax → no running
max/denominator; the kernel is a masked-silu matmul pipeline that keeps the
O(L²) score matrix in VMEM instead of round-tripping it through HBM (XLA
materializes the [B, H, L, L] intermediate for the unfused chain at long L).

Layout: inputs are reshaped to [BH, L, D]; the grid is (BH, L/TQ) with the
full K/V panel resident per program. Forward + custom VJP (dq, dk, dv) are
both Pallas kernels; fp32 accumulation with bf16 operands on the MXU.

The silu derivative is sig(x) * (1 + x * (1 - sig(x))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _fwd_kernel(nonpad_ref, q_ref, k_ref, v_ref, o_ref, *, n_real: int, tq: int):
    qi = pl.program_id(1)
    q = q_ref[0]                            # [TQ, D] native dtype (bf16 on MXU)
    k = k_ref[0]                            # [L, D]
    v = v_ref[0]                            # [L, Dv]
    nonpad = nonpad_ref[0, 0]               # [L]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TQ, L] f32 accum
    s = _silu(s) * (1.0 / n_real)
    L = k.shape[0]
    rows = qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, L), 1)
    mask = (cols <= rows) & (nonpad[None, :] > 0)
    s = jnp.where(mask, s, 0.0).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        s, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(nonpad_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, n_real: int):
    q = q_ref[0]                            # [L, D] native dtype
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]                            # [L, Dv]
    L = q.shape[0]
    x = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [L, L] f32
    sig = jax.nn.sigmoid(x)
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = (cols <= rows) & (nonpad_ref[0, 0][None, :] > 0)
    a = jnp.where(mask, x * sig * (1.0 / n_real), 0.0).astype(v.dtype)
    # dV = Aᵀ g
    dv_ref[0] = jax.lax.dot_general(
        a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    # dA = g Vᵀ ; ds = dA ⊙ silu'(x)/n ⊙ mask
    da = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dsilu = sig * (1.0 + x * (1.0 - sig))
    ds = jnp.where(mask, da * dsilu * (1.0 / n_real), 0.0).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _pad_to(x, L_pad, axis):
    pad = L_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _hstu_attention_bhld(q, k, v, nonpad, n_real: int, interpret: bool):
    out, _ = _fwd(q, k, v, nonpad, n_real, interpret)
    return out


def _fwd(q, k, v, nonpad, n_real, interpret):
    BH, L, D = q.shape
    Dv = v.shape[-1]
    L_pad = _round_up(L, 128)
    tq = 256 if L_pad % 256 == 0 else 128  # must divide L_pad (grid floor-divides)
    qp = _pad_to(q, L_pad, 1)
    kp = _pad_to(k, L_pad, 1)
    vp = _pad_to(v, L_pad, 1)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]  # [BH, 1, L]

    grid = (BH, L_pad // tq)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_real=n_real, tq=tq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, Dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, Dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, L_pad, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * L_pad * L_pad * (D + Dv),
            bytes_accessed=2 * BH * L_pad * (2 * D + 2 * Dv),
            transcendentals=BH * L_pad * L_pad,
        ),
        interpret=interpret,
    )(np_pad, qp, kp, vp)
    return out[:, :L], (q, k, v, nonpad)


def _bwd(n_real, interpret, res, g):
    q, k, v, nonpad = res
    BH, L, D = q.shape
    Dv = v.shape[-1]
    L_pad = _round_up(L, 128)
    qp = _pad_to(q, L_pad, 1)
    kp = _pad_to(k, L_pad, 1)
    vp = _pad_to(v, L_pad, 1)
    gp = _pad_to(g, L_pad, 1)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n_real=n_real),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L_pad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, Dv), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, L_pad, D), q.dtype),
            jax.ShapeDtypeStruct((BH, L_pad, D), k.dtype),
            jax.ShapeDtypeStruct((BH, L_pad, Dv), v.dtype),
        ],
        interpret=interpret,
    )(np_pad, qp, kp, vp, gp)
    return dq[:, :L], dk[:, :L], dv[:, :L], None


_hstu_attention_bhld.defvjp(
    lambda q, k, v, nonpad, n_real, interpret: _fwd(q, k, v, nonpad, n_real, interpret),
    _bwd,
)


def hstu_attention_pallas(q, k, v, mask, interpret: bool = False):
    """[B, L, H, D] inputs with mask [B, 1|H, L, L] → [B, L, H, Dv].

    The mask must have the reference structure causal & nonpad-key; the
    nonpad vector is recovered from its last row (mask[:, 0, L-1, :]).
    """
    B, L, H, D = q.shape
    Dv = v.shape[-1]
    nonpad = mask[:, 0, L - 1, :]  # last query row sees every non-pad key
    nonpad = jnp.broadcast_to(nonpad[:, None, :], (B, H, L)).reshape(B * H, L)
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, L, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, L, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, L, Dv)
    out = _hstu_attention_bhld(qt, kt, vt, nonpad, L, interpret)
    return out.reshape(B, H, L, Dv).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# v2: head-chunked programs over [B, H, L, D] — fewer grid programs than v1's
# one-(b,h)-per-program layout (grid overhead dominated at short L), and K/V
# panels for a whole head chunk ride one DMA.
# ---------------------------------------------------------------------------


def _fwd_kernel_v2(nonpad_ref, q_ref, k_ref, v_ref, o_ref, *, n_real: int,
                   tq: int, hc: int):
    qi = pl.program_id(2)
    nonpad = nonpad_ref[0, 0]               # [L]
    L = k_ref.shape[2]
    rows = qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, L), 1)
    mask = (cols <= rows) & (nonpad[None, :] > 0)
    for h in range(hc):
        q = q_ref[0, h]                     # [TQ, D]
        k = k_ref[0, h]                     # [L, D]
        v = v_ref[0, h]                     # [L, Dv]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = _silu(s) * (1.0 / n_real)
        s = jnp.where(mask, s, 0.0).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            s, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel_v2(nonpad_ref, q_ref, k_ref, v_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, *, n_real: int, hc: int):
    nonpad = nonpad_ref[0, 0]
    L = q_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = (cols <= rows) & (nonpad[None, :] > 0)
    for h in range(hc):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h]
        x = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        sig = jax.nn.sigmoid(x)
        a = jnp.where(mask, x * sig * (1.0 / n_real), 0.0).astype(v.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            a, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        da = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dsilu = sig * (1.0 + x * (1.0 - sig))
        ds = jnp.where(mask, da * dsilu * (1.0 / n_real), 0.0).astype(q.dtype)
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


def _pick_hc(H: int) -> int:
    for c in (8, 4, 2):
        if H % c == 0:
            return c
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _hstu_attention_bhld_v2(q, k, v, nonpad, n_real: int, interpret: bool):
    out, _ = _fwd_v2(q, k, v, nonpad, n_real, interpret)
    return out


def _fwd_v2(q, k, v, nonpad, n_real, interpret):
    B, H, L, D = q.shape
    Dv = v.shape[-1]
    L_pad = _round_up(L, 128)
    tq = 256 if L_pad % 256 == 0 else 128  # must divide L_pad (grid floor-divides)
    hc = _pick_hc(H)
    qp = _pad_to(q, L_pad, 2)
    kp = _pad_to(k, L_pad, 2)
    vp = _pad_to(v, L_pad, 2)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]  # [B,1,L]

    grid = (B, H // hc, L_pad // tq)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, n_real=n_real, tq=tq, hc=hc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, tq, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, L_pad, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, L_pad, Dv), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hc, tq, Dv), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L_pad, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L_pad * L_pad * (D + Dv),
            bytes_accessed=2 * B * H * L_pad * (2 * D + 2 * Dv),
            transcendentals=B * H * L_pad * L_pad,
        ),
        interpret=interpret,
    )(np_pad, qp, kp, vp)
    return out[:, :, :L], (q, k, v, nonpad)


def _bwd_v2(n_real, interpret, res, g):
    q, k, v, nonpad = res
    B, H, L, D = q.shape
    Dv = v.shape[-1]
    L_pad = _round_up(L, 128)
    hc = _pick_hc(H)
    qp = _pad_to(q, L_pad, 2)
    kp = _pad_to(k, L_pad, 2)
    vp = _pad_to(v, L_pad, 2)
    gp = _pad_to(g, L_pad, 2)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]

    spec_d = pl.BlockSpec((1, hc, L_pad, D), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_dv = pl.BlockSpec((1, hc, L_pad, Dv), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, n_real=n_real, hc=hc),
        grid=(B, H // hc),
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_d, spec_d, spec_dv, spec_dv,
        ],
        out_specs=[spec_d, spec_d, spec_dv],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, L_pad, Dv), v.dtype),
        ],
        interpret=interpret,
    )(np_pad, qp, kp, vp, gp)
    return dq[:, :, :L], dk[:, :, :L], dv[:, :, :L], None


_hstu_attention_bhld_v2.defvjp(
    lambda q, k, v, nonpad, n_real, interpret: _fwd_v2(q, k, v, nonpad, n_real, interpret),
    _bwd_v2,
)


def hstu_attention_pallas_v2(q, k, v, mask, interpret: bool = False):
    """Head-chunked kernel: [B, L, H, D] in/out; internally [B, H, L, D]."""
    B, L, H, D = q.shape
    Dv = v.shape[-1]
    nonpad = mask[:, 0, L - 1, :]  # last query row sees every non-pad key
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _hstu_attention_bhld_v2(qt, kt, vt, nonpad, L, interpret)
    return out.transpose(0, 2, 1, 3)
