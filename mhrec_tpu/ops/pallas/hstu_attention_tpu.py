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


# ---------------------------------------------------------------------------
# v3 "fused STU": attention + the u · LayerNorm(attn) gating in ONE kernel.
#
# The STU block's hot chain is attention → reshape [B,L,H,dv]→[B,L,H·dv] →
# LayerNorm over the full feature dim → multiply by the u gate
# (reference hstu.py:241-290: `u * F.layer_norm(attn)`). v2 lost end-to-end
# because its [B,H,L,D] layout forced transposes on both sides and the LN +
# gating still round-tripped the attention output through HBM. v3:
#   * consumes q/k/v/u in their NATIVE flat layout [B, L, H·d] (straight
#     from the uvqk split — zero transposes outside the kernel);
#   * a (b, q-tile) program computes every head's masked-silu attention,
#     keeps the concatenated [TQ, H·dv] activation in VMEM, applies the
#     f32 LayerNorm + u-gate there, and writes ONLY the gated output;
#   * custom VJP recomputes attention per batch row and chains the LN/gate
#     backward in-kernel (dq, dk, dv, du + per-batch dγ/dβ partials).
# ---------------------------------------------------------------------------


def _fwd_gated_kernel(nonpad_ref, q_ref, k_ref, v_ref, u_ref, gam_ref, bet_ref,
                      o_ref, *, n_real: int, tq: int, H: int, dqk: int,
                      dv: int, eps: float, seg: int = 0):
    qi = pl.program_id(1)
    nonpad = nonpad_ref[0, 0]                       # [L]
    L = k_ref.shape[1]
    rows = qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, L), 1)
    mask = (cols <= rows) & (nonpad[None, :] > 0)
    if seg:
        # row-packed short-L mode: ``seg``-row segments are independent
        # batch rows sharing one tile — block-diagonal causal mask
        mask &= (cols // seg) == (rows // seg)
    outs = []
    for h in range(H):
        qh = q_ref[0][:, h * dqk:(h + 1) * dqk]     # [TQ, dqk]
        kh = k_ref[0][:, h * dqk:(h + 1) * dqk]     # [L, dqk]
        vh = v_ref[0][:, h * dv:(h + 1) * dv]       # [L, dv]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = _silu(s) * (1.0 / n_real)
        s = jnp.where(mask, s, 0.0).astype(vh.dtype)
        outs.append(jax.lax.dot_general(
            s, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
    attn = jnp.concatenate(outs, axis=-1)           # [TQ, H·dv] f32
    mu = jnp.mean(attn, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(attn - mu), axis=-1, keepdims=True)
    xhat = (attn - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * gam_ref[:].astype(jnp.float32) + bet_ref[:].astype(jnp.float32)
    o_ref[0] = (u_ref[0].astype(jnp.float32) * y).astype(o_ref.dtype)


def _bwd_gated_kernel(nonpad_ref, q_ref, k_ref, v_ref, u_ref, gam_ref, bet_ref,
                      g_ref, dq_ref, dk_ref, dv_ref, du_ref, dgam_ref, dbet_ref,
                      *, n_real: int, H: int, dqk: int, dv: int, eps: float,
                      seg: int = 0):
    nonpad = nonpad_ref[0, 0]
    L = q_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    mask = (cols <= rows) & (nonpad[None, :] > 0)
    if seg:
        mask &= (cols // seg) == (rows // seg)

    # recompute attention (concatenated activation) in f32
    outs = []
    for h in range(H):
        qh = q_ref[0][:, h * dqk:(h + 1) * dqk]
        kh = k_ref[0][:, h * dqk:(h + 1) * dqk]
        vh = v_ref[0][:, h * dv:(h + 1) * dv]
        x = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        sig = jax.nn.sigmoid(x)
        a = jnp.where(mask, x * sig * (1.0 / n_real), 0.0).astype(vh.dtype)
        outs.append(jax.lax.dot_general(
            a, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
    attn = jnp.concatenate(outs, axis=-1)           # [L, F] f32
    F = attn.shape[-1]
    mu = jnp.mean(attn, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(attn - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (attn - mu) * inv

    g = g_ref[0].astype(jnp.float32)                # [L, F]
    u = u_ref[0].astype(jnp.float32)
    gam = gam_ref[:].astype(jnp.float32)            # [1, F]
    bet = bet_ref[:].astype(jnp.float32)
    dy = u * g                                      # grad into LN output
    du_ref[0] = ((xhat * gam + bet) * g).astype(du_ref.dtype)
    # per-batch affine partials; blocks must be ≥8 sublanes on TPU, so the
    # [F] vector rides row 0 of an 8-row buffer (summed away outside).
    # iota-select instead of .at[0].set — scatter does not lower on TPU.
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, F), 0) == 0)
    dgam_ref[0] = jnp.where(row0, jnp.sum(dy * xhat, axis=0, keepdims=True), 0.0)
    dbet_ref[0] = jnp.where(row0, jnp.sum(dy, axis=0, keepdims=True), 0.0)
    dxhat = dy * gam
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dattn = (dxhat - m1 - xhat * m2) * inv          # [L, F] f32

    for h in range(H):
        qh = q_ref[0][:, h * dqk:(h + 1) * dqk]
        kh = k_ref[0][:, h * dqk:(h + 1) * dqk]
        vh = v_ref[0][:, h * dv:(h + 1) * dv]
        ga = dattn[:, h * dv:(h + 1) * dv].astype(vh.dtype)  # [L, dv]
        x = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        sig = jax.nn.sigmoid(x)
        a = jnp.where(mask, x * sig * (1.0 / n_real), 0.0).astype(vh.dtype)
        dv_ref[0, :, h * dv:(h + 1) * dv] = jax.lax.dot_general(
            a, ga, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        da = jax.lax.dot_general(
            ga, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dsilu = sig * (1.0 + x * (1.0 - sig))
        ds = jnp.where(mask, da * dsilu * (1.0 / n_real), 0.0).astype(qh.dtype)
        dq_ref[0, :, h * dqk:(h + 1) * dqk] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, :, h * dqk:(h + 1) * dqk] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _hstu_gated_flat(q, k, v, u, gamma, beta, nonpad, H: int, dqk: int,
                     dv: int, eps: float, interpret: bool, seg: int = 0,
                     n_real: int = 0):
    out, _ = _fwd_gated(q, k, v, u, gamma, beta, nonpad, H, dqk, dv, eps,
                        interpret, seg, n_real)
    return out


def _fwd_gated(q, k, v, u, gamma, beta, nonpad, H, dqk, dv, eps, interpret,
               seg=0, n_real=0):
    B, L, Fq = q.shape
    F = v.shape[-1]
    L_pad = _round_up(L, 128)
    tq = 256 if L_pad % 256 == 0 else 128
    qp = _pad_to(q, L_pad, 1)
    kp = _pad_to(k, L_pad, 1)
    vp = _pad_to(v, L_pad, 1)
    up = _pad_to(u, L_pad, 1)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]
    gam2 = gamma.reshape(1, F)
    bet2 = beta.reshape(1, F)

    grid = (B, L_pad // tq)
    out = pl.pallas_call(
        functools.partial(_fwd_gated_kernel, n_real=n_real or L, tq=tq, H=H,
                          dqk=dqk, dv=dv, eps=eps, seg=seg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, Fq), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, Fq), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_pad, F), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L_pad, F), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L_pad * L_pad * (Fq + F) + 10 * B * L_pad * F,
            bytes_accessed=2 * B * L_pad * (2 * Fq + 3 * F),
            transcendentals=B * H * L_pad * L_pad,
        ),
        interpret=interpret,
    )(np_pad, qp, kp, vp, up, gam2, bet2)
    return out[:, :L], (q, k, v, u, gamma, beta, nonpad)


def _bwd_gated(H, dqk, dv, eps, interpret, seg, n_real, res, g):
    q, k, v, u, gamma, beta, nonpad = res
    B, L, Fq = q.shape
    F = v.shape[-1]
    L_pad = _round_up(L, 128)
    qp = _pad_to(q, L_pad, 1)
    kp = _pad_to(k, L_pad, 1)
    vp = _pad_to(v, L_pad, 1)
    up = _pad_to(u, L_pad, 1)
    gp = _pad_to(g, L_pad, 1)
    np_pad = _pad_to(nonpad, L_pad, 1).astype(jnp.int32)[:, None, :]
    gam2 = gamma.reshape(1, F)
    bet2 = beta.reshape(1, F)

    spec_q = pl.BlockSpec((1, L_pad, Fq), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((1, L_pad, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dvv, du, dgam, dbet = pl.pallas_call(
        functools.partial(_bwd_gated_kernel, n_real=n_real or L, H=H, dqk=dqk,
                          dv=dv, eps=eps, seg=seg),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, L_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            spec_q, spec_q, spec_f, spec_f,
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
            spec_f,
        ],
        out_specs=[
            spec_q, spec_q, spec_f, spec_f,
            pl.BlockSpec((1, 8, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L_pad, Fq), q.dtype),
            jax.ShapeDtypeStruct((B, L_pad, Fq), k.dtype),
            jax.ShapeDtypeStruct((B, L_pad, F), v.dtype),
            jax.ShapeDtypeStruct((B, L_pad, F), u.dtype),
            jax.ShapeDtypeStruct((B, 8, F), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, F), jnp.float32),
        ],
        interpret=interpret,
    )(np_pad, qp, kp, vp, up, gam2, bet2, gp)
    return (dq[:, :L], dk[:, :L], dvv[:, :L], du[:, :L],
            jnp.sum(dgam, axis=(0, 1)).astype(gamma.dtype),
            jnp.sum(dbet, axis=(0, 1)).astype(beta.dtype), None)


_hstu_gated_flat.defvjp(
    lambda q, k, v, u, gamma, beta, nonpad, H, dqk, dv, eps, interpret, seg,
    n_real:
        _fwd_gated(q, k, v, u, gamma, beta, nonpad, H, dqk, dv, eps,
                   interpret, seg, n_real),
    _bwd_gated,
)


def hstu_attention_gated_pallas(q, k, v, u, gamma, beta, mask, num_heads: int,
                                eps: float = 1e-6, interpret: bool = False):
    """Fused STU hot chain: ``u * LayerNorm(attention(q, k, v))``.

    q/k [B, L, H·dqk], v/u [B, L, H·dv] in their NATIVE flat layout (the
    uvqk split, reference hstu.py:241-290); gamma/beta [H·dv] LN affine;
    mask [B, 1|H, L, L] with the causal & nonpad-key structure.
    → gated activation [B, L, H·dv].

    Short-L mode: when L ≤ 64, R = 128 // seg batch rows are PACKED into one
    128-row tile (block-diagonal causal mask) — the kernel grid shrinks ×R
    and the padded-tile attention FLOPs amortize over R real rows, which is
    what made the fused path lose to XLA at L=50 (BASELINE.md:50).
    """
    B, L, Fq = q.shape
    F = v.shape[-1]
    H = num_heads
    nonpad = mask[:, 0, L - 1, :]
    seg = 0
    if L <= 64:
        # bf16 sublane packing wants multiples of 16; segments of 32/64 rows
        seg = max(32, _round_up(L, 32))
        R = 128 // seg
        Bp = _round_up(B, R)
        q, k, v, u = (
            _pad_to(_pad_to(x, seg, 1), Bp, 0).reshape(Bp // R, R * seg, -1)
            for x in (q, k, v, u)
        )
        nonpad = _pad_to(_pad_to(nonpad, seg, 1), Bp, 0).reshape(
            Bp // R, R * seg
        )
        out = _hstu_gated_flat(q, k, v, u, gamma, beta, nonpad, H, Fq // H,
                               F // H, eps, interpret, seg, L)
        return out.reshape(Bp, seg, F)[:B, :L]
    return _hstu_gated_flat(q, k, v, u, gamma, beta, nonpad, H, Fq // H,
                            F // H, eps, interpret, 0, 0)
