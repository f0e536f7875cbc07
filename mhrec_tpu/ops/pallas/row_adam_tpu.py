"""Fused gather→AdamW→scatter Pallas kernel for the row-sparse item-table
update (``trainer/sparse_adam.py`` semantics).

Motivation (BASELINE r5 prior-step attribution): at the headline prior
protocol the XLA formulation — row gathers + three full-table
``.at[ids].add`` scatter fusions — costs ~36 ms/step over the 77.8k-row
touched set, per-INDEX bound rather than bandwidth bound (the actual row
bytes are ~1.9 GB ≈ 4 ms at HBM speed). This kernel streams the touched
rows exactly once: for each block of ``G`` rows it DMAs the p/m/ν rows
HBM→VMEM (per-row descriptors, all in flight together), applies the AdamW
row math vectorized on the block, and DMAs the rows back — the moral
equivalent of fbgemm's fused rowwise CUDA optimizers
(reference: DeepSpeed FusedAdam over a replicated ``nn.Embedding``,
``/root/reference/code/REC/trainer/trainer.py:292-295``).

Layout: mosaic tiles the LAST TWO dims of every memref and requires DMA
slices to be tile-aligned (128 lanes), so a [N, D] table cannot be
row-sliced and trailing dims must be exact multiples of 128. The tables
are therefore viewed as ``[N, D//128, 128]`` (a row-major bitcast):
``table.at[rid]`` slices only the untiled LEADING dim and hands the DMA
one fully-aligned (D//128, 128) trailing block.

The wall for this kernel is the SCALAR core (descriptor issue + semaphore
ops), not bytes, so the hot path avoids per-row branches and per-row
waits:

* reads are unconditional — pad slots (sign-encoded −1) fetch row 0,
  which is never written back;
* completion uses ONE "phantom descriptor" wait per table per block: all
  row DMAs of a block share one byte-counted semaphore, and a wait's
  decrement is derived from its dst ref size, so waiting a (G, sub, 128)
  full-scratch descriptor drains exactly the block's G row descriptors;
* blocks whose ``counts`` entry says all G rows are real take a fully
  unconditional write path with the same aggregate wait; only blocks
  containing pad slots (the tail) fall back to per-row conditional
  writes/waits.

Pad-slot placement is a pure performance matter, not correctness: a block
with interspersed pads simply takes the slow path.

Scope: f32 tables / f32 moments, no stochastic rounding, D % 128 == 0 —
anything else falls back to the XLA formulation in the wrapper. ``sub0``
is an XLA-fusion hint and is ignored. Real row ids must be unique per
call (the batcher / ``dedup_touched_rows`` contract) — uniqueness is what
lets block k+1's reads overlap block k's writes without hazards.

Update math parity with ``sparse_adamw_row_update`` is tested in
tests/test_row_adam_kernel.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mhrec_tpu.trainer.sparse_adam import SparseAdamConfig, sparse_adamw_row_update

# rows per block: bounds VMEM at 4·G·D f32 (G=256, D=1024 → 4 MB) while
# keeping up to ~768 row DMAs in flight to amortize HBM latency
_BLOCK_ROWS = 256
# ids are fetched one superblock (= 8·128 ids, one aligned i32 tile) at a
# time into SMEM; a superblock spans _SB_IDS // _BLOCK_ROWS row blocks
_SB_IDS = 1024


def _row_adam_kernel(p_hbm, m_hbm, v_hbm, ids_hbm, g_hbm, meta_ref,
                     counts_ref,
                     p_out, m_out, v_out,
                     pbuf, mbuf, vbuf, gbuf, idbuf,
                     sem_rd, sem_blk, sem_wr):
    """Single-invocation kernel: fori_loop over id superblocks, python-
    unrolled row blocks within each.

    p/m/v are [N, sub, 128] (sub = D // 128), aliased in→out (in-place
    update); ids arrive [n_superblocks, 8, 128] (pad slots −1), grads
    [U, sub, 128], counts [n_blocks] = real rows per block.
    """
    n_sb = ids_hbm.shape[0]
    G = _BLOCK_ROWS
    blocks_per_sb = _SB_IDS // G

    lr = meta_ref[0]
    c1 = meta_ref[1]          # 1 - b1^t  (bias corrections as DIVISORS so
    c2 = meta_ref[2]          # 1 - b2^t   the op sequence — and therefore
                              # the ulps — match the XLA formulation exactly)
    eps = meta_ref[3]
    wd = meta_ref[4]
    b1 = meta_ref[5]
    b2 = meta_ref[6]

    def sb_body(sb, _):
        def id_cp():
            return pltpu.make_async_copy(
                ids_hbm.at[sb], idbuf, sem_blk.at[0]
            )

        id_cp().start()
        id_cp().wait()

        for k in range(blocks_per_sb):     # static unroll
            blk = sb * blocks_per_sb + k
            cnt = counts_ref[blk]

            def row_id(i, k=k):
                flat = k * G + i
                return idbuf[flat // 128, flat % 128]

            def rd_phantom(t):
                bufs = (pbuf, mbuf, vbuf)
                hbms = (p_hbm, m_hbm, v_hbm)
                return pltpu.make_async_copy(
                    hbms[t].at[pl.ds(0, G)], bufs[t], sem_rd
                )

            def wr_phantom(t):
                bufs = (pbuf, mbuf, vbuf)
                outs = (p_out, m_out, v_out)
                return pltpu.make_async_copy(
                    bufs[t], outs[t].at[pl.ds(0, G)], sem_wr
                )

            def rd_row(t, i, row_id=row_id):
                bufs = (pbuf, mbuf, vbuf)
                hbms = (p_hbm, m_hbm, v_hbm)
                return pltpu.make_async_copy(
                    hbms[t].at[jnp.maximum(row_id(i), 0)],
                    bufs[t].at[i],
                    sem_rd,
                )

            def wr_row(t, i, row_id=row_id):
                bufs = (pbuf, mbuf, vbuf)
                outs = (p_out, m_out, v_out)
                return pltpu.make_async_copy(
                    bufs[t].at[i],
                    outs[t].at[jnp.maximum(row_id(i), 0)],
                    sem_wr,
                )

            @pl.when(cnt > 0)
            def _process(blk=blk, cnt=cnt, row_id=row_id, rd_row=rd_row,
                         wr_row=wr_row, rd_phantom=rd_phantom,
                         wr_phantom=wr_phantom):
                def g_cp():
                    return pltpu.make_async_copy(
                        g_hbm.at[pl.ds(blk * G, G)], gbuf, sem_blk.at[1]
                    )

                g_cp().start()

                def start_reads(i, _):
                    rd_row(0, i).start()
                    rd_row(1, i).start()
                    rd_row(2, i).start()
                    return 0

                jax.lax.fori_loop(0, G, start_reads, 0)
                # one aggregate wait per table: drains the block's G row
                # descriptors (identical shapes on one shared semaphore)
                rd_phantom(0).wait()
                rd_phantom(1).wait()
                rd_phantom(2).wait()
                g_cp().wait()

                g = gbuf[:]
                m_old = mbuf[:]
                v_old = vbuf[:]
                p_old = pbuf[:]
                m_new = b1 * m_old + (1.0 - b1) * g
                v_new = b2 * v_old + (1.0 - b2) * (g * g)
                mhat = m_new / c1
                vhat = v_new / c2
                direction = (
                    mhat / (jnp.sqrt(vhat) + eps) + wd * p_old
                )
                # store in the scatter-ADD form (old + (new - old)) so the
                # written ulps — and therefore multi-step trajectories —
                # match the XLA formulation bit for bit
                pbuf[:] = p_old + (-lr * direction)
                mbuf[:] = m_old + (m_new - m_old)
                vbuf[:] = v_old + (v_new - v_old)

                @pl.when(cnt == G)
                def _fast_writes():
                    def start_writes(i, _):
                        wr_row(0, i).start()
                        wr_row(1, i).start()
                        wr_row(2, i).start()
                        return 0

                    jax.lax.fori_loop(0, G, start_writes, 0)
                    wr_phantom(0).wait()
                    wr_phantom(1).wait()
                    wr_phantom(2).wait()

                @pl.when(cnt < G)
                def _mixed_writes():
                    # tail block with pad slots: per-row conditional writes
                    def start_writes(i, _):
                        @pl.when(row_id(i) >= 0)
                        def _():
                            wr_row(0, i).start()
                            wr_row(1, i).start()
                            wr_row(2, i).start()

                        return 0

                    jax.lax.fori_loop(0, G, start_writes, 0)

                    def wait_writes(i, _):
                        @pl.when(row_id(i) >= 0)
                        def _():
                            wr_row(0, i).wait()
                            wr_row(1, i).wait()
                            wr_row(2, i).wait()

                        return 0

                    jax.lax.fori_loop(0, G, wait_writes, 0)

        return 0

    jax.lax.fori_loop(0, n_sb, sb_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_adam_call(table, m, v, ids3, grads, meta, counts, interpret=False):
    sub = table.shape[1]
    G = _BLOCK_ROWS
    spec_hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    return pl.pallas_call(
        _row_adam_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        in_specs=[
            spec_hbm, spec_hbm, spec_hbm,            # p, m, v
            spec_hbm, spec_hbm,                      # ids3, grads
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),   # per-block real counts
        ],
        out_specs=(spec_hbm, spec_hbm, spec_hbm),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        scratch_shapes=[
            pltpu.VMEM((G, sub, 128), jnp.float32),  # pbuf
            pltpu.VMEM((G, sub, 128), jnp.float32),  # mbuf
            pltpu.VMEM((G, sub, 128), jnp.float32),  # vbuf
            pltpu.VMEM((G, sub, 128), jnp.float32),  # gbuf
            pltpu.SMEM((8, 128), jnp.int32),         # idbuf (one superblock)
            # DMA semaphores are a scarce resource (~512 flags/core):
            # every row read shares ONE byte-counted semaphore, drained by
            # phantom-descriptor aggregate waits; ditto writes
            pltpu.SemaphoreType.DMA(()),             # shared read sem
            pltpu.SemaphoreType.DMA((2,)),           # id/grad block sems
            pltpu.SemaphoreType.DMA(()),             # shared write sem
        ],
        interpret=interpret,
    )(table, m, v, ids3, grads, meta, counts)


def sparse_adamw_row_update_pallas(
    table, m, v, ids, mask, grad_rows, lr, step_count,
    cfg: SparseAdamConfig, sub0=None, sr_key=None, interpret=None,
):
    """Drop-in for ``sparse_adamw_row_update`` on the fused kernel; falls
    back to the XLA formulation for bf16 tables, stochastic rounding, or
    D not divisible by 128. ``interpret=None`` auto-selects interpreter
    mode off-TPU so the CPU test suite exercises the same kernel body."""
    D = table.shape[1]
    if table.dtype != jnp.float32 or sr_key is not None or D % 128:
        return sparse_adamw_row_update(
            table, m, v, ids, mask, grad_rows, lr, step_count, cfg,
            sub0=sub0, sr_key=sr_key,
        )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    U = ids.shape[0]
    pad = (-U) % _SB_IDS
    ids_signed = jnp.where(mask > 0, ids.astype(jnp.int32), -1)
    grads = grad_rows.astype(jnp.float32)
    if pad:
        ids_signed = jnp.concatenate(
            [ids_signed, jnp.full((pad,), -1, jnp.int32)]
        )
        grads = jnp.concatenate([grads, jnp.zeros((pad, D), jnp.float32)])
    t = (jnp.asarray(step_count, jnp.float32) + 1.0)
    meta = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - jnp.power(jnp.float32(cfg.b1), t),
        1.0 - jnp.power(jnp.float32(cfg.b2), t),
        jnp.float32(cfg.eps),
        jnp.float32(cfg.weight_decay),
        jnp.float32(cfg.b1),
        jnp.float32(cfg.b2),
    ])
    sub = D // 128
    N = table.shape[0]
    counts = (
        (ids_signed.reshape(-1, _BLOCK_ROWS) >= 0).sum(1).astype(jnp.int32)
    )
    view = lambda x: x.reshape(x.shape[0], sub, 128)
    p3, m3, v3 = _row_adam_call(
        view(table), view(m), view(v),
        ids_signed.reshape(-1, 8, 128),
        view(grads),
        meta, counts, interpret=interpret,
    )
    return (p3.reshape(N, D), m3.reshape(N, D), v3.reshape(N, D))
