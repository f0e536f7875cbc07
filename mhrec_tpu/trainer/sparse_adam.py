"""Row-sparse (lazy) AdamW for the item-embedding table.

The gradient of an embedding lookup touches only the rows gathered in the
batch, but a dense optimizer still streams the full [N, D] parameter plus
both Adam moments through HBM every step — for a corpus-scale table that
traffic dominates the train step (the reference pays it too: DeepSpeed
FusedAdam over a replicated ``nn.Embedding``, trainer.py:292-295).

Here the trainer differentiates w.r.t. a per-batch gathered sub-table
(``[U, D]`` unique rows, served to ANY IDNet model via the ``ItemEmbed``
'sub' variable collection) and this module applies the AdamW update to ONLY
those rows via scatter-add, with moments stored dense but touched row-wise.
Untouched rows receive no update — standard LazyAdam semantics (moments of
idle rows do not decay, and decoupled weight decay applies only on touch);
with ``weight_decay=0`` a single step is bit-identical to dense AdamW.

Layout note (measured, round 3): an interleaved ``[N, 3·D]`` (param|m|v)
buffer — one gather + one scatter per step — was built and REVERTED. XLA's
TPU scatter cost grows with row bytes almost as fast as with index count:
the combined scatter's in-step win at size4 (4.6 vs 5.7 ms) vanished in
the end-to-end step, and at the merrec shape it LOST outright (xprof: one
5.4 ms wide scatter vs three ~1.2 ms narrow ones; step 29.2 vs 26.4 ms).
Three separate [N, D] buffers are the fast layout.

All scatter updates use ``.at[ids].add(delta * mask)``: padding slots of the
unique-id buffer alias row 0 with ``mask == 0``, so duplicates contribute
zero and the update stays deterministic.

Sorted/unique scatter promises (tried, measured, REVERTED, r5): padding the
id block PAST the table (``N + arange`` — globally sorted + unique) and
scattering with ``mode='drop', indices_are_sorted=True,
unique_indices=True`` wins the isolated scatter at the prior-protocol row
set (7.55 vs 8.98 ms for 77.8k ids into [200k, 1024]) but LOSES end to end:
the size4 base step went 29.6 → 49.2 ms (the drop-mode bounds handling and
out-of-bounds-clamping gathers poison the surrounding fusions), and the
prior step measured flat (86.3 vs 86.7). Zero-alias padding is the fast
layout; the experiment is recorded in BASELINE r5.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SparseAdamConfig(NamedTuple):
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0


def quantize_bf16(x_f32: jnp.ndarray, sr_key=None) -> jnp.ndarray:
    """Round an f32 array onto the bf16 grid, returned AS f32 values.

    With ``sr_key``: stochastic rounding — add uniform 16-bit noise below
    the bf16 mantissa, then truncate. ``E[quantize(x)] == x``, so repeated
    small updates to a bf16-stored parameter advance in expectation instead
    of stalling below ulp/2 (the failure mode of round-to-nearest storage).
    Values already on the bf16 grid (zero low bits) are returned unchanged
    under either mode. Without ``sr_key``: round-to-nearest-even.
    """
    if sr_key is None:
        return x_f32.astype(jnp.bfloat16).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    rnd = jax.random.bits(sr_key, bits.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    bits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def sparse_adamw_row_update(
    table: jnp.ndarray,       # [N, D] full parameter table
    m: jnp.ndarray,           # [N, D] first moment
    v: jnp.ndarray,           # [N, D] second moment
    ids: jnp.ndarray,         # [U] int32 unique row ids (pad slots alias id 0)
    mask: jnp.ndarray,        # [U] float 1.0 for real entries, 0.0 for pads
    grad_rows: jnp.ndarray,   # [U, D] gradient w.r.t. the gathered rows
    lr,                       # scalar learning rate for this step
    step_count,               # scalar: number of COMPLETED updates (0-based)
    cfg: SparseAdamConfig,
    sub0=None,                # optional pre-gathered table[ids] (reuse the
                              # forward's gather when ids are unchanged)
    sr_key=None,              # PRNG key → stochastic rounding for bf16 tables
):
    """Returns (table, m, v) with only the ``ids`` rows advanced one AdamW
    step (optax.adamw formula: update = mhat / (sqrt(vhat) + eps) + wd * p,
    scaled by -lr; bias correction from the global step count).

    bf16 tables (``item_table_dtype: bfloat16`` — halves the dominant HBM
    object's row bytes, VERDICT r3 #4): the Adam math runs in f32 on the
    upcast rows, the NEW row value is quantized onto the bf16 grid
    (stochastically when ``sr_key`` is given, so sub-ulp updates advance in
    expectation), and the scatter adds the exact p-space difference — a
    plain delta add in bf16 would silently drop every update smaller than
    ulp(p)/2.
    """
    colmask = mask[:, None]
    g = grad_rows.astype(jnp.float32) * colmask
    m_old = m[ids]
    v_old = v[ids]
    p_old = (table[ids] if sub0 is None else sub0).astype(jnp.float32)
    m_new = cfg.b1 * m_old + (1.0 - cfg.b1) * g
    v_new = cfg.b2 * v_old + (1.0 - cfg.b2) * (g * g)
    t = (step_count + 1).astype(jnp.float32)
    mhat = m_new / (1.0 - jnp.power(cfg.b1, t))
    vhat = v_new / (1.0 - jnp.power(cfg.b2, t))
    direction = mhat / (jnp.sqrt(vhat) + cfg.eps) + cfg.weight_decay * p_old
    delta_p = (-lr * direction) * colmask
    if table.dtype == jnp.bfloat16:
        p_tgt = quantize_bf16(p_old + delta_p, sr_key)
        delta_p = (p_tgt - p_old) * colmask
    table = table.at[ids].add(delta_p.astype(table.dtype))
    m = m.at[ids].add((m_new - m_old) * colmask)
    v = v.at[ids].add((v_new - v_old) * colmask)
    return table, m, v


def dedup_touched_rows(ids, mask, grad_rows, num_rows=None):
    """Merge duplicate row ids (one entry per id, gradients summed).

    Multi-host: each host contributes its own unique-id block, and the same
    table row can appear in several blocks. Applying the nonlinear Adam row
    update once per block would double-step shared rows; the correct update
    consumes the SUMMED gradient once (exactly what a dense optimizer sees
    after the cross-host grad psum). Sort the concatenated ids, segment-sum
    gradients of equal ids into the group's leading slot, and return
    (rep_ids, rep_mask, summed_grads) shaped like the inputs.

    With ``num_rows``: trailing (duplicate / out-of-bounds-pad) slots are
    re-padded ``num_rows + position`` so the output block is again globally
    SORTED and UNIQUE (group leaders ascend; pads exceed every real id) —
    preserving the scatter promises of ``sparse_adamw_row_update``. Without
    it, trailing slots read id 0 / mask 0 (legacy zero-alias padding).

    Pure static shapes; safe under jit/GSPMD.
    """
    import jax.numpy as _jnp

    G = ids.shape[0]
    order = _jnp.argsort(ids)
    ids_s = ids[order]
    m_s = mask[order]
    g_s = grad_rows[order] * m_s[:, None]
    first = _jnp.concatenate(
        [_jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    )
    seg = _jnp.cumsum(first) - 1                      # group index per entry
    g_sum = _jnp.zeros_like(g_s).at[seg].add(g_s)
    m_rep = _jnp.zeros_like(m_s).at[seg].max(m_s)
    id_rep = _jnp.zeros_like(ids_s).at[seg].max(ids_s)
    if num_rows is not None:
        n_groups = seg[-1] + 1
        iota = _jnp.arange(G, dtype=ids_s.dtype)
        id_rep = _jnp.where(iota < n_groups, id_rep, num_rows + iota)
    return id_rep, m_rep, g_sum
