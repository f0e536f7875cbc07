"""Multi-horizon InfoNCE with false-negative masking — fixed-shape JAX.

Math parity with the reference loss (``hstu.py:600-872``):

* per token: cosine positive logit + ``out·negᵀ`` negative logits, negatives
  whose similarity to the *target* exceeds ``nce_thres`` masked to dtype-min
  (false-negative removal), learnable temperature clamped to ``[0, ln 100]``,
  token CE with the positive at index 0;
* per prediction offset ``p``: masked mean over valid tokens, then a
  normalized geometric ``medusa_lambda`` horizon discount (hstu.py:436-438);
* empty masks contribute zero (replacing the reference's random-10%% fill
  guard, hstu.py:815-839 — a fixed-shape masked mean needs no guard).

Where the reference gathers valid tokens into a jagged batch
(``cur_flat = ...[mask_flat]``, hstu.py:689), this implementation keeps
static shapes and exploits two structural identities to beat it on FLOPs:

* offsets within a segment share their head, so the dominant
  ``out @ negᵀ`` matmul is computed once per *distinct* head, not per offset;
* the target at ``(p, l)`` is the item at ``l + p + 1``, so the
  false-negative similarity table ``tgt·negᵀ`` for every offset is one
  ``[B, L+P-1, M]`` matmul, sliced with a shifted window per offset, instead
  of P separate ``[B, L, M]`` matmuls.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.layers import cosine_normalize

_LN100 = 4.605170185988092  # np.log(100)


def clamp_logit_scale(logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Straight-through clamp to [0, ln 100] then exp (hstu.py:600-603)."""
    clipped = jnp.clip(logit_scale, 0.0, _LN100)
    ste = logit_scale + jax.lax.stop_gradient(clipped - logit_scale)
    return jnp.exp(ste)


def multi_horizon_nce(
    head_embs: jnp.ndarray,       # [B, H, L, D] raw head outputs
    target_embs: jnp.ndarray,     # [B, L+P, D] item embeddings of the window
    neg_embs_norm: jnp.ndarray,   # [M, D], already L2-normalized
    base_mask: jnp.ndarray,       # [B, P, L] bool: valid (non-pad) tokens
    head_for_pred: jnp.ndarray,   # [P] int: which head serves offset p
    horizon_discount: jnp.ndarray,  # [P] float, normalized
    logit_scale: jnp.ndarray,     # scalar param (pre-exp)
    nce_thres: float,
    loss_weight: float = 1.0,
    extra_mask: Optional[jnp.ndarray] = None,  # [B, P, L] e.g. category mask
    compute_topk_log: bool = False,
    impl: str = "banded",         # 'banded' | 'per_offset'
    inputs_normalized: bool = False,  # head/target embs already L2-normalized
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, per_pred_loss[P], log_dict)."""
    if impl == "banded":
        return _banded_nce(
            head_embs, target_embs, neg_embs_norm, base_mask, head_for_pred,
            horizon_discount, logit_scale, nce_thres, loss_weight, extra_mask,
            compute_topk_log, inputs_normalized,
        )
    B, H, L, D = head_embs.shape
    P = base_mask.shape[1]
    scale = clamp_logit_scale(logit_scale).astype(jnp.float32)

    if inputs_normalized:
        heads_norm = head_embs.astype(jnp.float32)
        tgt_norm = target_embs.astype(jnp.float32)
    else:
        heads_norm = cosine_normalize(head_embs.astype(jnp.float32))
        tgt_norm = cosine_normalize(target_embs.astype(jnp.float32))

    # one negative matmul per *distinct* head (bf16 on the MXU, f32 accum,
    # bf16 table storage — the logits are bf16 under the reference's
    # bf16-mixed autocast too; CE math upcasts to f32 per offset)
    distinct = sorted(set(int(h) for h in head_for_pred))
    neg_T = neg_embs_norm.astype(jnp.bfloat16).T
    raw_neg = {
        h: jnp.einsum(
            "bld,dm->blm",
            heads_norm[:, h].astype(jnp.bfloat16),
            neg_T,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for h in distinct
    }
    # false-negative table for all offsets at once: tgt[l+1 .. L+P-1] · negᵀ
    tgt_neg = jnp.einsum(
        "btd,dm->btm",
        tgt_norm[:, 1:].astype(jnp.bfloat16),
        neg_T,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [B, L+P-1, M]

    min_val = jnp.finfo(jnp.float32).min
    per_pred_loss = []
    log_dict: Dict[str, jnp.ndarray] = {}
    mask_full = base_mask if extra_mask is None else (base_mask & extra_mask)

    def offset_ce(raw_h, fix, pos_logit, m):
        # bf16 tables are upcast inside the fused mask+reduce pass; XLA keeps
        # the [B, L, M] intermediates unmaterialized (measured: remat here is
        # a net loss, bf16 table reads a net win)
        neg_logits = jnp.where(fix > nce_thres, min_val,
                               raw_h.astype(jnp.float32))
        lse = jnp.logaddexp(
            pos_logit * scale,
            jax.scipy.special.logsumexp(neg_logits * scale, axis=-1),
        )
        tok_ce = lse - pos_logit * scale              # [B, L]
        cnt = m.sum()
        return jnp.sum(tok_ce * m) / jnp.clip(cnt, 1.0, None)

    for p in range(P):
        h = int(head_for_pred[p])
        out_n = heads_norm[:, h]                      # [B, L, D]
        tgt_p = tgt_norm[:, p + 1 : p + 1 + L]        # [B, L, D]
        pos_logit = jnp.einsum("bld,bld->bl", out_n, tgt_p)  # [B, L]
        fix = tgt_neg[:, p : p + L]                   # [B, L, M]
        m = mask_full[:, p].astype(jnp.float32)
        mean_p = offset_ce(raw_neg[h], fix, pos_logit, m)
        per_pred_loss.append(horizon_discount[p] * loss_weight * mean_p)

        if compute_topk_log and p == 0:
            cnt = m.sum()
            neg_logits = jax.lax.stop_gradient(
                jnp.where(fix > nce_thres, min_val, raw_neg[h])
            )
            n_unmasked = (neg_logits > min_val / 100).sum(axis=-1).astype(jnp.float32) + 1.0
            log_dict["nce_samples"] = jnp.sum(n_unmasked * m) / jnp.clip(cnt, 1.0, None)
            beaten = (neg_logits > pos_logit[:, :, None]).sum(axis=-1)
            for kk in (1, 5, 10, 50, 100):
                if kk > neg_logits.shape[-1] + 1:
                    break
                acc = (beaten < kk).astype(jnp.float32)
                log_dict[f"nce_top{kk}_acc"] = jnp.sum(acc * m) / jnp.clip(cnt, 1.0, None)

    per_pred = jnp.stack(per_pred_loss)
    return per_pred.sum(), per_pred, log_dict


def _banded_nce(
    head_embs, target_embs, neg_embs_norm, base_mask, head_for_pred,
    horizon_discount, logit_scale, nce_thres, loss_weight, extra_mask,
    compute_topk_log, inputs_normalized=False,
):
    """One-matmul multi-horizon NCE (identical math to the per-offset path).

    The per-offset masked logsumexp reads the ``[B, L, M]`` logit table and a
    shifted ``[B, L, M]`` false-negative slice P times each (the measured
    bottleneck of the train step after the trunk). But masking only REMOVES
    terms from the partition sum, and every offset's false-negative mask is a
    shifted slice of one indicator ``G[b, j, m] = (tgt_j · neg_m > thres)``,
    so for every offset at once:

        lse_p[b, l]  = shift + log( keep[b, l, l+p] )
        keep[b,l,j]  = Σ_m exp(scaled − shift)·(1−G[b,j,m])   (ONE batched
                                                 matmul on the MXU; j = l+p)

    which touches each big table once instead of P times. The kept partition
    sum is contracted directly against the complement indicator — NOT as
    ``full − masked`` — because the row max used for ``shift`` is often
    itself a masked false negative (they are precisely the high-similarity
    entries) and the subtraction would cancel catastrophically. ``G`` is a
    stop-gradient boolean (the reference's masked_fill_ condition carries no
    gradient either, hstu.py:614) so the backward pass is one more banded
    matmul rather than P masked softmax sweeps.

    Tail behavior: ``shift`` is the max over ALL negatives (masked included),
    which may itself be a masked false negative sitting far above every kept
    logit. The shift is therefore lowered by a constant headroom ``C``
    (every kept term scales by ``e^C`` uniformly — bf16/fp32 relative
    precision is exponent-invariant, so accuracy is unchanged), moving the
    kept-sum underflow horizon from ~87 to ~87+C log-units below the masked
    max; ``C`` is capped so the fp32 accumulation ``M·e^C`` cannot overflow.
    With C=70 the horizon (157 log-units) exceeds the worst gap reachable at
    the ln(100) ``logit_scale`` clamp short of a full ±1 cosine split. A
    residual underflow would read the token's CE as 0; its rate is logged as
    ``nce_underflow_rate`` when train-time top-k logging is on.
    """
    B, H, L, D = head_embs.shape
    P = base_mask.shape[1]
    J = L + P - 1
    scale = clamp_logit_scale(logit_scale).astype(jnp.float32)

    if inputs_normalized:
        heads_norm = head_embs.astype(jnp.float32)
        tgt_norm = target_embs.astype(jnp.float32)
    else:
        heads_norm = cosine_normalize(head_embs.astype(jnp.float32))
        tgt_norm = cosine_normalize(target_embs.astype(jnp.float32))
    neg_T = neg_embs_norm.astype(jnp.bfloat16).T            # [D, M]
    tgtJ = tgt_norm[:, 1:]                                  # [B, J, D]

    # false-negative indicator over ALL target offsets (bf16 0/1 so the
    # correction is an MXU matmul; no gradient flows through a mask)
    tgt_neg = jnp.einsum(
        "bjd,dm->bjm", tgtJ.astype(jnp.bfloat16), neg_T,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # bf16 table like the per-offset path's `fix`
    keep_ind = jax.lax.stop_gradient(
        (tgt_neg <= nce_thres).astype(jnp.bfloat16)
    )  # complement of the false-negative mask

    # band index: offset p looks at target column j = l + p
    band = jnp.arange(L)[:, None] + jnp.arange(P)[None, :]  # [L, P]

    # underflow headroom (see docstring): M·e^C must stay below fp32 max
    # (log(3.4e38) ≈ 88.7), with a 2-log-unit safety margin
    M = neg_embs_norm.shape[0]
    headroom = min(70.0, 86.7 - float(np.log(max(M, 1))))

    # head-batched over the DISTINCT heads (r5): per slice this is the same
    # op sequence the old per-head loop ran (batched einsum dims don't
    # reorder each slice's reduction), but one einsum triple feeds the MXU
    # instead of |distinct| small ones
    distinct = sorted(set(int(h) for h in head_for_pred))
    dh = np.asarray(distinct, np.int32)
    outs = heads_norm[:, dh]                                # [B, Hd, L, D]
    raw_all = jnp.einsum(
        "bhld,dm->bhlm", outs.astype(jnp.bfloat16), neg_T,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)                                  # [B, Hd, L, M]
    scaled = raw_all.astype(jnp.float32) * scale
    shift = jax.lax.stop_gradient(jnp.max(scaled, axis=-1)) - headroom  # [B,Hd,L]
    s = jnp.exp(scaled - shift[..., None]).astype(jnp.bfloat16)
    kept = jnp.einsum(
        "bhlm,bjm->bhlj", s, keep_ind, preferred_element_type=jnp.float32
    )                                                       # [B, Hd, L, J]
    kept_b_all = jnp.take_along_axis(kept, band[None, None], axis=3)  # [B,Hd,L,P]
    # floor guards log(0) (all negatives masked / kept sum underflowed):
    # lse_neg then reads shift−69, i.e. "negatives negligible", and the
    # sigmoid upstream of it is 0 — no -inf·0 NaN in the backward pass
    lse_neg_h = shift[..., None] + jnp.log(jnp.maximum(kept_b_all, 1e-30))
    # positive logits, shape-adaptive (measured on v5e):
    # * short L (L ≤ 7P): ONE [B, Hd, L, J] MXU matmul + band gather beats P
    #   elementwise passes (2220 vs 2158 ex/s at the size4 bench shape);
    # * long L (merrec L=400, P=1): the rectangle is L/P× the flops —
    #   P shifted elementwise dots instead.
    if L <= 7 * P:
        pos_full = jnp.einsum("bhld,bjd->bhlj", outs, tgtJ)
        pos_band_h = jnp.take_along_axis(pos_full, band[None, None], axis=3)
    else:
        pos_band_h = jnp.stack(
            [jnp.einsum("bhld,bld->bhl", outs, tgtJ[:, p : p + L])
             for p in range(P)],
            axis=-1,
        )  # [B, Hd, L, P]
    slot = {h: i for i, h in enumerate(distinct)}
    if compute_topk_log:
        _kept_b_h0 = kept_b_all[:, slot[int(head_for_pred[0])]]

    mask_full = base_mask if extra_mask is None else (base_mask & extra_mask)
    m = mask_full.astype(jnp.float32)                       # [B, P, L]
    hsel = np.asarray(head_for_pred, np.int32)
    lse_neg_all = jnp.stack(
        [lse_neg_h[:, slot[int(h)], :, p] for p, h in enumerate(hsel)], 1)
    pos_all = jnp.stack(
        [pos_band_h[:, slot[int(h)], :, p] for p, h in enumerate(hsel)], 1)
    # [B, P, L] from here on
    lse = jnp.logaddexp(pos_all * scale, lse_neg_all)
    tok_ce = lse - pos_all * scale
    cnt = jnp.sum(m, axis=(0, 2))                           # [P]
    per_pred_mean = jnp.sum(tok_ce * m, axis=(0, 2)) / jnp.clip(cnt, 1.0, None)
    per_pred = horizon_discount * loss_weight * per_pred_mean

    log_dict: Dict[str, jnp.ndarray] = {}
    if compute_topk_log:
        raw0 = jax.lax.stop_gradient(
            raw_all[:, slot[int(hsel[0])]]).astype(jnp.float32)
        k0 = keep_ind[:, :L].astype(bool)                   # offset p=0 slice
        m0 = m[:, 0]
        cnt0 = jnp.clip(m0.sum(), 1.0, None)
        n_unmasked = jnp.sum(k0, axis=-1).astype(jnp.float32) + 1.0
        log_dict["nce_samples"] = jnp.sum(n_unmasked * m0) / cnt0
        # kept partition sum underflowed (CE reads 0) despite surviving
        # negatives — the adversarial tail documented above; should be 0.0
        under = jax.lax.stop_gradient(
            (_kept_b_h0[:, :, 0] <= 0.0) & (n_unmasked > 1.0)
        ).astype(jnp.float32)
        log_dict["nce_underflow_rate"] = jnp.sum(under * m0) / cnt0
        pos0 = jax.lax.stop_gradient(pos_all[:, 0])
        beaten = jnp.sum(
            (raw0 > pos0[:, :, None]) & k0, axis=-1
        )
        for kk in (1, 5, 10, 50, 100):
            if kk > raw0.shape[-1] + 1:
                break
            acc = (beaten < kk).astype(jnp.float32)
            log_dict[f"nce_top{kk}_acc"] = jnp.sum(acc * m0) / cnt0

    return per_pred.sum(), per_pred, log_dict


def multi_horizon_nce_stacked(
    heads_norm: jnp.ndarray,        # [B, H, L, D] L2-normalized head outputs
    tgt_norm: jnp.ndarray,          # [B, L+P, D] L2-normalized targets
    neg_stack: jnp.ndarray,         # [C, M, D] normalized per-cat negatives,
                                    # or [1, M, D] shared (global) negatives
    base_mask: jnp.ndarray,         # [B, P, L] bool
    extra_masks: jnp.ndarray,       # [C, B, P, L] bool per-category windows
    head_for_cat: np.ndarray,       # [C] int: the ONE head serving category c
    horizon_discount: jnp.ndarray,  # [P]
    logit_scale: jnp.ndarray,
    nce_thres: float,
    loss_weights: np.ndarray,       # [C]
    compute_topk_log: bool = False,
):
    """Category-stacked banded NCE (VERDICT r4 #3).

    The prior loss runs one ``multi_horizon_nce`` per category — at the
    paper's headline config (8 categories × additive heads) that is 8
    separate raw/false-negative/kept matmul triples, each too small to fill
    the MXU and each re-reading the shared target tensor from HBM. When
    every category is served by exactly ONE head (additive interaction —
    ``head_for_pred`` is constant per category, multihead.py:126), the
    whole loop collapses into category-batched einsums with identical
    per-slice math to :func:`_banded_nce`:

      raw[c]      = head_c · neg_cᵀ          one  cbld,cdm->cblm
      tgt_neg[c]  = tgt · neg_cᵀ             one  bjd,cdm->cbjm
      kept[c]     = exp(raw_c) · keep_cᵀ     one  cblm,cbjm->cblj

    With GLOBAL negatives (neg_stack shape [1, M, D]) the false-negative
    indicator is computed once and shared across categories — the keep
    contraction becomes ``cblm,bjm->cblj``.

    Returns (total, per_pred[P], per_cat[C], log_dict) where per_cat[c]
    is the discounted, weighted loss of category c (the loop path's
    ``loss_c``).
    """
    B, H, L, D = heads_norm.shape
    P = base_mask.shape[1]
    J = L + P - 1
    C = extra_masks.shape[0]
    shared_negs = neg_stack.shape[0] == 1
    scale = clamp_logit_scale(logit_scale).astype(jnp.float32)

    tgtJ = tgt_norm[:, 1:]                                   # [B, J, D]
    outs = jnp.moveaxis(heads_norm[:, np.asarray(head_for_cat)], 1, 0)  # [C,B,L,D]
    negT = neg_stack.astype(jnp.bfloat16).transpose(0, 2, 1)  # [C|1, D, M]

    if shared_negs:
        raw = jnp.einsum(
            "cbld,dm->cblm", outs.astype(jnp.bfloat16), negT[0],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                               # [C, B, L, M]
    else:
        raw = jnp.einsum(
            "cbld,cdm->cblm", outs.astype(jnp.bfloat16), negT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)                               # [C, B, L, M]

    if shared_negs:
        tgt_neg = jnp.einsum(
            "bjd,dm->bjm", tgtJ.astype(jnp.bfloat16), negT[0],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        keep_ind = jax.lax.stop_gradient(
            (tgt_neg <= nce_thres).astype(jnp.bfloat16))      # [B, J, M]
    else:
        tgt_neg = jnp.einsum(
            "bjd,cdm->cbjm", tgtJ.astype(jnp.bfloat16), negT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        keep_ind = jax.lax.stop_gradient(
            (tgt_neg <= nce_thres).astype(jnp.bfloat16))      # [C, B, J, M]

    M = neg_stack.shape[1]
    headroom = min(70.0, 86.7 - float(np.log(max(M, 1))))
    scaled = raw.astype(jnp.float32) * scale
    shift = jax.lax.stop_gradient(jnp.max(scaled, axis=-1)) - headroom  # [C,B,L]
    s = jnp.exp(scaled - shift[..., None]).astype(jnp.bfloat16)
    if shared_negs:
        kept = jnp.einsum("cblm,bjm->cblj", s, keep_ind,
                          preferred_element_type=jnp.float32)
    else:
        kept = jnp.einsum("cblm,cbjm->cblj", s, keep_ind,
                          preferred_element_type=jnp.float32)  # [C, B, L, J]
    band = jnp.arange(L)[:, None] + jnp.arange(P)[None, :]    # [L, P]
    kept_b = jnp.take_along_axis(kept, band[None, None], axis=3)  # [C,B,L,P]
    lse_neg = shift[..., None] + jnp.log(jnp.maximum(kept_b, 1e-30))

    outs32 = jnp.moveaxis(heads_norm[:, np.asarray(head_for_cat)], 1, 0)
    if L <= 7 * P:
        pos_full = jnp.einsum("cbld,bjd->cblj", outs32, tgtJ)
        pos_band = jnp.take_along_axis(pos_full, band[None, None], axis=3)
    else:
        pos_band = jnp.stack(
            [jnp.einsum("cbld,bld->cbl", outs32, tgtJ[:, p : p + L])
             for p in range(P)],
            axis=-1,
        )                                                     # [C, B, L, P]

    lse = jnp.logaddexp(pos_band * scale, lse_neg)
    tok_ce = lse - pos_band * scale                           # [C, B, L, P]
    m = (base_mask[None] & extra_masks).astype(jnp.float32)   # [C, B, P, L]
    m = jnp.moveaxis(m, 2, 3)                                 # [C, B, L, P]
    cnt = jnp.sum(m, axis=(1, 2))                             # [C, P]
    per_cp = jnp.sum(tok_ce * m, axis=(1, 2)) / jnp.clip(cnt, 1.0, None)
    lw = jnp.asarray(loss_weights, jnp.float32)
    per_cp = horizon_discount[None, :] * lw[:, None] * per_cp  # [C, P]
    per_cat = per_cp.sum(axis=1)
    per_pred = per_cp.sum(axis=0)

    log_dict: Dict[str, jnp.ndarray] = {}
    if compute_topk_log:
        raw0 = jax.lax.stop_gradient(raw[0]).astype(jnp.float32)
        k0 = (keep_ind if shared_negs else keep_ind[0])[:, :L].astype(bool)
        m0 = m[0, :, :, 0]                                    # [B, L]
        cnt0 = jnp.clip(m0.sum(), 1.0, None)
        n_unmasked = jnp.sum(k0, axis=-1).astype(jnp.float32) + 1.0
        log_dict["nce_samples"] = jnp.sum(n_unmasked * m0) / cnt0
        under = jax.lax.stop_gradient(
            (kept_b[0, :, :, 0] <= 0.0) & (n_unmasked > 1.0)
        ).astype(jnp.float32)
        log_dict["nce_underflow_rate"] = jnp.sum(under * m0) / cnt0
        pos0 = jax.lax.stop_gradient(pos_band[0, :, :, 0])
        beaten = jnp.sum((raw0 > pos0[:, :, None]) & k0, axis=-1)
        for kk in (1, 5, 10, 50, 100):
            if kk > raw0.shape[-1] + 1:
                break
            acc = (beaten < kk).astype(jnp.float32)
            log_dict[f"nce_top{kk}_acc"] = jnp.sum(acc * m0) / cnt0

    return per_cp.sum(), per_pred, per_cat, log_dict
