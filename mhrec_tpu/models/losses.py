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
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, per_pred_loss[P], log_dict)."""
    B, H, L, D = head_embs.shape
    P = base_mask.shape[1]
    scale = clamp_logit_scale(logit_scale).astype(jnp.float32)

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
