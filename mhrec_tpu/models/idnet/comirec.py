"""ComiRec — multi-interest baseline on the HSTU backbone.

Behavior parity with reference ``code/REC/model/IDNet/comirec.py``: HSTU
trunk → per-position *causal* self-attentive interest extraction (K interest
capsules over the prefix window), hard readout (argmax interest per target)
for training, per-interest retrieval scores ``(B, K, I)`` at predict.

Efficiency: the reference materializes (B, L, L, D) causal context windows
(comirec.py:227-258). The same math — per-window masked softmax over prefix
positions — telescopes into cumulative sums:

    interest[b, l, k] = Σ_{j≤l} softmax_j(w[b,j,k]) · out[b,j]
                      = cumsum(e·out)[l] / cumsum(e)[l],  e = exp(w)·mask

turning O(L²·(K+D)) into O(L·K·D) with identical results (the stabilizing
max is per (b, k), constant across windows, so it cancels).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.idnet.hstu import STULayer
from mhrec_tpu.models.layers import ItemEmbed, cosine_normalize, trunc_normal_init
from mhrec_tpu.models.losses import clamp_logit_scale
from mhrec_tpu.utils.enums import InputType


def causal_interest_state(attn_logits, output_embs, mask):
    """Cumulative-sum causal multi-interest extraction.

    attn_logits: [B, L, K]; output_embs: [B, L, D]; mask: [B, L] bool.
    Returns (interests [B, L, K, D], S1 [B, L, K], S2 [B, L, K], cnt [B, L]).
    ``interests[b, l]`` attends over valid positions j ≤ l.
    """
    logits = attn_logits.astype(jnp.float32)
    m = jnp.max(jnp.where(mask[..., None], logits, -jnp.inf), axis=1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(mask[..., None], jnp.exp(logits - m), 0.0)  # [B, L, K]
    S1 = jnp.cumsum(e, axis=1)                                # [B, L, K]
    S2 = jnp.cumsum(e * e, axis=1)
    num = jnp.cumsum(
        e[..., None] * output_embs.astype(jnp.float32)[:, :, None, :], axis=1
    )  # [B, L, K, D]
    denom = jnp.clip(S1, 1e-20, None)[..., None]
    interests = jnp.where(S1[..., None] > 0, num / denom, 0.0)
    cnt = jnp.cumsum(mask.astype(jnp.float32), axis=1)        # [B, L]
    return interests, S1, S2, cnt


def routing_regularization(S1, S2, cnt, hidden_dim):
    """REMI RR loss per position from the cumulative stats.

    Per window: Σ_j dev² = Σ_j A² - 1/cnt with A = e/S1 (softmax rows sum
    to 1), variance = Σ dev² / hidden_dim, loss = ‖variances‖² per (b, l)
    (reference remi.py:156-199, telescoped).
    """
    sum_A2 = jnp.where(S1 > 0, S2 / jnp.clip(S1 * S1, 1e-30, None), 0.0)  # [B,L,K]
    inv_cnt = jnp.where(cnt > 0, 1.0 / jnp.clip(cnt, 1.0, None), 0.0)[..., None]
    sum_dev2 = jnp.clip(sum_A2 - inv_cnt, 0.0, None)
    variances = sum_dev2 / hidden_dim
    return jnp.sum(variances * variances, axis=-1)  # [B, L]


class _InterestTrunk(nn.Module):
    """Shared HSTU trunk + interest attention net for ComiRec/REMI."""

    item_num: int
    item_embedding_size: int
    hstu_embedding_size: int
    max_seq_length: int
    n_layers: int
    n_heads: int
    hidden_act: str
    hidden_dropout_prob: float
    num_interest: int
    interest_hidden: int
    attention_net_bias: bool = True
    skip_hstu: bool = False
    use_input_dropout: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        D = self.hstu_embedding_size
        self.item_embedding = ItemEmbed(
            self.item_num, self.item_embedding_size, embedding_init=trunc_normal_init
        )
        if self.item_embedding_size != D:
            self.item_id_proj_tower = nn.Dense(D, use_bias=False, kernel_init=trunc_normal_init)
        else:
            self.item_id_proj_tower = None
        self.position_embedding = nn.Embed(
            self.max_seq_length + 1, D, embedding_init=trunc_normal_init
        )
        self.stu_layers = [
            STULayer(
                embedding_dim=D,
                linear_dim=D // self.n_heads,
                attention_dim=D // self.n_heads,
                num_heads=self.n_heads,
                dropout_ratio=self.hidden_dropout_prob,
                linear_activation=self.hidden_act,
                dtype=self.dtype,
                name=f"stu_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.attn_hidden = nn.Dense(
            self.interest_hidden, use_bias=self.attention_net_bias,
            kernel_init=trunc_normal_init, bias_init=trunc_normal_init,
        )
        self.attn_out = nn.Dense(
            self.num_interest, use_bias=False, kernel_init=trunc_normal_init
        )
        self.attn_dropout = nn.Dropout(self.hidden_dropout_prob)
        self.in_dropout = nn.Dropout(self.hidden_dropout_prob)

    def embed(self, items):
        e = self.item_embedding(items)
        if self.item_id_proj_tower is not None:
            e = self.item_id_proj_tower(e)
        return e

    def encode(self, items_ctx, deterministic: bool = True):
        B, L = items_ctx.shape
        x = self.embed(items_ctx) + self.position_embedding(jnp.arange(L)[None, :])
        if self.skip_hstu:
            if self.use_input_dropout:
                x = self.in_dropout(x, deterministic=deterministic)
            return x.astype(self.dtype)
        non_pad = items_ctx != 0
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))
        mask = non_pad[:, None, None, :] & causal[None, None]
        x = x.astype(self.dtype)
        for layer in self.stu_layers:
            x = layer(x, mask, deterministic=deterministic)
        return x

    def interest_logits(self, output_embs, deterministic: bool = True):
        h = jnp.tanh(self.attn_hidden(output_embs.astype(jnp.float32)))
        h = self.attn_dropout(h, deterministic=deterministic)
        return self.attn_out(h)  # [B, L, K]


class ComiRec(nn.Module):
    item_num: int
    item_embedding_size: int
    hstu_embedding_size: int
    max_seq_length: int
    pred_len: int
    n_layers: int
    n_heads: int
    hidden_act: str = "silu"
    hidden_dropout_prob: float = 0.1
    num_interest: int = 4
    interest_hidden: int = 0
    attention_net_bias: bool = True
    skip_hstu: bool = False
    use_input_dropout: bool = False
    medusa_lambda: float = 0.99
    nce_thres: float = 0.99
    fix_temp: bool = False
    eval_pred_len: int = 1
    # REMI extensions (inactive at 0)
    lambda_rr: float = 0.0
    beta_ihn: float = 0.0

    input_type = InputType.SEQ

    @property
    def medusa_num_heads(self) -> int:
        return self.num_interest

    def setup(self):
        self.trunk = _InterestTrunk(
            item_num=self.item_num,
            item_embedding_size=self.item_embedding_size,
            hstu_embedding_size=self.hstu_embedding_size,
            max_seq_length=self.max_seq_length,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            hidden_act=self.hidden_act,
            hidden_dropout_prob=self.hidden_dropout_prob,
            num_interest=self.num_interest,
            interest_hidden=self.interest_hidden or self.hstu_embedding_size // 2,
            attention_net_bias=self.attention_net_bias,
            skip_hstu=self.skip_hstu,
            use_input_dropout=self.use_input_dropout,
        )
        if self.fix_temp:
            self.logit_scale_fixed = jnp.asarray(np.log(1 / 0.05), jnp.float32)
        else:
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.05), jnp.float32)
            )

    def _scale(self):
        if self.fix_temp:
            return jnp.exp(self.logit_scale_fixed)
        return clamp_logit_scale(self.logit_scale)

    def horizon_discount(self):
        d = jnp.asarray([self.medusa_lambda ** p for p in range(self.pred_len)], jnp.float32)
        return d / d.sum()

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        items = batch["items"]
        user_mask = batch["masked_index"].astype(bool)
        L, P = self.max_seq_length, self.pred_len
        B = items.shape[0]

        pos_items_embs = self.trunk.embed(items).astype(jnp.float32)  # [B, L+P, D]
        ctx_items = jnp.where(user_mask[:, :L], items[:, :L], 0)
        output_embs = self.trunk.encode(ctx_items, deterministic=deterministic)
        ctx_mask = user_mask[:, :L]

        attn_logits = self.trunk.interest_logits(output_embs, deterministic=deterministic)
        interests, S1, S2, cnt = causal_interest_state(
            attn_logits, output_embs, ctx_mask
        )  # [B, L, K, D]

        model_out: Dict[str, jnp.ndarray] = {}
        total = jnp.asarray(0.0, jnp.float32)

        if self.lambda_rr > 0:
            rr = routing_regularization(S1, S2, cnt, self.hstu_embedding_size)  # [B, L]
            valid_steps = jnp.clip(ctx_mask.astype(jnp.float32).sum(), 1.0, None)
            rr_loss = jnp.sum(rr * ctx_mask.astype(jnp.float32)) / valid_steps
            model_out["rr_loss"] = jax.lax.stop_gradient(rr_loss)
            total = total + self.lambda_rr * rr_loss

        neg_flat = batch["neg_items"][:, -1].reshape(-1)
        neg_norm = cosine_normalize(self.trunk.embed(neg_flat).astype(jnp.float32))
        neg_T = neg_norm.T

        lam = self.horizon_discount()
        scale = self._scale().astype(jnp.float32)
        min_val = jnp.finfo(jnp.float32).min
        per_pred = []
        for p in range(P):
            tgt_raw = pos_items_embs[:, p + 1 : p + 1 + L]              # [B, L, D]
            # hard readout: interest maximizing raw similarity to target
            sim = jnp.einsum("blkd,bld->blk", interests, tgt_raw)
            best = jnp.argmax(sim, axis=-1)                             # [B, L]
            cur = jnp.take_along_axis(
                interests, best[..., None, None], axis=2
            ).squeeze(2)                                                # [B, L, D]

            out_n = cosine_normalize(cur)
            tgt_n = cosine_normalize(tgt_raw)
            pos_logit = jnp.einsum("bld,bld->bl", out_n, tgt_n)
            neg_logits = jnp.einsum("bld,dm->blm", out_n, neg_T)
            fix = jnp.einsum("bld,dm->blm", tgt_n, neg_T)
            neg_logits = jnp.where(fix > self.nce_thres, min_val, neg_logits)

            m = (ctx_mask & user_mask[:, p + 1 : p + 1 + L]).astype(jnp.float32)
            cnt_p = jnp.clip(m.sum(), 1.0, None)
            if self.beta_ihn > 0:
                tok = self._ihn_token_loss(pos_logit, neg_logits, scale)
            else:
                lse = jnp.logaddexp(
                    pos_logit * scale,
                    jax.scipy.special.logsumexp(neg_logits * scale, axis=-1),
                )
                tok = lse - pos_logit * scale
            mean_p = jnp.sum(tok * m) / cnt_p
            per_pred.append(lam[p] * mean_p)

            if p == 0:
                n_unmasked = (neg_logits > min_val / 100).sum(-1).astype(jnp.float32) + 1
                model_out["nce_samples"] = jnp.sum(n_unmasked * m) / cnt_p
                beaten = (neg_logits > pos_logit[..., None]).sum(-1)
                for kk in (1, 5, 10, 50, 100):
                    if kk > neg_logits.shape[-1] + 1:
                        break
                    model_out[f"nce_top{kk}_acc"] = (
                        jnp.sum((beaten < kk).astype(jnp.float32) * m) / cnt_p
                    )
        total = total + jnp.stack(per_pred).sum()
        model_out["loss"] = total
        return model_out

    def _ihn_token_loss(self, pos_logit, neg_logits, scale):
        """Interest-aware hard-negative loss, log-space
        (reference remi.py:201-278)."""
        beta = self.beta_ihn
        pos = pos_logit * scale
        neg = neg_logits * scale
        n_neg = neg.shape[-1]
        log_num = jax.scipy.special.logsumexp((beta + 1.0) * neg, axis=-1)
        log_Z = jax.scipy.special.logsumexp(beta * neg, axis=-1) - jnp.log(float(n_neg))
        log_neg_ihn = log_num - log_Z
        log_den = jnp.logaddexp(pos, log_neg_ihn)
        return log_den - pos

    # ------------------------------------------------------------------
    def predict_embeddings(self, item_seq, target_tags=None):
        out = self.trunk.encode(item_seq, deterministic=True)
        mask = item_seq != 0
        logits = self.trunk.interest_logits(out, deterministic=True)  # [B, L, K]
        w = jnp.where(mask[..., None], logits.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(w, axis=1)
        probs = jnp.nan_to_num(probs, nan=0.0)
        interests = jnp.einsum("blk,bld->bkd", probs, out.astype(jnp.float32))
        return {
            "head_embs": cosine_normalize(interests),
            "user_emb": cosine_normalize(out[:, -1].astype(jnp.float32)),
        }

    def score_items(self, head_embs, item_feats, item_tags, target_tags, switch_pred):
        return jnp.einsum("bhd,id->bhi", head_embs, item_feats)

    def compute_item_all(self):
        w = self.trunk.item_embedding.embedding
        if self.trunk.item_id_proj_tower is not None:
            w = self.trunk.item_id_proj_tower(w)
        return cosine_normalize(w.astype(jnp.float32))


def comirec_from_config(config, dataload) -> ComiRec:
    return ComiRec(
        item_num=dataload.item_num,
        item_embedding_size=config["item_embedding_size"],
        hstu_embedding_size=config["hstu_embedding_size"],
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        pred_len=config["pred_len"],
        n_layers=config["n_layers"],
        n_heads=config["n_heads"],
        hidden_act=config["hidden_act"] or "silu",
        hidden_dropout_prob=config["hidden_dropout_prob"] or 0.1,
        num_interest=config.get("interest_num", config.get("num_interest", 4)),
        interest_hidden=config.get("interest_hidden", 0) or 0,
        skip_hstu=config.get("skip_hstu", False),
        use_input_dropout=config.get("input_dropout", False),
        medusa_lambda=config["medusa_lambda"],
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        eval_pred_len=config["eval_pred_len"],
    )
