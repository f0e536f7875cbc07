"""SASRec — softmax-attention sequential baseline.

Behavior parity with reference ``code/REC/model/IDNet/sasrec.py``: post-LN
transformer over item+position embeddings (input LayerNorm + dropout), NCE
loss with per-position uniform negatives (``num_negatives`` drawn in-model,
sasrec.py:80-88) or the shared in-batch pool, false-negative masking at
``nce_thres``, CE over valid (non-pad) positions; single-head predict
returning scores against the full item matrix."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.layers import (
    ItemEmbed,
    TransformerEncoder,
    additive_causal_mask,
    cosine_normalize,
)
from mhrec_tpu.models.losses import clamp_logit_scale
from mhrec_tpu.utils.enums import InputType


class SASRec(nn.Module):
    item_num: int
    hidden_size: int
    inner_size: int
    n_layers: int
    n_heads: int
    max_seq_length: int
    hidden_dropout_prob: float = 0.1
    attn_dropout_prob: float = 0.1
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    loss_type: str = "nce"
    nce_thres: float = 0.99
    fix_temp: bool = False
    num_negatives: Optional[int] = None
    dtype: Any = jnp.float32

    input_type = InputType.SEQ
    medusa_num_heads = 1

    def setup(self):
        init = nn.initializers.normal(stddev=self.initializer_range)
        self.item_embedding = ItemEmbed(self.item_num, self.hidden_size, embedding_init=init)
        self.position_embedding = nn.Embed(self.max_seq_length, self.hidden_size, embedding_init=init)
        self.trm_encoder = TransformerEncoder(
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            hidden_size=self.hidden_size,
            inner_size=self.inner_size,
            hidden_dropout_prob=self.hidden_dropout_prob,
            attn_dropout_prob=self.attn_dropout_prob,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
        )
        self.input_norm = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.emb_dropout = nn.Dropout(self.hidden_dropout_prob)
        # init ln(1/0.07) trainable, ln(1/0.05) fixed (sasrec.py:51-56)
        if self.fix_temp:
            self.logit_scale_fixed = jnp.asarray(np.log(1 / 0.05), jnp.float32)
        else:
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
            )

    def _scale(self):
        if self.fix_temp:
            return jnp.exp(self.logit_scale_fixed)
        return clamp_logit_scale(self.logit_scale)

    def encode(self, items, deterministic: bool = True):
        L = items.shape[1]
        pos = self.position_embedding(jnp.arange(L)[None, :])
        x = self.item_embedding(items) + pos
        x = self.input_norm(x)
        x = self.emb_dropout(x, deterministic=deterministic)
        bias = additive_causal_mask(items)
        return self.trm_encoder(x, bias, deterministic=deterministic)

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        items = batch["items"]          # [B, L+1] (pred_len == 1)
        user_mask = batch["masked_index"].astype(bool)
        B, W = items.shape
        L = W - 1
        inputs = jnp.where(user_mask[:, :L], items[:, :L], 0)
        targets = items[:, 1:]

        if "pos_neg_items" in batch:
            # batcher-sampled per-position negatives (same uniform
            # [1, item_num) law as the in-model draw; required under
            # sparse_item_adam — see trainset._wants_position_negatives)
            neg_emb = cosine_normalize(
                self.item_embedding(batch["pos_neg_items"]).astype(jnp.float32)
            )
        elif self.num_negatives:
            neg = jax.random.randint(
                self.make_rng("neg"), (B, L, self.num_negatives), 1, self.item_num
            )
            neg_emb = cosine_normalize(self.item_embedding(neg).astype(jnp.float32))
        else:
            neg_flat = batch["neg_items"][:, -1].reshape(-1)
            neg_emb = cosine_normalize(
                self.item_embedding(neg_flat).astype(jnp.float32)
            )  # [M, D]

        out = self.encode(inputs, deterministic=deterministic).astype(jnp.float32)
        out = cosine_normalize(out)
        tgt = cosine_normalize(self.item_embedding(targets).astype(jnp.float32))

        pos_logits = jnp.einsum("bld,bld->bl", out, tgt)[..., None]
        if self.num_negatives:
            neg_logits = jnp.einsum("bld,blkd->blk", out, neg_emb)
            fix_logits = jnp.einsum("bld,blkd->blk", tgt, neg_emb)
        else:
            neg_logits = jnp.einsum("bld,md->blm", out, neg_emb)
            fix_logits = jnp.einsum("bld,md->blm", tgt, neg_emb)
        min_val = jnp.finfo(jnp.float32).min
        neg_logits = jnp.where(fix_logits > self.nce_thres, min_val, neg_logits)
        logits = jnp.concatenate([pos_logits, neg_logits], axis=-1) * self._scale()

        valid = (user_mask[:, :L] & user_mask[:, 1:]).astype(jnp.float32)
        ce = jax.scipy.special.logsumexp(logits, axis=-1) - logits[..., 0]
        cnt = jnp.clip(valid.sum(), 1.0, None)
        loss = jnp.sum(ce * valid) / cnt

        model_out = {"loss": loss}
        n_unmasked = (logits > min_val / 100).sum(axis=-1).astype(jnp.float32)
        model_out["nce_samples"] = jnp.sum(n_unmasked * valid) / cnt
        beaten = (neg_logits * self._scale() > pos_logits * self._scale()).sum(axis=-1)
        for k in (1, 5, 10, 50, 100):
            if k > logits.shape[-1]:
                break
            model_out[f"nce_top{k}_acc"] = jnp.sum(
                (beaten < k).astype(jnp.float32) * valid
            ) / cnt
        return model_out

    # -- eval interface -------------------------------------------------
    def predict_embeddings(self, item_seq, target_tags=None):
        out = self.encode(item_seq, deterministic=True)
        last = cosine_normalize(out[:, -1].astype(jnp.float32))
        return {"head_embs": last[:, None, :], "user_emb": last}

    def score_items(self, head_embs, item_feats, item_tags, target_tags, switch_pred):
        return jnp.einsum("bhd,id->bhi", head_embs, item_feats)

    def compute_item_all(self):
        return cosine_normalize(self.item_embedding.embedding.astype(jnp.float32))


def sasrec_from_config(config, dataload) -> SASRec:
    hidden = config["embedding_size"]
    return SASRec(
        item_num=dataload.item_num,
        hidden_size=hidden,
        inner_size=(config["inner_size"] or 1) * hidden,
        n_layers=config["n_layers"],
        n_heads=config["n_heads"],
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        hidden_dropout_prob=config["hidden_dropout_prob"] or 0.1,
        attn_dropout_prob=config["attn_dropout_prob"] or 0.1,
        hidden_act=config["hidden_act"] or "gelu",
        layer_norm_eps=config["layer_norm_eps"] or 1e-12,
        initializer_range=config["initializer_range"] or 0.02,
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        num_negatives=config["num_negatives"],
    )
