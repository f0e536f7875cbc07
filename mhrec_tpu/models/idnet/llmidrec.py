"""LLMIDRec — ID embeddings through an LLM user tower, NCE loss.

Behavior parity with reference ``code/REC/model/IDNet/llmidrec.py``: item-ID
embedding (+ optional projection to the LLM width) feeds a Llama-family user
tower via ``inputs_embeds``; NCE with per-position uniform negatives drawn
in-model (``num_negatives``) or the shared pool; CE over valid positions;
single-head predict. ``logit_scale`` init ln(1/0.07)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.layers import ItemEmbed, cosine_normalize
from mhrec_tpu.models.llm.config import LLMConfig
from mhrec_tpu.models.llm.dummy import DummyLLM
from mhrec_tpu.models.llm.llama import LlamaBackbone
from mhrec_tpu.models.losses import clamp_logit_scale
from mhrec_tpu.utils.enums import InputType


class LLMIDRec(nn.Module):
    item_num: int
    item_embed_dim: int
    llm_config: LLMConfig
    dummy_llm: bool = False
    gradient_checkpointing: bool = False
    nce_thres: float = 0.99
    fix_temp: bool = False
    num_negatives: Optional[int] = None
    dtype: Any = jnp.bfloat16

    input_type = InputType.SEQ
    medusa_num_heads = 1

    def setup(self):
        D = self.llm_config.hidden_size
        self.item_embedding = ItemEmbed(
            self.item_num, self.item_embed_dim,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.item_id_proj_tower = (
            None
            if self.item_embed_dim == D
            else nn.Dense(D, use_bias=False, kernel_init=nn.initializers.normal(0.02))
        )
        if self.dummy_llm:
            self.user_llm = DummyLLM(self.llm_config.vocab_size, D, name="user_llm")
        else:
            self.user_llm = LlamaBackbone(
                self.llm_config, dtype=self.dtype,
                gradient_checkpointing=self.gradient_checkpointing, name="user_llm",
            )
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

    def _embed(self, items):
        e = self.item_embedding(items)
        if self.item_id_proj_tower is not None:
            e = self.item_id_proj_tower(e)
        return e

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        items = batch["items"]            # [B, L+1]
        user_mask = batch["masked_index"].astype(bool)
        B, W = items.shape
        L = W - 1

        pos_embs = self._embed(items).astype(jnp.float32)
        input_emb = pos_embs[:, :L]
        tgt = cosine_normalize(pos_embs[:, 1:])

        if "pos_neg_items" in batch:
            # batcher-sampled per-position negatives (same uniform law as
            # the in-model draw; required under sparse_item_adam — see
            # trainset._wants_position_negatives)
            neg = cosine_normalize(
                self._embed(batch["pos_neg_items"]).astype(jnp.float32)
            )
        elif self.num_negatives:
            neg_ids = jax.random.randint(
                self.make_rng("neg"), (B, L, self.num_negatives), 1, self.item_num
            )
            neg = cosine_normalize(self._embed(neg_ids).astype(jnp.float32))
        else:
            neg_ids = batch["neg_items"][:, -1].reshape(-1)
            neg = cosine_normalize(self._embed(neg_ids).astype(jnp.float32))

        attn = user_mask[:, :L].astype(jnp.int32)
        out = self.user_llm(
            inputs_embeds=input_emb.astype(self.dtype), attention_mask=attn
        ).astype(jnp.float32)
        out = cosine_normalize(out)

        pos_logits = jnp.einsum("bld,bld->bl", out, tgt)[..., None]
        if self.num_negatives:
            neg_logits = jnp.einsum("bld,blkd->blk", out, neg)
            fix = jnp.einsum("bld,blkd->blk", tgt, neg)
        else:
            neg_logits = jnp.einsum("bld,md->blm", out, neg)
            fix = jnp.einsum("bld,md->blm", tgt, neg)
        min_val = jnp.finfo(jnp.float32).min
        neg_logits = jnp.where(fix > self.nce_thres, min_val, neg_logits)
        logits = jnp.concatenate([pos_logits, neg_logits], axis=-1) * self._scale()

        valid = (user_mask[:, :L] & user_mask[:, 1:]).astype(jnp.float32)
        ce = jax.scipy.special.logsumexp(logits, axis=-1) - logits[..., 0]
        cnt = jnp.clip(valid.sum(), 1.0, None)
        model_out = {"loss": jnp.sum(ce * valid) / cnt}
        n_unmasked = (logits > min_val / 100).sum(-1).astype(jnp.float32)
        model_out["nce_samples"] = jnp.sum(n_unmasked * valid) / cnt
        beaten = (neg_logits > pos_logits).sum(-1)
        for k in (1, 5, 10, 50, 100):
            if k > logits.shape[-1]:
                break
            model_out[f"nce_top{k}_acc"] = jnp.sum(
                (beaten < k).astype(jnp.float32) * valid
            ) / cnt
        return model_out

    def predict_embeddings(self, item_seq, target_tags=None):
        attn = (item_seq > 0).astype(jnp.int32)
        emb = self._embed(item_seq).astype(self.dtype)
        out = self.user_llm(inputs_embeds=emb, attention_mask=attn)
        last = cosine_normalize(out[:, -1].astype(jnp.float32))
        return {"head_embs": last[:, None, :], "user_emb": last}

    def score_items(self, head_embs, item_feats, item_tags, target_tags, switch_pred):
        return jnp.einsum("bhd,id->bhi", head_embs, item_feats)

    def compute_item_all(self):
        w = self._embed(jnp.arange(self.item_num))
        return cosine_normalize(w.astype(jnp.float32))


def llmidrec_from_config(config, dataload) -> LLMIDRec:
    dummy = bool(config.get("dummy_llm", False))
    user_dir = config.get("user_pretrain_dir")
    if dummy or not user_dir or not __import__("os").path.isdir(str(user_dir)):
        cfg = LLMConfig.tiny(
            config.get("dummy_vocab_size", 1024), config.get("dummy_hidden_size", 64)
        )
        dummy = True
    else:
        cfg = LLMConfig.from_pretrained_dir(user_dir)
    return LLMIDRec(
        item_num=dataload.item_num,
        item_embed_dim=config.get("item_embed_dim", 512),
        llm_config=cfg,
        dummy_llm=dummy,
        gradient_checkpointing=bool(config.get("gradient_checkpointing", False)),
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        num_negatives=config["num_negatives"],
    )
