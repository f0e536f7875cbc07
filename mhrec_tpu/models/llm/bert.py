"""Flax BERT-style bidirectional encoder tower.

Counterpart of the reference's patched ``modeling_bert.py`` (used as an HLLM
item/user tower alternative): learned absolute position embeddings,
post-LN transformer blocks with GELU FFN, bidirectional attention over
non-pad tokens. Accepts ``input_ids`` or ``inputs_embeds`` and the same
``emb_tokens``/``emb_pos`` slot-scatter interface as the Llama backbone.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mhrec_tpu.models.layers import TransformerEncoder
from mhrec_tpu.models.llm.config import LLMConfig


class BertBackbone(nn.Module):
    config: LLMConfig
    dtype: Any = jnp.bfloat16
    gradient_checkpointing: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        causal: bool = False,
        emb_tokens: Optional[jnp.ndarray] = None,
        emb_pos: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.config
        if inputs_embeds is None:
            assert input_ids is not None
            inputs_embeds = nn.Embed(
                c.vocab_size, c.hidden_size,
                embedding_init=nn.initializers.normal(0.02), name="word_embeddings",
            )(input_ids)
        if emb_tokens is not None and emb_pos is not None:
            T = inputs_embeds.shape[1]
            onehot = jax.nn.one_hot(emb_pos, T, dtype=inputs_embeds.dtype)
            inputs_embeds = (
                inputs_embeds * (1.0 - onehot[..., None])
                + onehot[..., None] * emb_tokens.reshape(1, 1, -1)
            )
        B, T, _ = inputs_embeds.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size,
            embedding_init=nn.initializers.normal(0.02), name="position_embeddings",
        )(position_ids)
        x = inputs_embeds + pos
        x = nn.LayerNorm(epsilon=c.rms_norm_eps, name="embeddings_ln")(x)
        x = x.astype(self.dtype)

        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)
        keep = attention_mask.astype(bool)[:, None, None, :]
        if causal:
            tri = jnp.tril(jnp.ones((T, T), bool))
            keep = keep & tri[None, None]
        bias = jnp.where(keep, 0.0, -1e9)

        x = TransformerEncoder(
            n_layers=c.num_hidden_layers,
            n_heads=c.num_attention_heads,
            hidden_size=c.hidden_size,
            inner_size=c.intermediate_size,
            hidden_dropout_prob=0.0,
            attn_dropout_prob=0.0,
            hidden_act="gelu",
            layer_norm_eps=c.rms_norm_eps,
            name="encoder",
        )(x, bias, deterministic=True)
        return x
