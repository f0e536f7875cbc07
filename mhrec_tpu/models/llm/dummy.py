"""DummyLLM — embedding + linear debug backend (reference layers.py:94-114):
lets the full HLLM pipeline run without checkpoint-scale weights."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class DummyLLM(nn.Module):
    vocab_size: int
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask=None,
        position_ids=None,
        causal: bool = True,
        emb_tokens=None,
        emb_pos=None,
        segment_ids=None,
    ) -> jnp.ndarray:
        if input_ids is not None:
            assert inputs_embeds is None
            out = nn.Embed(
                self.vocab_size, self.hidden_size,
                embedding_init=nn.initializers.normal(0.02), name="input_layer",
            )(input_ids)
        elif inputs_embeds is not None:
            out = inputs_embeds
        else:
            raise ValueError("provide input_ids or inputs_embeds")
        return nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.normal(0.02),
            name="embed_layer", dtype=self.dtype,
        )(out.astype(self.dtype))
