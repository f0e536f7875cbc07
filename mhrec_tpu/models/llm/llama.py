"""Flax decoder backbone for the Llama family (llama / TinyLlama / mistral /
qwen2 / baichuan topology): RMSNorm → GQA attention with RoPE (or ALiBi for
the Baichuan-13B variant) → SwiGLU MLP, pre-norm residuals, final RMSNorm.

TPU-native counterpart of the reference's vendored+patched HF
``modeling_{llama,mistral,qwen2}.py`` stacks: instead of flash-attn varlen
kernels over rm-pad packed batches (``flash_self_attn.py``), item texts run
as a dense padded ``[N, T]`` batch whose mask removes pad keys — static
shapes, MXU-friendly, XLA-fused. The learnable item-embedding token is
scattered into each row's trailing slot (reference
``modeling_llama.py:1220-1228``) by the caller before invoking the backbone
via ``inputs_embeds``.

Supports ``input_ids`` or ``inputs_embeds``, causal or bidirectional masks,
and fp32 params with bf16 compute.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.llm.config import LLMConfig


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return (x * w).astype(dtype)


def rope_parameters(c, head_dim: int, seq_len: int | None = None):
    """(inv_freq [head_dim//2], attention_scaling) for the configured RoPE
    scaling variant — semantics of the reference's vendored HF
    ``modeling_rope_utils.py`` (``_compute_{linear,dynamic_ntk,yarn}_
    parameters``), verified token-for-token against transformers in
    tests/test_hf_parity.py."""
    import math

    base = c.rope_theta
    d = head_dim
    exp = np.arange(0, d, 2, dtype=np.float32) / d
    t = c.rope_scaling_type
    if t is None:
        return 1.0 / (base ** exp), 1.0
    f = c.rope_scaling_factor
    if t == "linear":
        return 1.0 / (base ** exp) / f, 1.0
    if t == "dynamic":
        # NTK: rescale the base when the sequence outgrows the training
        # window. HF's `_compute_dynamic_ntk_parameters` uses
        # max_position_embeddings as the window (its
        # original_max_position_embeddings is an acknowledged TODO) and
        # clamps seq_len from below, so at/below the window this is exactly
        # the unscaled frequencies. The backbone passes its static T — a
        # compiled shape IS the sequence length, so "dynamic" needs no
        # runtime recomputation here.
        orig = c.max_position_embeddings
        L = max(seq_len or orig, orig)
        base2 = base * ((f * L / orig) - (f - 1)) ** (d / (d - 2))
        return 1.0 / (base2 ** exp), 1.0
    orig = c.rope_orig_max_pos or c.max_position_embeddings
    if t == "yarn":
        pos_freqs = base ** exp
        inv_extrapolation = 1.0 / pos_freqs
        inv_interpolation = 1.0 / (f * pos_freqs)

        def corr_dim(n_rot):
            return (d * math.log(orig / (n_rot * 2 * math.pi))) / (
                2 * math.log(base)
            )

        low = max(math.floor(corr_dim(c.rope_beta_fast)), 0)
        high = min(math.ceil(corr_dim(c.rope_beta_slow)), d - 1)
        if low == high:
            high += 0.001  # HF's divide-by-zero guard
        ramp = (np.arange(d // 2, dtype=np.float32) - low) / (high - low)
        extrapolation_factor = 1.0 - np.clip(ramp, 0.0, 1.0)
        inv = (
            inv_interpolation * (1.0 - extrapolation_factor)
            + inv_extrapolation * extrapolation_factor
        )
        att = c.rope_attention_factor
        if att is None:
            att = 0.1 * math.log(f) + 1.0 if f > 1.0 else 1.0
        return inv.astype(np.float32), float(att)
    raise ValueError(f"unsupported rope_scaling type: {t!r}")


def rotary_embedding(positions: jnp.ndarray, head_dim: int, config,
                     seq_len: int | None = None):
    """cos/sin tables: positions [B, T] → [B, T, head_dim//2] each.
    ``config`` is an LLMConfig (scaling-aware) or a plain theta float."""
    if isinstance(config, (int, float)):
        inv_freq = 1.0 / (
            config ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
        )
        scale = 1.0
    else:
        inv_freq, scale = rope_parameters(config, head_dim, seq_len)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    return jnp.cos(freqs) * scale, jnp.sin(freqs) * scale


def mrope_rotary_embedding(positions: jnp.ndarray, head_dim: int, theta: float,
                           section) -> tuple:
    """Multimodal RoPE (qwen2_vl): positions [3, B, T] with (t, h, w)
    components; ``section`` lists how many of the head_dim//2 rotary
    frequencies each component drives (reference modeling_qwen2_vl.py
    apply_multimodal_rotary_pos_emb). → cos/sin [B, T, head_dim//2]."""
    assert sum(section) == head_dim // 2, (section, head_dim)
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq[None, None, None, :]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)   # [3, B, T, dh/2]
    parts_c, parts_s = [], []
    off = 0
    for i, s in enumerate(section):
        parts_c.append(cos[i, ..., off:off + s])
        parts_s.append(sin[i, ..., off:off + s])
        off += s
    return jnp.concatenate(parts_c, -1), jnp.concatenate(parts_s, -1)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (Press et al. 2022), the closest-power-of-two
    interpolation transformers uses in ``build_alibi_tensor``
    (models/bloom/modeling_bloom.py) — parity-tested against it in
    tests/test_hf_parity.py."""
    import math

    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = base ** np.arange(1, closest + 1, dtype=np.float32)
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_extra = min(closest, n_heads - closest)
        extra = extra_base ** np.arange(1, 1 + 2 * n_extra, 2, dtype=np.float32)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


def apply_rope(x, cos, sin):
    """x: [B, T, H, D]; rotate-half convention (HF Llama)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _maybe_tp(init, names, enabled: bool):
    """Wrap an initializer with 'model'-axis partition metadata (Megatron
    column/row parallel via GSPMD); identity when TP is off. The trainer
    falls back to replication for any param whose dims don't divide."""
    return nn.with_partitioning(init, names) if enabled else init


class LlamaAttention(nn.Module):
    config: LLMConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask_bias, cos, sin, segment_ids=None,
                 alibi_bias=None):
        c = self.config
        B, T, D = x.shape
        h, hk = c.num_attention_heads, c.num_key_value_heads
        dh = D // h
        dense = lambda feats, name: nn.DenseGeneral(
            feats, axis=-1, use_bias=c.attention_bias, dtype=self.dtype,
            kernel_init=_maybe_tp(
                nn.initializers.normal(0.02), (None, "model", None), c.tp_shard
            ),
            bias_init=_maybe_tp(
                nn.initializers.zeros, ("model", None), c.tp_shard
            ),
            name=name,
        )
        q = dense((h, dh), "q_proj")(x)
        k = dense((hk, dh), "k_proj")(x)
        v = dense((hk, dh), "v_proj")(x)
        if cos is not None:  # RoPE; None ⇒ alibi (distance bias on scores)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        if hk != h:
            rep = h // hk
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        if segment_ids is not None:
            if alibi_bias is not None:
                raise NotImplementedError(
                    "packed varlen attention has no score-bias input (the "
                    "splash kernel takes segment ids only) — alibi towers "
                    "must run the dense padded path (packed_varlen: false)"
                )
            # packed varlen batch: causal-within-segment attention
            # (reference flash_attn_varlen path, flash_self_attn.py:61-130);
            # packed_window bounds the splash kernel to a causal band
            from mhrec_tpu.models.llm.packed import packed_attention

            # a sliding window tighter than the packed band wins: splash
            # LocalMask(left=w) allows i-j <= w, so mistral's
            # "attend to the last `sw` tokens" is left = sw - 1
            w = c.packed_window or None
            if c.sliding_window and (w is None or c.sliding_window - 1 < w):
                w = c.sliding_window - 1
            if segment_ids.ndim == 2:
                # chunked packing [C, chunk]: one splash call per chunk row
                # (vmapped) — kernel grid bounded by the chunk length
                ctx = jax.vmap(
                    lambda qq, kk, vv, ss: packed_attention(
                        qq, kk, vv, ss, window=w
                    )
                )(q, k, v, segment_ids)
            else:
                ctx = packed_attention(
                    q[0], k[0], v[0], segment_ids, window=w,
                )[None]
            ctx = ctx.reshape(B, T, D)
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(dh)
            scores = scores.astype(jnp.float32) + mask_bias
            if alibi_bias is not None:
                # [H, T, T] broadcast over batch — fused into the score add,
                # never materialized at [B, H, T, T]
                scores = scores + alibi_bias[None]
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.DenseGeneral(
            D, axis=-1, use_bias=False, dtype=self.dtype,
            kernel_init=_maybe_tp(
                nn.initializers.normal(0.02), ("model", None), c.tp_shard
            ),
            name="o_proj",
        )(ctx)


class LlamaMLP(nn.Module):
    config: LLMConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.config
        col = _maybe_tp(nn.initializers.normal(0.02), (None, "model"), c.tp_shard)
        row = _maybe_tp(nn.initializers.normal(0.02), ("model", None), c.tp_shard)
        gate = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                        kernel_init=col, name="gate_proj")(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, dtype=self.dtype,
                      kernel_init=col, name="up_proj")(x)
        return nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                        kernel_init=row, name="down_proj")(
            nn.silu(gate) * up
        )


class LlamaLayer(nn.Module):
    config: LLMConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask_bias, cos, sin, segment_ids=None,
                 alibi_bias=None):
        h = RMSNorm(self.config.rms_norm_eps, name="input_layernorm")(x)
        x = x + LlamaAttention(self.config, self.dtype, name="self_attn")(
            h, mask_bias, cos, sin, segment_ids, alibi_bias
        )
        h = RMSNorm(self.config.rms_norm_eps, name="post_attention_layernorm")(x)
        return x + LlamaMLP(self.config, self.dtype, name="mlp")(h)


class LlamaBackbone(nn.Module):
    """Decoder stack returning last hidden states [B, T, D]."""

    config: LLMConfig
    dtype: Any = jnp.bfloat16
    gradient_checkpointing: bool = False
    # 'full' = recompute everything in the layer on the backward pass (HF
    # gradient-checkpointing semantics, ~25% step-time overhead measured at
    # the HLLM bench shape); 'dots' = save matmul outputs, recompute only
    # elementwise ops — near no-remat speed at a fraction of the activation
    # memory. Ignored unless gradient_checkpointing.
    remat_policy: str = "full"

    hidden_size: int = 0  # resolved from config at init

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,  # [B, T] 1 = keep
        position_ids: Optional[jnp.ndarray] = None,
        causal: bool = True,
        emb_tokens: Optional[jnp.ndarray] = None,  # [1, 1, D] learnable slot
        emb_pos: Optional[jnp.ndarray] = None,     # [B] slot index per row
        segment_ids: Optional[jnp.ndarray] = None,  # [S] packed varlen mode
        image_embeds: Optional[jnp.ndarray] = None,  # [B, n_img, D]
        image_span: Optional[tuple] = None,          # static (start, n_img)
        image_src: Optional[jnp.ndarray] = None,     # [B, T] dynamic gather map
    ) -> jnp.ndarray:
        c = self.config
        if inputs_embeds is None:
            assert input_ids is not None
            embed = nn.Embed(
                c.vocab_size, c.hidden_size,
                embedding_init=nn.initializers.normal(0.02),
                name="embed_tokens",
            )
            inputs_embeds = embed(input_ids)
        if image_embeds is not None and image_src is not None:
            # dynamic-resolution splice (reference modeling_qwen2_vl.py:1858
            # masked_scatter with per-image token counts): image_src[b, t] =
            # index of the image token at position t, or -1 — one gather,
            # no data-dependent shapes
            take = jnp.take_along_axis(
                image_embeds, jnp.clip(image_src, 0)[..., None], axis=1
            )
            inputs_embeds = jnp.where(
                (image_src >= 0)[..., None],
                take.astype(inputs_embeds.dtype), inputs_embeds,
            )
        elif image_embeds is not None:
            # splice vision-tower tokens over the image-pad span (reference
            # modeling_qwen2_vl.py:1858 masked_scatter; static span here)
            s, n = image_span
            inputs_embeds = inputs_embeds.at[:, s:s + n, :].set(
                image_embeds.astype(inputs_embeds.dtype)
            )
        if emb_tokens is not None and emb_pos is not None:
            # scatter the learnable item-embedding token(s) into each row's
            # trailing slot(s): emb_tokens [1, n, D], emb_pos [B or N] = FIRST
            # slot index (reference modeling_llama.py:1220-1228; the reference
            # model itself raises for n > 1, hllm.py:87-88 — here slot i gets
            # token i, a strict superset). In packed mode emb_pos lists MANY
            # first-slots within the single flat row.
            T = inputs_embeds.shape[1]
            n_emb = emb_tokens.shape[1]
            if segment_ids is not None:
                # packed modes: emb_pos are FLAT indices into the [B·T]
                # token stream (legacy [1, S] and chunked [C, chunk] alike)
                Bc = inputs_embeds.shape[0]
                Dh = inputs_embeds.shape[-1]
                flat = inputs_embeds.reshape(Bc * T, Dh)
                for i in range(n_emb):
                    ind = jnp.zeros((Bc * T, 1), inputs_embeds.dtype)
                    ind = ind.at[emb_pos + i].set(1.0)
                    flat = flat * (1.0 - ind) + ind * emb_tokens[0, i][None, :]
                inputs_embeds = flat.reshape(Bc, T, Dh)
            else:
                for i in range(n_emb):
                    onehot = jax.nn.one_hot(
                        emb_pos + i, T, dtype=inputs_embeds.dtype
                    )
                    inputs_embeds = (
                        inputs_embeds * (1.0 - onehot[..., None])
                        + onehot[..., None] * emb_tokens[0, i].reshape(1, 1, -1)
                    )
        x = inputs_embeds.astype(self.dtype)
        B, T, _ = x.shape
        if segment_ids is not None:
            mask_bias = None  # packed attention masks internally
        else:
            if attention_mask is None:
                attention_mask = jnp.ones((B, T), jnp.int32)
            keep = attention_mask.astype(bool)
            mask = keep[:, None, None, :]
            if causal:
                tri = jnp.tril(jnp.ones((T, T), bool))
                if c.sliding_window:
                    # mistral sliding-window attention (reference
                    # modeling_mistral.py:752): token i attends to
                    # j ∈ (i - sliding_window, i]
                    idx = jnp.arange(T)
                    tri = tri & (
                        idx[:, None] - idx[None, :] < c.sliding_window
                    )
                mask = mask & tri[None, None]
            mask_bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

        dh = c.hidden_size // c.num_attention_heads
        alibi_bias = None
        if c.alibi and segment_ids is not None:
            raise NotImplementedError(
                "packed varlen attention has no score-bias input (the "
                "splash kernel takes segment ids only) — alibi towers "
                "must run the dense padded path (packed_varlen: false)"
            )
        if c.alibi:
            # ALiBi (Baichuan-13B topology): no RoPE; per-head linear
            # distance penalty m·(j−i) added to the scores (symmetric
            # −m·|i−j| for bidirectional masks). Positions are row-shared —
            # every dense call site right-pads with arange positions, so the
            # bias is one [H, T, T] table, not [B, H, T, T].
            cos = sin = None
            pos = position_ids[0] if position_ids.ndim >= 2 else position_ids
            rel = (pos[None, :] - pos[:, None]).astype(jnp.float32)  # j − i
            if not causal:
                rel = -jnp.abs(rel)
            slopes = jnp.asarray(alibi_slopes(c.num_attention_heads))
            alibi_bias = slopes[:, None, None] * rel[None]
        elif position_ids.ndim == 3 and c.mrope_section:
            cos, sin = mrope_rotary_embedding(
                position_ids, dh, c.rope_theta, c.mrope_section
            )
        else:
            if position_ids.ndim == 3:
                position_ids = position_ids[0]
            cos, sin = rotary_embedding(position_ids, dh, c, seq_len=T)

        layer_cls = LlamaLayer
        if self.gradient_checkpointing:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_saveable
            layer_cls = nn.remat(LlamaLayer, static_argnums=(), policy=policy)
        for i in range(c.num_hidden_layers):
            x = layer_cls(c, self.dtype, name=f"layers_{i}")(
                x, mask_bias, cos, sin, segment_ids, alibi_bias
            )
        return RMSNorm(c.rms_norm_eps, name="norm")(x)
