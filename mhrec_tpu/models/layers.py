"""Shared model building blocks (flax.linen).

Counterparts of the reference layer zoo (``REC/model/layers.py``,
``llm_heads.py``): ResBlock medusa heads, asymmetric focal loss, MLP stacks,
and init helpers matching the reference's truncated-normal(0.02) scheme
(hstu.py:23-31, 574-588).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# reference reset_params applies truncated_normal(std=0.02) to everything
# outside the HSTU trunk
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def l2_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps, None)


def cosine_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """x / max(||x||, eps) — the reference mixes plain ``x / x.norm()``
    (hstu.py:605-606, always on non-zero rows) and ``F.normalize`` with
    torch's default eps=1e-12 (comirec.py:166-167, where all-padded prefix
    windows yield exactly-zero interest vectors). The eps form is NaN-safe on
    those zero rows — and numerically identical on every real embedding —
    so it is used everywhere."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, 1e-12)


class ItemEmbed(nn.Module):
    """Item-embedding table whose lookups can be redirected to a per-batch
    sub-table of gathered unique rows.

    Drop-in for ``nn.Embed`` (same param name/shape/init, same ``.embedding``
    attribute used by ``compute_item_all``), plus the sparse_item_adam hook:
    when the trainer passes a ``{"sub": …{"table": [U, D]}}`` variable
    collection, lookups read THAT table (batch ids are then LOCAL indices
    into it) and the full-table param goes unused — its zero gradient is
    dead-code-eliminated, and the trainer row-updates only the touched rows
    (trainer/sparse_adam.py). A variable collection is used instead of
    substituting the param leaf because flax shape-checks params on
    retrieval."""

    num_embeddings: int
    features: int
    embedding_init: Callable = nn.initializers.normal(stddev=0.02)

    def setup(self):
        self.embedding = self.param(
            "embedding", self.embedding_init,
            (self.num_embeddings, self.features),
        )

    def __call__(self, ids):
        table = self.embedding
        if self.has_variable("sub", "table"):
            table = self.get_variable("sub", "table")
        return jnp.take(table, ids, axis=0)


class ResBlock(nn.Module):
    """Linear + SiLU residual block (reference llm_heads.py:5-40)."""

    hidden_size: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(
            self.hidden_size,
            kernel_init=trunc_normal_init,
            bias_init=trunc_normal_init,
        )(x)
        return x + nn.silu(h)


class Rescale(nn.Module):
    """Elementwise rescaling (reference llm_heads.py:44-70)."""

    size: int
    learnable: bool = False

    @nn.compact
    def __call__(self, x):
        if self.learnable:
            w = self.param(
                "mul_weight",
                lambda key, shape: jnp.ones(shape) + 0.1 * jax.random.normal(key, shape),
                (self.size,),
            )
        else:
            w = self.variable(
                "constants", "mul_weight",
                lambda: jnp.ones((self.size,)) + 0.1 * jax.random.normal(
                    self.make_rng("params"), (self.size,)
                ),
            ).value
        return x * w


class MLPLayers(nn.Module):
    """Dense stack with optional dropout/activation (reference layers.py:117-172)."""

    layers: Sequence[int]
    dropout: float = 0.0
    activation: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, width in enumerate(self.layers[1:]):
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.Dense(width, kernel_init=trunc_normal_init)(x)
            if self.activation is not None and i < len(self.layers) - 2:
                x = self.activation(x)
        return x


class TransformerLayer(nn.Module):
    """Post-LN transformer block (reference layers.py:421-637 RecBole style):
    softmax MHA + residual + LN, then FFN + residual + LN."""

    n_heads: int
    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float = 0.1
    attn_dropout_prob: float = 0.1
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        B, L, D = x.shape
        h = self.n_heads
        dh = D // h
        qkv = nn.DenseGeneral((3, h, dh), axis=-1, name="qkv")(x)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(dh).astype(x.dtype)
        scores = scores + attn_bias  # additive mask: 0 or -1e9
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout_prob)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(B, L, D)
        ctx = nn.Dense(D, name="attn_out")(ctx)
        ctx = nn.Dropout(self.hidden_dropout_prob)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attn_ln")(x + ctx)

        # "gelu" is the exact erf form (HF/RecBole torch.nn.functional.gelu)
        act = {"gelu": lambda t: nn.gelu(t, approximate=False),
               "relu": nn.relu, "silu": nn.silu,
               "swish": nn.silu, "tanh": jnp.tanh}[self.hidden_act]
        ff = nn.Dense(self.inner_size, name="ff_in")(x)
        ff = act(ff)
        ff = nn.Dense(D, name="ff_out")(ff)
        ff = nn.Dropout(self.hidden_dropout_prob)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="ff_ln")(x + ff)


class TransformerEncoder(nn.Module):
    """Stack of TransformerLayers."""

    n_layers: int
    n_heads: int
    hidden_size: int
    inner_size: int
    hidden_dropout_prob: float = 0.1
    attn_dropout_prob: float = 0.1
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        for i in range(self.n_layers):
            x = TransformerLayer(
                n_heads=self.n_heads,
                hidden_size=self.hidden_size,
                inner_size=self.inner_size,
                hidden_dropout_prob=self.hidden_dropout_prob,
                attn_dropout_prob=self.attn_dropout_prob,
                hidden_act=self.hidden_act,
                layer_norm_eps=self.layer_norm_eps,
                name=f"layer_{i}",
            )(x, attn_bias, deterministic=deterministic)
        return x


def additive_causal_mask(items: jnp.ndarray, bidirectional: bool = False):
    """0 / -1e9 additive attention mask from non-pad item ids
    (reference sasrec.py get_attention_mask)."""
    L = items.shape[1]
    keep = items != 0
    mask = keep[:, None, None, :]
    if not bidirectional:
        causal = jnp.tril(jnp.ones((L, L), bool))
        mask = mask & causal[None, None]
    return jnp.where(mask, 0.0, -1e9)


def asymmetric_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma_pos: float = 0.0,
    gamma_neg: float = 4.0,
    clip: float = 0.05,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Asymmetric focal BCE (reference layers.py:16-84), mean-reduced.

    ``logits``/``targets``: [..., num_tasks]; loss summed over the last axis
    then averaged.
    """
    x_sigmoid = jax.nn.sigmoid(logits)
    xs_pos = x_sigmoid
    xs_neg = 1.0 - x_sigmoid
    if clip and clip > 0:
        xs_neg = jnp.clip(xs_neg + clip, None, 1.0)
    los_pos = targets * jnp.log(jnp.clip(xs_pos, eps, None))
    los_neg = (1.0 - targets) * jnp.log(jnp.clip(xs_neg, eps, None))
    loss = los_pos + los_neg
    if gamma_neg > 0 or gamma_pos > 0:
        pt = xs_pos * targets + xs_neg * (1.0 - targets)
        gamma = gamma_pos * targets + gamma_neg * (1.0 - targets)
        loss = loss * jnp.power(1.0 - pt, gamma)
    return jnp.mean(-loss.sum(axis=-1))


def weighted_bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: jnp.ndarray
) -> jnp.ndarray:
    """torch.binary_cross_entropy_with_logits(pos_weight=...) equivalent,
    mean-reduced over every element (reference hstu.py:794-796)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(loss)
