"""HSTU — Hierarchical Sequential Transduction Unit, TPU-native.

Implements the model of "Actions Speak Louder than Words" (arXiv:2402.17152)
as extended by "Don't Waste It: Guiding Generative Recommenders with
Structured Human Priors via Multi-head Decoding" (arXiv:2511.10492), with
behavior parity to the reference ``code/REC/model/IDNet/hstu.py``:

* STU block (hstu.py:163-290): LayerNorm → fused ``uvqk`` projection (one
  matmul split four ways) → pointwise attention ``silu(q·kᵀ)/n`` with a
  causal non-pad mask (NO softmax) → ``u * LayerNorm(attn)`` gating → output
  projection + residual;
* learned absolute position embedding added at input (hstu.py:380,640-643);
* multi-head "medusa" decoding (hstu.py:439-571): ``num_segment_head ×
  num_prior_head`` ResBlock head stacks in multiplicative / additive /
  hierarchical interaction, plus prior-switch aux classifiers;
* multi-horizon NCE / prior losses (hstu.py:631-872) — see
  ``mhrec_tpu.models.losses`` for the fixed-shape reformulation;
* full-corpus cosine predict with per-head category masks, oracle priors
  (``prior_given_at_test``) and predicted-switch masks (hstu.py:874-1016).

The trunk runs in bfloat16 over fp32 parameters; losses and the retrieval
scores are fp32.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.layers import ResBlock, cosine_normalize, trunc_normal_init
from mhrec_tpu.models.multihead import (
    compute_multihead_losses,
    predict_switch_and_heads,
)
from mhrec_tpu.ops import hstu_attention
from mhrec_tpu.utils.enums import InputType

_NEG_INF = float("-inf")  # predict-time masks use -inf (reference hstu.py:987-1015)


class STULayer(nn.Module):
    """One Sequential Transduction Unit (reference hstu.py:163-290)."""

    embedding_dim: int
    linear_dim: int       # per-head value dim
    attention_dim: int    # per-head qk dim
    num_heads: int
    dropout_ratio: float
    linear_activation: str = "silu"
    attn_impl: str = "auto"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True, attn_bias=None):
        B, L, D = x.shape
        h, dqk, dv = self.num_heads, self.attention_dim, self.linear_dim
        normed = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="input_norm")(x)
        uvqk_dim = dv * h * 2 + dqk * h * 2
        w = self.param(
            "uvqk", nn.initializers.normal(stddev=0.02), (D, uvqk_dim), jnp.float32
        )
        mixed = jnp.dot(normed, w.astype(self.dtype))
        if self.linear_activation == "silu":
            mixed = nn.silu(mixed)
        u, v, q, k = jnp.split(mixed, [dv * h, 2 * dv * h, 2 * dv * h + dqk * h], axis=-1)
        # fused STU kernel (ops/pallas v3): attention + u·LN gating in one
        # VMEM residency, consuming the flat uvqk layout with no transposes
        fused_ok = (
            attn_bias is None
            and (dv * h) % 128 == 0
            and (dqk * h) % 128 == 0
        )
        # measured end-to-end on v5e (tools/bench_fused.py, ms/step):
        #   merrec L=400: XLA 30.6 · pallas-v2 32.3 · fused 26.2  (−14%)
        #   size4  L=50:  XLA 28.9 · fused 35.4                  (+23%)
        # 'auto' therefore picks the fused kernel on real TPU at L≥256 and
        # stays on XLA below (short L: XLA's cross-op fusion beats the
        # kernel's per-q-tile K/V residency).
        impl = self.attn_impl
        if impl == "auto" and fused_ok and L >= 256 \
                and jax.devices()[0].platform == "tpu":
            impl = "fused"
        if impl == "fused" and fused_ok:
            from mhrec_tpu.ops.pallas.hstu_attention_tpu import (
                hstu_attention_gated_pallas,
            )

            class _LNParams(nn.Module):
                dim: int

                @nn.compact
                def __call__(self):
                    # same param names/shapes as nn.LayerNorm → checkpoints
                    # are interchangeable between fused and unfused paths
                    return (
                        self.param("scale", nn.initializers.ones, (self.dim,)),
                        self.param("bias", nn.initializers.zeros, (self.dim,)),
                    )

            gamma, beta = _LNParams(dim=h * dv, name="attn_norm")()
            interpret = jax.devices()[0].platform != "tpu"
            gated = hstu_attention_gated_pallas(
                q, k, v, u, gamma, beta, attn_mask, h, interpret=interpret
            )
        else:
            q = q.reshape(B, L, h, dqk)
            k = k.reshape(B, L, h, dqk)
            v = v.reshape(B, L, h, dv)
            attn = hstu_attention(q, k, v, attn_mask, impl=impl, bias=attn_bias)
            attn = attn.reshape(B, L, h * dv)
            gated = u * nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="attn_norm")(attn)
        gated = nn.Dropout(self.dropout_ratio)(gated, deterministic=deterministic)
        out = nn.Dense(
            D,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="o_proj",
        )(gated)
        return x + out


class ScannedSTUStack(nn.Module):
    """``lax.scan`` over ``n_layers`` identical STU blocks.

    Functionally equivalent to the unrolled layer list (same math per
    layer; parameters stack along a leading [n_layers, ...] axis instead of
    living under ``stu_{i}`` names) but compiles a single layer body.

    Tradeoff measured at size4 on v5e: train-step compile ~180 s → ~40 s,
    steady step 29.4 → 45.4 ms (XLA can no longer specialize/fuse across
    layers). Use for development iteration loops (``scan_layers: true``),
    keep the unrolled default for production runs. Checkpoints are NOT
    interchangeable between the two layouts. Relative-bias modules are
    per-layer parameters and stay on the unrolled path.
    """

    n_layers: int
    embedding_dim: int
    linear_dim: int
    attention_dim: int
    num_heads: int
    dropout_ratio: float
    linear_activation: str = "silu"
    attn_impl: str = "auto"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        stack = self  # closure for field access inside the scan body

        class Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                carry = STULayer(
                    embedding_dim=stack.embedding_dim,
                    linear_dim=stack.linear_dim,
                    attention_dim=stack.attention_dim,
                    num_heads=stack.num_heads,
                    dropout_ratio=stack.dropout_ratio,
                    linear_activation=stack.linear_activation,
                    attn_impl=stack.attn_impl,
                    dtype=stack.dtype,
                    name="stu",
                )(carry, attn_mask, deterministic=deterministic)
                return carry, None

        scan = nn.scan(
            Body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
        )
        x, _ = scan(name="layers")(x, None)
        return x


class MedusaHead(nn.Module):
    """Stack of ResBlocks; identity when num_layers == 0."""

    hidden_size: int
    num_layers: int
    use_norm: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResBlock(self.hidden_size, use_norm=self.use_norm, name=f"res_{i}")(x)
        return x


class HSTU(nn.Module):
    """Full multi-head prior-aware HSTU model."""

    item_num: int
    item_embedding_size: int
    hstu_embedding_size: int
    max_seq_length: int
    pred_len: int
    n_layers: int
    n_heads: int
    hidden_act: str = "silu"
    hidden_dropout_prob: float = 0.0
    # the reference CONSTRUCTS relative-bias modules under this flag but its
    # active attention path never applies them (hstu.py:262-271, 377-403);
    # set apply_relative_attention_bias to actually add the bias to scores
    enable_relative_attention_bias: bool = False
    apply_relative_attention_bias: bool = False
    loss_type: str = "nce"           # 'nce' | 'prior'
    nce_thres: float = 0.99
    fix_temp: bool = False
    medusa_lambda: float = 0.99
    medusa_num_layers: int = 0
    num_segment_head: int = 1
    num_prior_head: int = 1
    head_interaction: str = "multiplicative"
    neg_sample_by_cat: bool = False
    pos_sample_mix_ratio: float = 0.0
    prior_loss_weight: Tuple[float, ...] = (1.0,)
    prior_switch: Optional[str] = None
    prior_switch_loss_weight: float = 0.0
    use_asym_switch_loss: bool = False
    gamma_pos: float = 4.0
    gamma_neg: float = 0.0
    switch_last_only: bool = False
    master_switch: bool = False
    detach_aux_in: bool = False
    eval_pred_len: int = 1
    prior_given_at_test: bool = False
    given_prior_len: int = 1
    use_prior_switch_test: bool = False
    int_to_category: Tuple[str, ...] = ()
    # hierarchical head options
    head_norm: bool = False
    cat_bottleneck: bool = False
    cat_bottleneck_dim: int = 0
    share_seg_weights: bool = False
    use_seg_embed: bool = False
    attn_impl: str = "auto"
    nce_impl: str = "banded"  # 'banded' | 'per_offset' (models/losses.py)
    # 'stacked' batches the additive prior loop's per-category NCE matmuls
    # into category-stacked einsums (losses.multi_horizon_nce_stacked);
    # 'loop' keeps one multi_horizon_nce call per category
    prior_loss_impl: str = "loop"
    scan_layers: bool = False  # lax.scan trunk (see ScannedSTUStack)
    # row-shard the item-embedding table over the named mesh axis (the
    # reference replicates the full 8M×D nn.Embedding per GPU, hstu.py:413 —
    # sharding it is what lets corpus-scale tables fit TPU HBM)
    shard_items_axis: Optional[str] = None
    dtype: Any = jnp.bfloat16

    input_type = InputType.SEQ

    # ------------------------------------------------------------------
    @property
    def medusa_num_heads(self) -> int:
        if self.head_interaction in ("multiplicative", "hierarchical"):
            return self.num_segment_head * self.num_prior_head
        if self.head_interaction == "additive":
            return self.num_segment_head + self.num_prior_head
        raise ValueError(f"Unknown head_interaction: {self.head_interaction}")

    @property
    def seg_len(self) -> int:
        if self.medusa_num_layers > 0:
            assert self.pred_len % self.num_segment_head == 0
            return self.pred_len // self.num_segment_head
        return self.pred_len

    def horizon_discount(self) -> jnp.ndarray:
        d = jnp.asarray(
            [self.medusa_lambda ** p for p in range(self.pred_len)], jnp.float32
        )
        return d / d.sum()

    # ------------------------------------------------------------------
    def setup(self):
        D = self.hstu_embedding_size
        if self.shard_items_axis:
            emb_init = nn.with_partitioning(
                trunc_normal_init, (self.shard_items_axis, None)
            )
            # pad rows so the table divides evenly across the axis; pad rows
            # are never looked up and compute_item_all slices them off
            import jax as _jax

            mult = _jax.device_count()
            rows = ((self.item_num + mult - 1) // mult) * mult
        else:
            emb_init = trunc_normal_init
            rows = self.item_num
        from mhrec_tpu.models.layers import ItemEmbed

        self.item_embedding = ItemEmbed(
            rows, self.item_embedding_size,
            embedding_init=emb_init, name="item_embedding",
        )
        if self.item_embedding_size != D:
            self.item_id_proj_tower = nn.Dense(
                D, use_bias=False, kernel_init=trunc_normal_init, name="item_proj"
            )
        else:
            self.item_id_proj_tower = None
        self.position_embedding = nn.Embed(
            self.max_seq_length + 1, D, embedding_init=trunc_normal_init,
            name="position_embedding",
        )
        if self.scan_layers:
            assert not self.enable_relative_attention_bias, (
                "scan_layers is incompatible with per-layer relative bias"
            )
            self.stu_stack = ScannedSTUStack(
                n_layers=self.n_layers,
                embedding_dim=D,
                linear_dim=D // self.n_heads,
                attention_dim=D // self.n_heads,
                num_heads=self.n_heads,
                dropout_ratio=self.hidden_dropout_prob,
                linear_activation=self.hidden_act or "silu",
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name="stu_stack",
            )
            self.stu_layers = []
        else:
            self.stu_layers = [
                STULayer(
                    embedding_dim=D,
                    linear_dim=D // self.n_heads,
                    attention_dim=D // self.n_heads,
                    num_heads=self.n_heads,
                    dropout_ratio=self.hidden_dropout_prob,
                    linear_activation=self.hidden_act or "silu",
                    attn_impl=self.attn_impl,
                    dtype=self.dtype,
                    name=f"stu_{i}",
                )
                for i in range(self.n_layers)
            ]
        if self.enable_relative_attention_bias:
            # the reference constructs a per-layer
            # RelativeBucketedTimeAndPositionBasedBias(max_seq_len=2L,
            # num_buckets=128) under this flag (hstu.py:392-403) — the same
            # module family/shape here so converted reference checkpoints
            # carry a matching parameter surface (ts_w[129], pos_w[4L-1])
            from mhrec_tpu.models.idnet.rel_bias import (
                RelativeBucketedTimeAndPositionBasedBias,
            )

            self.rel_bias = [
                RelativeBucketedTimeAndPositionBasedBias(
                    2 * self.max_seq_length, name=f"rel_bias_{i}"
                )
                for i in range(self.n_layers)
            ]
        if not self.fix_temp:
            self.logit_scale = self.param(
                "logit_scale", lambda key: jnp.asarray(np.log(1 / 0.05), jnp.float32)
            )
        else:
            self.logit_scale_fixed = jnp.asarray(np.log(1 / 0.05), jnp.float32)

        H = self.medusa_num_heads
        if self.head_interaction == "hierarchical" and self.medusa_num_layers > 0:
            if self.use_seg_embed:
                self.segment_emb = nn.Embed(
                    self.num_segment_head, D, embedding_init=trunc_normal_init,
                    name="segment_emb",
                )
            cat_heads = []
            for c in range(self.num_prior_head):
                blocks: List[nn.Module] = []
                if self.cat_bottleneck:
                    bdim = self.cat_bottleneck_dim or D // 2
                    blocks.append(_CatBottleneck(D, bdim, name=f"cat_bneck_{c}"))
                blocks.append(
                    MedusaHead(D, self.medusa_num_layers, use_norm=self.head_norm,
                               name=f"cat_head_{c}")
                )
                cat_heads.append(blocks)
            self.medusa_cat_head = cat_heads
            if self.share_seg_weights:
                shared = [
                    MedusaHead(D, self.medusa_num_layers, use_norm=self.head_norm,
                               name=f"seg_head_shared_{c}")
                    for c in range(self.num_prior_head)
                ]
                self.medusa_seg_head = [
                    [shared[c] for _ in range(self.num_segment_head)]
                    for c in range(self.num_prior_head)
                ]
            else:
                self.medusa_seg_head = [
                    [
                        MedusaHead(D, self.medusa_num_layers, use_norm=self.head_norm,
                                   name=f"seg_head_{c}_{s}")
                        for s in range(self.num_segment_head)
                    ]
                    for c in range(self.num_prior_head)
                ]
        else:
            self.medusa_head = [
                MedusaHead(D, self.medusa_num_layers, name=f"medusa_head_{h}")
                for h in range(H)
            ]

        if self.loss_type == "prior" and self.prior_switch is not None:
            in_dim = D if self.prior_switch == "in" else 2 * D
            self.aux_cat_head = [
                nn.Dense(1, kernel_init=trunc_normal_init, bias_init=trunc_normal_init,
                         name=f"aux_cat_head_{c}")
                for c in range(self.num_prior_head)
            ]

    # ------------------------------------------------------------------
    def _logit_scale(self):
        return self.logit_scale_fixed if self.fix_temp else self.logit_scale

    def _embed_items(self, items):
        """Under ``sparse_item_adam`` the trainer substitutes the gathered
        per-batch sub-table ([U, D] unique rows) for this module's embedding
        param and the batch carries LOCAL indices — the lookup code is
        identical either way (trainer/trainer.py train_step)."""
        emb = self.item_embedding(items)
        if self.item_id_proj_tower is not None:
            emb = self.item_id_proj_tower(emb)
        return emb

    def encode(self, items_ctx, deterministic: bool = True):
        """Trunk forward over the context window.

        items_ctx: [B, L] int. Returns output_embs [B, L, D] (model dtype).
        """
        B, L = items_ctx.shape
        emb = self._embed_items(items_ctx)
        pos = self.position_embedding(jnp.arange(L)[None, :])
        x = (emb + pos).astype(self.dtype)
        non_pad = items_ctx != 0
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))
        # reference get_attention_mask (hstu.py:1023-1030): tril of the
        # broadcast non-pad KEY mask
        mask = (non_pad[:, None, None, :] & causal[None, None, :, :])
        if self.scan_layers:
            return self.stu_stack(x, mask, deterministic=deterministic)
        for i, layer in enumerate(self.stu_layers):
            bias = None
            if self.enable_relative_attention_bias:
                # timestamps=None → zero time spans (the reference's active
                # path never applies the bias either; params exist for
                # checkpoint-surface parity, and XLA dead-code-eliminates
                # the unapplied computation)
                b = self.rel_bias[i](None)[:, :L, :L]
                if self.apply_relative_attention_bias:
                    bias = b
            x = layer(x, mask, deterministic=deterministic, attn_bias=bias)
        return x

    def compute_heads(self, output_embs):
        """Apply medusa heads. [..., D] → [batch-dims, H, ..., D]."""
        if self.head_interaction == "hierarchical" and self.medusa_num_layers > 0:
            outs = []
            cat_embs = []
            for c in range(self.num_prior_head):
                h = output_embs
                for block in self.medusa_cat_head[c]:
                    h = block(h)
                cat_embs.append(h)
            for s in range(self.num_segment_head):
                seg_bias = (
                    self.segment_emb(jnp.asarray(s)) if self.use_seg_embed else None
                )
                for c in range(self.num_prior_head):
                    seg_in = cat_embs[c]
                    if seg_bias is not None:
                        seg_in = seg_in + seg_bias
                    outs.append(self.medusa_seg_head[c][s](seg_in))
            return jnp.stack(outs, axis=1)
        return jnp.stack([h(output_embs) for h in self.medusa_head], axis=1)

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        """Training forward → dict with 'loss' and logging scalars.

        batch: items [B, L+P], neg_items [B, NC, K], masked_index [B, L+P],
        tag_categories [B, L+P, C] (prior loss only).
        """
        items = batch["items"]
        neg_items = batch["neg_items"]
        user_mask = batch["masked_index"].astype(bool)
        L = self.max_seq_length

        pos_items_embs = self._embed_items(items)  # [B, L+P, D]
        ctx_items = jnp.where(user_mask[:, :L], items[:, :L], 0)
        output_embs = self.encode(ctx_items, deterministic=deterministic)

        def _neg_norm(col):
            neg_emb = self._embed_items(neg_items[:, col]).astype(jnp.float32)
            neg_emb = cosine_normalize(neg_emb)
            return neg_emb.reshape(-1, neg_emb.shape[-1])

        return compute_multihead_losses(
            self, output_embs, pos_items_embs, user_mask,
            batch.get("tag_categories"), _neg_norm,
        )

    # ------------------------------------------------------------------
    def predict_embeddings(self, item_seq, target_tags=None):
        """Eval-time user/head embeddings (reference hstu.py:874-971).

        Returns dict with:
          head_embs  [B, H, D] L2-normalized fp32
          user_emb   [B, D]    normalized last-token trunk output
          switch_pred [B, num_prior_head] bool (if prior_switch configured)
          switch_correct — per-head correct-count scalars for logging
        """
        output_embs = self.encode(item_seq, deterministic=True)
        return predict_switch_and_heads(self, output_embs[:, -1], target_tags)

    def score_items(
        self,
        head_embs: jnp.ndarray,            # [B, H, D] normalized
        item_feats: jnp.ndarray,           # [I, D] normalized fp32
        item_tags: Optional[jnp.ndarray],  # [I, C] bool
        target_tags: Optional[jnp.ndarray],  # [B, P, C]
        switch_pred: Optional[jnp.ndarray],  # [B, switch_range] bool
    ) -> jnp.ndarray:
        """Cosine scores + prior masks for a (chunk of the) item corpus.

        Mask semantics per reference predict (hstu.py:982-1015); the same
        function serves full-corpus and streamed-chunk scoring.
        """
        scores = jnp.einsum("bhd,id->bhi", head_embs, item_feats)
        if self.loss_type != "prior":
            return scores
        S, C = self.num_segment_head, self.num_prior_head

        if self.prior_given_at_test and target_tags is not None:
            given = target_tags[:, : self.given_prior_len].astype(bool).any(axis=1)  # [B, C]
            if self.head_interaction == "additive":
                scores = scores.at[:, S:].set(
                    jnp.where(given[:, :, None], scores[:, S:], _NEG_INF)
                )
            else:
                rep = jnp.tile(given, (1, S))[:, :, None]   # [B, S*C, 1]
                scores = jnp.where(rep, scores, _NEG_INF)

        if item_tags is not None:
            tags = item_tags.astype(bool)                    # [I, C]
            if self.head_interaction == "additive":
                m = tags.T[None, :, :]                       # [1, C, I]
                scores = scores.at[:, S:].set(
                    jnp.where(m, scores[:, S:], _NEG_INF)
                )
            else:
                m = jnp.tile(tags.T, (S, 1))[None, :, :]     # [1, S*C, I]
                scores = jnp.where(m, scores, _NEG_INF)

        if self.prior_switch is not None and self.use_prior_switch_test and switch_pred is not None:
            if self.master_switch:
                on = jnp.concatenate(
                    [~switch_pred[:, :1], jnp.tile(switch_pred[:, :1], (1, C - 1))],
                    axis=1,
                )  # [B, C]
            else:
                on = switch_pred                              # [B, C]
            if self.head_interaction == "additive":
                scores = scores.at[:, S:].set(
                    jnp.where(on[:, :, None], scores[:, S:], _NEG_INF)
                )
            else:
                rep = jnp.tile(on, (1, S))[:, :, None]
                scores = jnp.where(rep, scores, _NEG_INF)
        return scores

    def compute_item_all(self):
        """Normalized full item-embedding matrix (reference hstu.py:1018-1021)."""
        w = self.item_embedding.embedding[: self.item_num]
        if self.item_id_proj_tower is not None:
            w = self.item_id_proj_tower(w)
        return cosine_normalize(w.astype(jnp.float32))


class _CatBottleneck(nn.Module):
    """LayerNorm → down-proj → SiLU → up-proj (hierarchical cat head option,
    reference hstu.py:453-464)."""

    dim: int
    bottleneck_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        h = nn.Dense(self.bottleneck_dim, kernel_init=trunc_normal_init,
                     bias_init=trunc_normal_init)(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, kernel_init=trunc_normal_init,
                        bias_init=trunc_normal_init)(h)


# ----------------------------------------------------------------------
def hstu_from_config(config, dataload) -> HSTU:
    """Build an HSTU module from a Config + InteractionData (mirrors the
    reference constructor wiring, hstu.py:343-572)."""
    loss = config["loss"]
    num_prior = config["num_prior_head"] or 1
    if loss == "prior" and config["weighted_prior_loss"]:
        all_counts = sum(dataload.category_counts.values())
        weights = [0.0] * num_prior
        for cat, cnt in dataload.category_counts.items():
            weights[dataload.category_to_int[cat]] = cnt / all_counts
    else:
        weights = [1.0 / num_prior] * num_prior

    neg_by_cat = bool(config["neg_sample_by_cat"]) and loss == "prior"
    prior_switch = config["prior_switch"]
    i2c = config["int_to_category"] or {}
    int_to_category = tuple(i2c.get(i, str(i)) for i in range(num_prior))

    eval_pred_len = config["eval_pred_len"]
    prior_given = bool(config.get("prior_given_at_test", False))
    return HSTU(
        item_num=dataload.item_num,
        item_embedding_size=config["item_embedding_size"],
        hstu_embedding_size=config["hstu_embedding_size"],
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        pred_len=config["pred_len"],
        n_layers=config["n_layers"],
        n_heads=config["n_heads"],
        hidden_act=config["hidden_act"] or "silu",
        hidden_dropout_prob=config["hidden_dropout_prob"] or 0.0,
        enable_relative_attention_bias=bool(config["enable_relative_attention_bias"]),
        apply_relative_attention_bias=bool(config.get("apply_relative_attention_bias", False)),
        loss_type=loss,
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        medusa_lambda=config["medusa_lambda"],
        medusa_num_layers=config["medusa_num_layers"] or 0,
        num_segment_head=config["num_segment_head"] or 1,
        num_prior_head=num_prior,
        head_interaction=config["head_interaction"],
        neg_sample_by_cat=neg_by_cat,
        pos_sample_mix_ratio=config["pos_sample_mix_ratio"] or 0.0,
        prior_loss_weight=tuple(weights),
        prior_switch=prior_switch,
        prior_switch_loss_weight=config["prior_switch_loss_weight"] or 0.0,
        use_asym_switch_loss=config.get("asym_switch_loss", False),
        gamma_pos=config.get("gamma_pos", 4.0),
        gamma_neg=config.get("gamma_neg", 0.0),
        switch_last_only=config.get("switch_last_only", False),
        master_switch=config.get("master_switch", False),
        detach_aux_in=config.get("detach_aux_in", False),
        eval_pred_len=eval_pred_len,
        prior_given_at_test=prior_given,
        given_prior_len=config.get("given_prior_len", eval_pred_len) if prior_given else eval_pred_len,
        use_prior_switch_test=config.get("use_prior_switch_test", False),
        int_to_category=int_to_category,
        head_norm=config.get("head_norm", False),
        cat_bottleneck=config.get("cat_bottleneck", False),
        cat_bottleneck_dim=config.get("cat_bottleneck_dim", 0) or 0,
        share_seg_weights=config.get("share_seg_weights", False),
        use_seg_embed=config.get("segment_embed", False),
        attn_impl=config.get("attn_impl", "auto"),
        nce_impl=str(config.get("nce_impl") or "banded"),
        prior_loss_impl=str(config.get("prior_loss_impl") or "loop"),
        scan_layers=bool(config.get("scan_layers", False)),
        shard_items_axis="data" if config.get("shard_item_embedding", False) else None,
    )
