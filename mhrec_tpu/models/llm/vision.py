"""Flax vision tower for image item encoding (Qwen2-VL layout).

TPU-native counterpart of the reference's vendored
``modeling_qwen2_vl.py`` vision stack (Qwen2VisionTransformerPretrainedModel,
reference modeling_qwen2_vl.py:1089 merger / :1566 ``self.visual``): a ViT
over 14×14×(2 temporal) patches with 2D rotary position embeddings, followed
by a 2×2 spatial PatchMerger projecting into the text model's hidden size.

TPU-first design choices:

* **Static resolution.** The reference supports dynamic image grids via
  varlen flash-attention; the paper's runs pin ``img_height/img_width`` to
  224×224 (reproduce/HLLM-Pixel8M-prior.slurm). We make the grid a
  compile-time constant, so every image yields the same patch count and the
  whole tower runs as one dense ``[N_images, P, D]`` batch on the MXU — no
  varlen bookkeeping, one XLA program.
* Patch extraction (host side, :mod:`mhrec_tpu.data.vision`) flattens each
  patch exactly like the HF Qwen2-VL image processor (channel-major,
  temporal-duplicated), so pretrained ``visual.patch_embed`` weights apply
  unchanged, and patches arrive pre-ordered in 2×2 merge groups so the
  merger is a reshape.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    # arch: "qwen2vl" (2D-RoPE ViT + 2x2 PatchMerger) or "clip" (CLIP/SigLIP
    # ViT + multimodal projector — the LLaVA-family item towers the reference
    # vendors in modeling_llava_next.py / modeling_llava_onevision.py)
    arch: str = "qwen2vl"
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: int = 4
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 1536          # output dim = text tower hidden size
    hidden_act: str = "quick_gelu"
    intermediate_size: int = 0       # clip: explicit MLP width
    use_cls_token: bool = True       # clip: learned class token + abs pos emb
    layer_norm_eps: float = 1e-6
    patch_bias: bool = False         # siglip: conv patch embedding has a bias
    use_pre_ln: bool = True          # siglip: no pre-LN before the blocks
    # fixed-grid AnyRes (clip arch only): (gh, gw) grid crops + base crop,
    # packed with per-row image_newline tokens — reference
    # modeling_llava_next.py pack_image_features at ONE pinned pinpoint so
    # the image-token count stays a compile-time constant
    anyres_grid: Optional[tuple] = None
    # dynamic per-image AnyRes pinpoints (clip arch): host-side maps, see
    # data/vision.py AnyResPreprocessor — only affects which params exist
    dynamic_anyres: bool = False
    # checkpoint-native position-table length (clip: (image_size/ps)² + cls);
    # 0 → sized from the run grid. Declared at this size so pretrained
    # tables load even when the run grid is smaller (sliced at apply time).
    n_positions: int = 0

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return self.intermediate_size or self.embed_dim * self.mlp_ratio

    @classmethod
    def from_pretrained_dir(cls, path: str) -> "VisionConfig":
        with open(os.path.join(path, "config.json")) as fh:
            raw = json.load(fh)
        v = raw.get("vision_config")
        if v is None:
            raise ValueError(f"{path}/config.json has no vision_config")
        text_hidden = raw.get("hidden_size") or (
            raw.get("text_config", {}).get("hidden_size", 1536)
        )
        if v.get("model_type") in ("clip_vision_model", "siglip_vision_model") \
                or raw.get("model_type", "").startswith("llava"):
            return cls(
                arch="clip",
                embed_dim=v.get("hidden_size", 1024),
                depth=v.get("num_hidden_layers", 24),
                num_heads=v.get("num_attention_heads", 16),
                intermediate_size=v.get("intermediate_size", 4096),
                in_channels=v.get("num_channels", 3),
                patch_size=v.get("patch_size", 14),
                temporal_patch_size=1,
                spatial_merge_size=1,
                hidden_size=text_hidden,
                hidden_act=v.get("hidden_act", "quick_gelu"),
                use_cls_token=v.get("model_type") != "siglip_vision_model",
                layer_norm_eps=v.get("layer_norm_eps", 1e-5),
                patch_bias=v.get("model_type") == "siglip_vision_model",
                use_pre_ln=v.get("model_type") != "siglip_vision_model",
                n_positions=(v.get("image_size", 224) // v.get("patch_size", 14)) ** 2
                + (0 if v.get("model_type") == "siglip_vision_model" else 1),
            )
        return cls(
            embed_dim=v.get("embed_dim", 1280),
            depth=v.get("depth", 32),
            num_heads=v.get("num_heads", 16),
            mlp_ratio=v.get("mlp_ratio", 4),
            in_channels=v.get("in_channels", 3),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            hidden_size=v.get("hidden_size", text_hidden),
            hidden_act=v.get("hidden_act", "quick_gelu"),
        )

    @classmethod
    def tiny(cls, hidden_size: int = 64) -> "VisionConfig":
        return cls(embed_dim=32, depth=2, num_heads=4, mlp_ratio=2,
                   patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
                   hidden_size=hidden_size)


def vision_rotary_tables(grid_h: int, grid_w: int, merge: int, head_dim: int,
                         theta: float = 10000.0):
    """cos/sin tables [P, head_dim] for the 2D vision RoPE.

    Patch order matches the host patchifier: 2×2 merge blocks row-major,
    then rows within each block (reference Qwen2VL ``rot_pos_emb``).
    """
    # patch order is (h_block, w_block, merge_h, merge_w) — see the host
    # patchifier (data/vision.py) and reference rot_pos_emb
    hb = np.arange(grid_h).reshape(grid_h // merge, 1, merge, 1)
    wb = np.arange(grid_w).reshape(1, grid_w // merge, 1, merge)
    shape = (grid_h // merge, grid_w // merge, merge, merge)
    hpos = np.broadcast_to(hb, shape).ravel()
    wpos = np.broadcast_to(wb, shape).ravel()
    dim = head_dim // 2  # rotary dim per spatial axis pair
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freq_h = hpos[:, None].astype(np.float32) * inv_freq[None, :]
    freq_w = wpos[:, None].astype(np.float32) * inv_freq[None, :]
    freqs = np.concatenate([freq_h, freq_w], axis=-1)       # [P, head_dim//2]
    emb = np.concatenate([freqs, freqs], axis=-1)           # [P, head_dim]
    return np.cos(emb), np.sin(emb)


def _rotate_half(x):
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


def _apply_vision_rope(x, cos, sin):
    """x [N, P, H, Dh]; cos/sin [P, Dh] (static grid) or [N, P, Dh]
    (dynamic per-image grids)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * c + _rotate_half(xf) * s).astype(x.dtype)


def vision_rotary_from_hw(patch_hw: jnp.ndarray, head_dim: int,
                          theta: float = 10000.0):
    """Per-image RoPE tables from host-computed patch positions.

    patch_hw [N, P, 2] int32 (h, w per patch — the dynamic smart-resize
    path, data/vision.py DynamicImagePreprocessor) → cos/sin [N, P, Dh].
    Same math as :func:`vision_rotary_tables` with positions supplied
    instead of derived from a static grid.
    """
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freq_h = patch_hw[..., 0:1].astype(jnp.float32) * inv_freq[None, None, :]
    freq_w = patch_hw[..., 1:2].astype(jnp.float32) * inv_freq[None, None, :]
    freqs = jnp.concatenate([freq_h, freq_w], axis=-1)   # [N, P, Dh//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [N, P, Dh]
    return jnp.cos(emb), jnp.sin(emb)


class VisionBlock(nn.Module):
    config: VisionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cos, sin, valid=None, seg=None):
        c = self.config
        D, H = c.embed_dim, c.num_heads
        dh = c.head_dim
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        qkv = nn.Dense(3 * D, use_bias=True, dtype=self.dtype, name="qkv")(h)
        N, P, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(N, P, 3, H, dh), 3, axis=2)
        q = _apply_vision_rope(q.squeeze(2), cos, sin)
        k = _apply_vision_rope(k.squeeze(2), cos, sin)
        v = v.squeeze(2)
        scores = jnp.einsum("nphd,nqhd->nhpq", q, k) / np.sqrt(dh)
        if valid is not None:  # dynamic grids: mask padded patch keys
            scores = jnp.where(
                valid[:, None, None, :], scores, jnp.finfo(scores.dtype).min
            )
        if seg is not None:
            # video: attention is block-diagonal per temporal patch group
            # (reference Qwen2VL cu_seqlens = repeat_interleave(h·w, t))
            same = seg[:, None] == seg[None, :]
            scores = jnp.where(
                same[None, None], scores, jnp.finfo(scores.dtype).min
            )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("nhpq,nqhd->nphd", probs, v).reshape(N, P, D)
        x = x + nn.Dense(D, use_bias=True, dtype=self.dtype, name="proj")(ctx)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(D * c.mlp_ratio, use_bias=True, dtype=self.dtype, name="fc1")(h)
        if c.hidden_act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h)
        return x + nn.Dense(D, use_bias=True, dtype=self.dtype, name="fc2")(h)


class VisionTower(nn.Module):
    """Patches [N, P, patch_dim] → image tokens [N, P/merge², hidden_size]."""

    config: VisionConfig
    grid_h: int                      # static grid (img_height // patch_size)
    grid_w: int
    dtype: Any = jnp.bfloat16
    gradient_checkpointing: bool = False
    # video: temporal patch groups (= T // temporal_patch_size). The rotary
    # (h, w) tables tile per group and attention is block-diagonal per
    # group (reference Qwen2VL rot_pos_emb .repeat(t, 1) + cu_seqlens =
    # repeat_interleave(h·w, t)).
    grid_t: int = 1

    @nn.compact
    def __call__(self, patches: jnp.ndarray, patch_valid=None,
                 patch_hw=None) -> jnp.ndarray:
        """Static grid: rope from (grid_h, grid_w). Dynamic smart-resize
        mode (patch_valid/patch_hw given): per-image rope positions +
        masked attention over the padded patch capacity; padded merge
        blocks yield junk tokens that the backbone's gather-splice never
        reads (data/textset.py dynamic_image_arrays)."""
        c = self.config
        m = c.spatial_merge_size
        x = nn.Dense(c.embed_dim, use_bias=False, dtype=self.dtype,
                     name="patch_embed")(patches.astype(self.dtype))
        if patch_hw is not None:
            cos, sin = vision_rotary_from_hw(patch_hw, c.head_dim)
        else:
            cos, sin = vision_rotary_tables(self.grid_h, self.grid_w, m, c.head_dim)
            if self.grid_t > 1:
                cos = np.tile(cos, (self.grid_t, 1))
                sin = np.tile(sin, (self.grid_t, 1))
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        seg = None
        if self.grid_t > 1:
            seg = jnp.repeat(jnp.arange(self.grid_t),
                             self.grid_h * self.grid_w)
        block_cls = VisionBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(VisionBlock)
        for i in range(c.depth):
            x = block_cls(c, self.dtype, name=f"blocks_{i}")(
                x, cos, sin, patch_valid, seg
            )
        # PatchMerger (reference modeling_qwen2_vl.py:1089): LN then merge
        # each 2×2 group (consecutive in patch order) into one token.
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="ln_q")(x)
        N, P, D = x.shape
        x = x.reshape(N, P // (m * m), m * m * D)
        h = nn.Dense(m * m * D, use_bias=True, dtype=self.dtype, name="merger_fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(c.hidden_size, use_bias=True, dtype=self.dtype,
                        name="merger_fc2")(h)


class ClipVisionBlock(nn.Module):
    config: VisionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = self.config
        D, H, dh = c.embed_dim, c.num_heads, c.head_dim
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x)
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(h)
        N, P, _ = q.shape
        q = q.reshape(N, P, H, dh)
        k = k.reshape(N, P, H, dh)
        v = v.reshape(N, P, H, dh)
        scores = jnp.einsum("nphd,nqhd->nhpq", q, k) / np.sqrt(dh)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        ctx = jnp.einsum("nhpq,nqhd->nphd", probs, v).reshape(N, P, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="out_proj")(ctx)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x)
        h = nn.Dense(c.mlp_dim, dtype=self.dtype, name="fc1")(h)
        if c.hidden_act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h)
        return x + nn.Dense(D, dtype=self.dtype, name="fc2")(h)


class ClipVisionTower(nn.Module):
    """CLIP/SigLIP ViT + LLaVA multimodal projector (reference
    modeling_llava_next.py vision_tower + multi_modal_projector).

    Patches [N, P, patch_dim] → image tokens [N, P, hidden_size]. Follows the
    LLaVA default feature selection: hidden states from the penultimate
    layer (``vision_feature_layer=-2``), class token dropped.
    """

    config: VisionConfig
    grid_h: int
    grid_w: int
    dtype: Any = jnp.bfloat16
    gradient_checkpointing: bool = False
    feature_layer_offset: int = 1    # -2 ⇒ skip the last block

    @nn.compact
    def __call__(self, patches: jnp.ndarray, tok_src=None) -> jnp.ndarray:
        """``tok_src`` (dynamic AnyRes, data/vision.py AnyResPreprocessor):
        [N, T_cap] gather map over the flat [n_crops·P (+1 newline)] crop
        features — per-image pinpoints/unpad resolved host-side; padded
        crops are computed but never gathered."""
        c = self.config
        n_crops = 1
        if patches.ndim == 4:        # [N, n_crops, P, dim] — AnyRes crops
            n_items, n_crops = patches.shape[:2]
            if tok_src is None:
                assert c.anyres_grid, "rank-4 patches require anyres_grid"
                assert n_crops == 1 + c.anyres_grid[0] * c.anyres_grid[1]
            patches = patches.reshape((-1,) + patches.shape[2:])
        N, P, _ = patches.shape
        x = nn.Dense(c.embed_dim, use_bias=c.patch_bias, dtype=self.dtype,
                     name="patch_embed")(patches.astype(self.dtype))
        n_pos = P + (1 if c.use_cls_token else 0)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (max(n_pos, c.n_positions), c.embed_dim))
        # a pretrained table for a larger grid is sliced (exact when the run
        # resolution matches the checkpoint's, e.g. 224 for CLIP-L/14)
        pos = pos[:n_pos]
        if c.use_cls_token:
            cls = self.param("class_embedding", nn.initializers.normal(0.02),
                             (c.embed_dim,))
            cls_tok = jnp.broadcast_to(
                cls.astype(self.dtype)[None, None, :], (N, 1, c.embed_dim)
            )
            x = jnp.concatenate([cls_tok, x], axis=1)
        x = x + pos.astype(self.dtype)[None]
        if c.use_pre_ln:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                             name="pre_layernorm")(x)
        block_cls = ClipVisionBlock
        if self.gradient_checkpointing:
            block_cls = nn.remat(ClipVisionBlock)
        n_blocks = c.depth - self.feature_layer_offset
        for i in range(n_blocks):
            x = block_cls(c, self.dtype, name=f"blocks_{i}")(x)
        if c.use_cls_token:
            x = x[:, 1:]             # drop CLS (LLaVA "default" strategy)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="proj_fc1")(x)
        h = nn.gelu(h, approximate=False)   # HF LLaVA projector uses exact gelu
        feats = nn.Dense(c.hidden_size, dtype=self.dtype, name="proj_fc2")(h)
        if tok_src is not None:
            # dynamic AnyRes: flatten crop features, append the newline row
            # (index n_crops·P), gather the host-computed packing — base
            # crop + unpadded grid + per-row newlines, exactly the reference
            # pack_image_features order
            N_, P_ = tok_src.shape[0], feats.shape[1]
            D = c.hidden_size
            embed_std = 1.0 / np.sqrt(D)
            newline = self.param(
                "image_newline", nn.initializers.normal(embed_std), (D,)
            ).astype(feats.dtype)
            flat = feats.reshape(N_, n_crops * P_, D)
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(newline[None, None, :], (N_, 1, D))],
                axis=1,
            )
            take = jnp.take_along_axis(
                flat, jnp.clip(tok_src, 0, n_crops * P_)[..., None], axis=1
            )
            return jnp.where((tok_src >= 0)[..., None], take, 0.0)
        if n_crops == 1:
            return feats
        # pack_image_features (reference modeling_llava_next.py:407-…): base
        # crop first, grid crops stitched into the global (gh·grid_h,
        # gw·grid_w) feature map with an image_newline token per row.
        # unpad_image is an exact no-op here: the host resizes every image
        # to the pinned pinpoint, so there are no pad rows (documented
        # deviation: aspect is distorted instead of padded).
        gh, gw = c.anyres_grid
        D = c.hidden_size
        embed_std = 1.0 / np.sqrt(D)
        newline = self.param(
            "image_newline", nn.initializers.normal(embed_std), (D,)
        ).astype(feats.dtype)
        feats = feats.reshape(n_items, n_crops, P, D)
        base = feats[:, 0]                                   # [N, P, D]
        grid = feats[:, 1:].reshape(n_items, gh, gw, self.grid_h, self.grid_w, D)
        grid = grid.transpose(0, 1, 3, 2, 4, 5).reshape(
            n_items, gh * self.grid_h, gw * self.grid_w, D
        )
        nl = jnp.broadcast_to(
            newline[None, None, None, :], (n_items, gh * self.grid_h, 1, D)
        )
        grid = jnp.concatenate([grid, nl], axis=2).reshape(n_items, -1, D)
        return jnp.concatenate([base, grid], axis=1)


def load_clip_vision_params(sd: Dict[str, np.ndarray], config: VisionConfig,
                            dtype=np.float32) -> Dict:
    """Map HF LLaVA ``vision_tower.vision_model.*`` + projector weights onto
    :class:`ClipVisionTower` params."""
    pre = "vision_tower.vision_model"

    def t(name):
        return np.asarray(sd[name], dtype=dtype)

    params: Dict = {
        "patch_embed": {
            "kernel": t(f"{pre}.embeddings.patch_embedding.weight")
            .reshape(config.embed_dim, -1).T
        },
        "position_embedding": t(f"{pre}.embeddings.position_embedding.weight"),
        "proj_fc1": {"kernel": t("multi_modal_projector.linear_1.weight").T,
                     "bias": t("multi_modal_projector.linear_1.bias")},
        "proj_fc2": {"kernel": t("multi_modal_projector.linear_2.weight").T,
                     "bias": t("multi_modal_projector.linear_2.bias")},
    }
    if config.patch_bias:
        params["patch_embed"]["bias"] = t(
            f"{pre}.embeddings.patch_embedding.bias"
        )
    if config.use_pre_ln:
        params["pre_layernorm"] = {
            # HF spells it "pre_layrnorm"
            "scale": t(f"{pre}.pre_layrnorm.weight"),
            "bias": t(f"{pre}.pre_layrnorm.bias"),
        }
    if config.use_cls_token:
        params["class_embedding"] = t(f"{pre}.embeddings.class_embedding")
    if config.anyres_grid or config.dynamic_anyres:
        if "image_newline" in sd:
            params["image_newline"] = t("image_newline")
        else:  # absent in non-anyres checkpoints: HF-style fresh init
            rng = np.random.default_rng(0)
            params["image_newline"] = (
                rng.standard_normal(config.hidden_size)
                / np.sqrt(config.hidden_size)
            ).astype(dtype)
    for i in range(config.depth - 1):   # feature layer -2: last block unused
        lp = f"{pre}.encoder.layers.{i}"
        params[f"blocks_{i}"] = {
            "layer_norm1": {"scale": t(f"{lp}.layer_norm1.weight"),
                            "bias": t(f"{lp}.layer_norm1.bias")},
            "layer_norm2": {"scale": t(f"{lp}.layer_norm2.weight"),
                            "bias": t(f"{lp}.layer_norm2.bias")},
            "q_proj": {"kernel": t(f"{lp}.self_attn.q_proj.weight").T,
                       "bias": t(f"{lp}.self_attn.q_proj.bias")},
            "k_proj": {"kernel": t(f"{lp}.self_attn.k_proj.weight").T,
                       "bias": t(f"{lp}.self_attn.k_proj.bias")},
            "v_proj": {"kernel": t(f"{lp}.self_attn.v_proj.weight").T,
                       "bias": t(f"{lp}.self_attn.v_proj.bias")},
            "out_proj": {"kernel": t(f"{lp}.self_attn.out_proj.weight").T,
                         "bias": t(f"{lp}.self_attn.out_proj.bias")},
            "fc1": {"kernel": t(f"{lp}.mlp.fc1.weight").T,
                    "bias": t(f"{lp}.mlp.fc1.bias")},
            "fc2": {"kernel": t(f"{lp}.mlp.fc2.weight").T,
                    "bias": t(f"{lp}.mlp.fc2.bias")},
        }
    return params


def load_any_vision_params(sd: Dict[str, np.ndarray], config: VisionConfig,
                           dtype=np.float32) -> Dict:
    """Dispatch on the tower architecture."""
    if config.arch == "clip":
        return load_clip_vision_params(sd, config, dtype)
    return load_vision_params(sd, config, dtype)


def has_vision_weights(sd: Dict[str, np.ndarray]) -> bool:
    return any(
        k.startswith("visual.") or k.startswith("vision_tower.") for k in sd
    )


def load_vision_params(sd: Dict[str, np.ndarray], config: VisionConfig,
                       dtype=np.float32) -> Dict:
    """Map HF ``visual.*`` weights onto :class:`VisionTower` params."""
    def t(name):
        return np.asarray(sd[f"visual.{name}"], dtype=dtype)

    params: Dict = {
        "patch_embed": {
            # Conv3d [E, C, tps, ps, ps] with stride == kernel ≡ a linear
            # layer over the flattened patch vector
            "kernel": t("patch_embed.proj.weight").reshape(config.embed_dim, -1).T
        },
        "ln_q": {"scale": t("merger.ln_q.weight"), "bias": t("merger.ln_q.bias")},
        "merger_fc1": {"kernel": t("merger.mlp.0.weight").T,
                       "bias": t("merger.mlp.0.bias")},
        "merger_fc2": {"kernel": t("merger.mlp.2.weight").T,
                       "bias": t("merger.mlp.2.bias")},
    }
    for i in range(config.depth):
        pre = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": {"scale": t(f"{pre}.norm1.weight"), "bias": t(f"{pre}.norm1.bias")},
            "norm2": {"scale": t(f"{pre}.norm2.weight"), "bias": t(f"{pre}.norm2.bias")},
            "qkv": {"kernel": t(f"{pre}.attn.qkv.weight").T,
                    "bias": t(f"{pre}.attn.qkv.bias")},
            "proj": {"kernel": t(f"{pre}.attn.proj.weight").T,
                     "bias": t(f"{pre}.attn.proj.bias")},
            "fc1": {"kernel": t(f"{pre}.mlp.fc1.weight").T,
                    "bias": t(f"{pre}.mlp.fc1.bias")},
            "fc2": {"kernel": t(f"{pre}.mlp.fc2.weight").T,
                    "bias": t(f"{pre}.mlp.fc2.bias")},
        }
    return params
