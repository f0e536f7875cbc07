"""HLLM — two-tower LLM recommender.

Behavior parity with reference ``code/REC/model/HLLM/hllm.py``:

* **item LLM** encodes each item's text into one embedding: the hidden state
  at the trailing learnable ``item_emb_tokens`` slot (``item_emb_token_n=1``,
  hllm.py:399-464) or masked mean pooling (``item_emb_token_n=0``);
* **user LLM** consumes the sequence of item embeddings via
  ``inputs_embeds`` with the user attention mask (hllm.py:501-502);
* identical multi-head medusa/prior/NCE machinery as HSTU — shared via
  :mod:`mhrec_tpu.models.multihead` (the reference duplicates the block);
  ``logit_scale`` init is ln(1/0.07) here (hllm.py:119-124);
* ``freeze_item_llm`` swaps in a precomputed ``all_item_embeds`` table
  (hllm.py:485-488); ``dummy_llm`` uses the embedding+linear debug backend;
* ``compute_item_chunk`` is the corpus-embedding pass (hllm.py:893-908),
  driven in chunks by the trainer; predict runs the user tower over table
  lookups (hllm.py:765-883).

Towers are Llama-family flax backbones (padded dense batches, see
``models/llm/llama.py``) with optional remat for gradient checkpointing.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mhrec_tpu.models.idnet.hstu import MedusaHead, _CatBottleneck
from mhrec_tpu.models.layers import cosine_normalize, trunc_normal_init
from mhrec_tpu.models.llm.config import LLMConfig
from mhrec_tpu.models.llm.dummy import DummyLLM
from mhrec_tpu.models.llm.llama import LlamaBackbone
from mhrec_tpu.models.llm.vision import VisionConfig, VisionTower
from mhrec_tpu.models.multihead import (
    compute_multihead_losses,
    predict_switch_and_heads,
)
from mhrec_tpu.utils.enums import InputType


def _batch_image_extra(batch: Dict[str, jnp.ndarray], prefix: str):
    """Collect the dynamic-resolution image arrays for one item group
    (emitted by data/textset.py ``_emit_image_keys``), or None."""
    src = batch.get(f"{prefix}_img_src")
    if src is None:
        return None
    out = {"img_src": src}
    for k in ("patch_valid", "patch_hw", "img_pos", "tok_src"):
        v = batch.get(f"{prefix}_{k}")
        if v is not None:
            out[k] = v
    return out


class HLLM(nn.Module):
    item_config: LLMConfig
    user_config: LLMConfig
    max_seq_length: int
    pred_len: int
    dummy_llm: bool = False
    freeze_item_llm: bool = False
    packed_item_tower: bool = False
    item_num: int = 0              # needed for the frozen-table variable
    item_emb_token_n: int = 1
    gradient_checkpointing: bool = False
    remat_policy: str = "full"  # 'full' | 'dots' (see LlamaBackbone)
    nce_impl: str = "banded"    # 'banded' | 'per_offset' (models/losses.py)
    prior_loss_impl: str = "loop"  # 'stacked' | 'loop' (multihead.py)
    # image branch (reference hllm.py:399-464 qwen2-vl path): a vision tower
    # encodes each item's image into tokens spliced over the fixed
    # image-pad span of the item text
    use_image: bool = False
    vision_config: Optional[VisionConfig] = None
    img_grid: Tuple[int, int] = (16, 16)   # (grid_h, grid_w) in 14px patches
    image_span_start: int = 1              # tokens before the image pads
    # video branch (static grid): grid_t > 1 means the spliced span carries
    # grid_t temporal groups of gh·gw patches (data/vision.py
    # VideoPreprocessor order); the tower attends block-diagonally per
    # temporal group and M-RoPE advances the t component per group
    vid_grid_t: int = 1
    # loss / heads (same contract as HSTU)
    loss_type: str = "nce"
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
    head_norm: bool = False
    cat_bottleneck: bool = False
    cat_bottleneck_dim: int = 0
    share_seg_weights: bool = False
    use_seg_embed: bool = False
    dtype: Any = jnp.bfloat16

    input_type = InputType.SEQ
    needs_item_corpus_pass = True  # trainer must run the text-encode pass

    @property
    def medusa_num_heads(self) -> int:
        if self.head_interaction in ("multiplicative", "hierarchical"):
            return self.num_segment_head * self.num_prior_head
        if self.head_interaction == "additive":
            return self.num_segment_head + self.num_prior_head
        raise ValueError(self.head_interaction)

    @property
    def seg_len(self) -> int:
        if self.medusa_num_layers > 0:
            assert self.pred_len % self.num_segment_head == 0
            return self.pred_len // self.num_segment_head
        return self.pred_len

    def horizon_discount(self):
        d = jnp.asarray(
            [self.medusa_lambda ** p for p in range(self.pred_len)], jnp.float32
        )
        return d / d.sum()

    # ------------------------------------------------------------------
    def setup(self):
        def make_llm(cfg: LLMConfig, name):
            if self.dummy_llm:
                return DummyLLM(cfg.vocab_size, cfg.hidden_size, name=name)
            if cfg.model_type == "bert":
                from mhrec_tpu.models.llm.bert import BertBackbone

                return BertBackbone(
                    cfg, dtype=self.dtype,
                    gradient_checkpointing=self.gradient_checkpointing, name=name,
                )
            # llama / mistral / qwen2 / tinyllama / baichuan share the
            # decoder topology (RMSNorm + RoPE + GQA + SwiGLU)
            return LlamaBackbone(
                cfg, dtype=self.dtype,
                gradient_checkpointing=self.gradient_checkpointing,
                remat_policy=self.remat_policy, name=name,
            )

        if not self.freeze_item_llm:
            self.item_llm = make_llm(self.item_config, "item_llm")
            if self.use_image and not self.dummy_llm:
                vcfg = self.vision_config or VisionConfig.tiny(
                    self.item_config.hidden_size
                )
                from mhrec_tpu.models.llm.vision import ClipVisionTower

                tower_cls = ClipVisionTower if vcfg.arch == "clip" else VisionTower
                kw = {}
                if self.vid_grid_t > 1:
                    if vcfg.arch == "clip":
                        raise NotImplementedError(
                            "video inputs need the Qwen2-VL tower "
                            "(temporal patch pairs); CLIP towers are "
                            "image-only"
                        )
                    kw["grid_t"] = self.vid_grid_t
                self.visual = tower_cls(
                    vcfg, grid_h=self.img_grid[0], grid_w=self.img_grid[1],
                    dtype=self.dtype,
                    gradient_checkpointing=self.gradient_checkpointing,
                    name="visual", **kw,
                )
        else:
            # precomputed table, populated via load-time assignment
            self.all_item_embeds = self.variable(
                "frozen", "all_item_embeds",
                lambda: jnp.zeros(
                    (self.item_num, self.item_config.hidden_size), jnp.float32
                ),
            )
        self.user_llm = make_llm(self.user_config, "user_llm")
        D = self.user_config.hidden_size

        if self.item_emb_token_n > 0 and not self.freeze_item_llm:
            self.item_emb_tokens = self.param(
                "item_emb_tokens", nn.initializers.normal(0.02),
                (1, self.item_emb_token_n, self.item_config.hidden_size),
            )

        if self.fix_temp:
            self.logit_scale_fixed = jnp.asarray(np.log(1 / 0.07), jnp.float32)
        else:
            self.logit_scale = self.param(
                "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
            )

        H = self.medusa_num_heads
        if self.head_interaction == "hierarchical" and self.medusa_num_layers > 0:
            if self.use_seg_embed:
                self.segment_emb = nn.Embed(
                    self.num_segment_head, D, embedding_init=trunc_normal_init,
                    name="segment_emb",
                )
            cat_heads = []
            for c in range(self.num_prior_head):
                blocks = []
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
            self.aux_cat_head = [
                nn.Dense(1, kernel_init=trunc_normal_init, bias_init=trunc_normal_init,
                         name=f"aux_cat_head_{c}")
                for c in range(self.num_prior_head)
            ]

    # -- shared-head plumbing (same as HSTU) ---------------------------
    def _logit_scale(self):
        return self.logit_scale_fixed if self.fix_temp else self.logit_scale

    def compute_heads(self, output_embs):
        if self.head_interaction == "hierarchical" and self.medusa_num_layers > 0:
            outs = []
            cat_embs = []
            for c in range(self.num_prior_head):
                h = output_embs
                for block in self.medusa_cat_head[c]:
                    h = block(h)
                cat_embs.append(h)
            for s in range(self.num_segment_head):
                bias = self.segment_emb(jnp.asarray(s)) if self.use_seg_embed else None
                for c in range(self.num_prior_head):
                    seg_in = cat_embs[c]
                    if bias is not None:
                        seg_in = seg_in + bias
                    outs.append(self.medusa_seg_head[c][s](seg_in))
            return jnp.stack(outs, axis=1)
        return jnp.stack([h(output_embs) for h in self.medusa_head], axis=1)

    # ------------------------------------------------------------------
    def _image_mrope_positions(self, T: int) -> np.ndarray:
        """[3, T] (t, h, w) M-RoPE position components for the fixed item
        layout [prefix][image/video pads][text...] (reference qwen2-vl
        get_rope_index semantics, single image — or grid_t temporal groups
        of a video — per item)."""
        m = (self.vision_config or VisionConfig.tiny()).spatial_merge_size
        gt = max(self.vid_grid_t, 1)
        hm, wm = self.img_grid[0] // m, self.img_grid[1] // m
        s, n = self.image_span_start, gt * hm * wm
        pos = np.broadcast_to(np.arange(T, dtype=np.int32), (3, T)).copy()
        j = np.arange(n)
        pos[0, s:s + n] = s + j // (hm * wm)
        pos[1, s:s + n] = s + (j % (hm * wm)) // wm
        pos[2, s:s + n] = s + j % wm
        pos[:, s + n:] = s + max(gt, hm, wm) + np.arange(T - s - n, dtype=np.int32)
        return pos

    def _image_kwargs(self, tokens, pixel_patches, image_extra=None):
        """Vision-tower call + backbone splice/position kwargs.

        ``image_extra`` (dynamic smart-resize mode, data/textset.py
        ``dynamic_image_arrays``): {patch_valid, patch_hw, img_src,
        img_pos} — per-image grids with static capacity."""
        if pixel_patches is None or self.dummy_llm or self.freeze_item_llm:
            return {}
        N, T = tokens.shape
        if image_extra and image_extra.get("img_src") is not None:
            if image_extra.get("tok_src") is not None:
                # dynamic AnyRes (clip arch): crop capacity + token gather
                img_tokens = self.visual(
                    pixel_patches, tok_src=image_extra["tok_src"]
                )                                           # [N, T_img_cap, D]
            else:
                img_tokens = self.visual(
                    pixel_patches,
                    patch_valid=image_extra["patch_valid"],
                    patch_hw=image_extra["patch_hw"],
                )                                           # [N, T_img_cap, D]
            extra = {
                "image_embeds": img_tokens,
                "image_src": image_extra["img_src"],
            }
            if self.item_config.mrope_section:
                # host-computed per-item (t, h, w) positions [N, 3, T]
                extra["position_ids"] = jnp.transpose(
                    image_extra["img_pos"], (1, 0, 2)
                )
            return extra
        img_tokens = self.visual(pixel_patches)             # [N, n_img, D]
        extra = {
            "image_embeds": img_tokens,
            "image_span": (self.image_span_start, img_tokens.shape[1]),
        }
        if self.item_config.mrope_section:
            pos = jnp.asarray(self._image_mrope_positions(T))
            extra["position_ids"] = jnp.broadcast_to(
                pos[:, None, :], (3, N, T)
            )
        return extra

    def encode_items(self, tokens: jnp.ndarray, lens: jnp.ndarray,
                     pixel_patches: Optional[jnp.ndarray] = None,
                     image_extra=None) -> jnp.ndarray:
        """Item tower: padded token batch [N, T+1] → [N, D_item]."""
        N, T = tokens.shape
        col = jnp.arange(T)[None, :]
        extra = self._image_kwargs(tokens, pixel_patches, image_extra)
        if self.item_emb_token_n > 0 and not self.dummy_llm:
            n_emb = self.item_emb_token_n
            # include the n trailing emb slots; the embedding is read from
            # the LAST slot (which attends to the text and all earlier slots)
            attn_mask = (col < lens[:, None] + n_emb).astype(jnp.int32)
            hidden = self.item_llm(
                input_ids=tokens,
                attention_mask=attn_mask,
                emb_tokens=self.item_emb_tokens,
                emb_pos=lens,
                **extra,
            )
            last = lens + (n_emb - 1)
            emb = jnp.take_along_axis(hidden, last[:, None, None], axis=1).squeeze(1)
        else:  # mean pooling over real tokens
            attn_mask = (col < lens[:, None]).astype(jnp.int32)
            hidden = self.item_llm(input_ids=tokens, attention_mask=attn_mask,
                                   **extra)
            m = attn_mask[..., None].astype(hidden.dtype)
            emb = (hidden * m).sum(axis=1) / jnp.clip(
                lens[:, None].astype(hidden.dtype), 1, None
            )
        return emb.astype(jnp.float32)

    def encode_items_packed(self, packed_tokens, segment_ids, positions, emb_slots):
        """Packed varlen item tower: flat token stream + segment ids
        (TPU equivalent of the reference's rm-pad flash-attn path).

        packed_tokens/segment_ids/positions: [S]; emb_slots: [N] flat index
        of each item's FIRST trailing emb slot (of ``item_emb_token_n``).
        → [N, D_item] read from each item's last slot.
        """
        assert self.item_emb_token_n > 0, "packed mode uses the emb-token slot"
        if packed_tokens.ndim == 2:
            # chunked packing [C, chunk] (models/llm/packed.py pack_items
            # chunk>0): chunk rows are the batch dim; emb_slots stay flat
            hidden = self.item_llm(
                input_ids=packed_tokens,
                position_ids=positions,
                segment_ids=segment_ids,
                emb_tokens=self.item_emb_tokens,
                emb_pos=emb_slots,
            )
            flat = hidden.reshape(-1, hidden.shape[-1])
            return flat[emb_slots + (self.item_emb_token_n - 1)].astype(jnp.float32)
        hidden = self.item_llm(
            input_ids=packed_tokens[None],
            position_ids=positions[None],
            segment_ids=segment_ids,
            emb_tokens=self.item_emb_tokens,
            emb_pos=emb_slots,
        )[0]  # [S, D]
        return hidden[emb_slots + (self.item_emb_token_n - 1)].astype(jnp.float32)

    def compute_item_chunk(self, tokens, lens, pixel_patches=None,
                           image_extra=None):
        """Corpus-embedding pass chunk (reference compute_item)."""
        return self.encode_items(tokens, lens, pixel_patches, image_extra)

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = False):
        user_mask = batch["masked_index"].astype(bool)
        L = self.max_seq_length

        if self.freeze_item_llm:
            table = self.all_item_embeds.value
            pos_items_embs = table[batch["items"]]

            def _neg_norm(col):
                neg = table[batch["neg_items"][:, col]]
                return cosine_normalize(neg.astype(jnp.float32)).reshape(-1, neg.shape[-1])
        elif self.packed_item_tower:
            B, W = batch["items"].shape
            if "pos_emb_slots" in batch:
                # multi-host: per-host [C, chunk] blocks concatenated along
                # the row axis; pos/neg slot blocks arrive pre-split so the
                # global gather order matches the global batch row order
                # (data/textset.py packed multi-host branch)
                emb_slots = jnp.concatenate(
                    [batch["pos_emb_slots"], batch["neg_emb_slots"]]
                )
            else:
                emb_slots = batch["emb_slots"]
            all_embs = self.encode_items_packed(
                batch["packed_tokens"], batch["packed_segment_ids"],
                batch["packed_positions"], emb_slots,
            )
            n_pos = B * W
            pos_items_embs = all_embs[:n_pos].reshape(B, W, -1)
            n_cats = batch["neg_items"].shape[1]
            neg_embs = all_embs[n_pos:].reshape(
                B, n_cats, -1, pos_items_embs.shape[-1]
            )

            def _neg_norm(col):
                neg = neg_embs[:, col]
                return cosine_normalize(neg).reshape(-1, neg.shape[-1])
        elif "uniq_tokens" in batch:
            # dedup mode: encode distinct items once, gather per occurrence
            B, W = batch["items"].shape
            uniq_embs = self.encode_items(
                batch["uniq_tokens"], batch["uniq_token_lens"],
                batch.get("uniq_pixel_patches"),
                image_extra=_batch_image_extra(batch, "uniq"),
            )
            all_embs = uniq_embs[batch["uniq_inverse"]]
            n_pos = B * W
            pos_items_embs = all_embs[:n_pos].reshape(B, W, -1)
            n_cats = batch["neg_items"].shape[1]
            neg_embs = all_embs[n_pos:].reshape(
                B, n_cats, -1, pos_items_embs.shape[-1]
            )

            def _neg_norm(col):
                neg = neg_embs[:, col]
                return cosine_normalize(neg).reshape(-1, neg.shape[-1])
        else:
            B, W = batch["items"].shape
            pos_items_embs = self.encode_items(
                batch["pos_tokens"], batch["pos_token_lens"],
                batch.get("pos_pixel_patches"),
                image_extra=_batch_image_extra(batch, "pos"),
            ).reshape(B, W, -1)                              # [B, L+P, D]
            n_cats = batch["neg_items"].shape[1]
            neg_embs = self.encode_items(
                batch["neg_tokens"], batch["neg_token_lens"],
                batch.get("neg_pixel_patches"),
                image_extra=_batch_image_extra(batch, "neg"),
            ).reshape(B, n_cats, -1, pos_items_embs.shape[-1])

            def _neg_norm(col):
                neg = neg_embs[:, col]
                return cosine_normalize(neg).reshape(-1, neg.shape[-1])

        user_hidden = self.user_llm(
            inputs_embeds=pos_items_embs[:, :L].astype(self.dtype),
            attention_mask=user_mask[:, :L].astype(jnp.int32),
        ).astype(jnp.float32)

        return compute_multihead_losses(
            self, user_hidden, pos_items_embs.astype(jnp.float32), user_mask,
            batch.get("tag_categories"), _neg_norm,
        )

    # ------------------------------------------------------------------
    def predict_embeddings(self, item_seq, target_tags=None,
                           item_feature_table=None, seq_embeds=None):
        """Eval path: user tower over table-lookup item embeddings
        (reference hllm.py:765-800). ``seq_embeds`` [B, L, D] bypasses the
        on-device table gather — used when the corpus table is host-resident
        (gathered host-side) at corpus scales that exceed HBM."""
        attn = (item_seq > 0).astype(jnp.int32)
        if seq_embeds is None:
            assert item_feature_table is not None, "HLLM predict needs the item table"
            seq_embeds = item_feature_table[item_seq]
        hidden = self.user_llm(
            inputs_embeds=seq_embeds.astype(self.dtype), attention_mask=attn
        )
        return predict_switch_and_heads(self, hidden[:, -1], target_tags)

    def score_items(self, head_embs, item_feats, item_tags, target_tags, switch_pred):
        # identical mask semantics to HSTU — delegate to its implementation
        from mhrec_tpu.models.idnet.hstu import HSTU

        return HSTU.score_items(
            self, head_embs, item_feats, item_tags, target_tags, switch_pred
        )


def load_pretrained_towers(params, config):
    """Merge local HF checkpoint weights into the item/user towers
    (reference create_llm from_pretrained, hllm.py:294-376). Returns the
    updated params dict; towers with ``*_llm_init: false`` or without local
    weights keep their random init."""
    import os

    from mhrec_tpu.models.llm.config import LLMConfig
    from mhrec_tpu.models.llm.loader import load_llama_params

    for key, dir_key, init_key in (
        ("item_llm", "item_pretrain_dir", "item_llm_init"),
        ("user_llm", "user_pretrain_dir", "user_llm_init"),
    ):
        path = config.get(dir_key)
        if key not in params or not path or not os.path.isdir(str(path)):
            continue
        if config.get(init_key, True) is False:
            continue
        cfg = LLMConfig.from_pretrained_dir(path)
        try:
            if cfg.model_type == "bert":
                from mhrec_tpu.models.llm.loader import load_bert_params

                params[key] = load_bert_params(path, cfg)
                continue
            params[key] = load_llama_params(path, cfg)
        except FileNotFoundError:
            continue
        if key == "item_llm" and "visual" in params:
            from mhrec_tpu.models.llm.loader import _load_state_dict
            from mhrec_tpu.models.llm.vision import (
                VisionConfig, has_vision_weights, load_any_vision_params,
            )

            try:
                sd = _load_state_dict(path)
                if has_vision_weights(sd):
                    vcfg = VisionConfig.from_pretrained_dir(path)
                    anyres = config.get("anyres_grid") or None
                    import dataclasses as _dc

                    if anyres:
                        vcfg = _dc.replace(
                            vcfg, anyres_grid=tuple(int(x) for x in anyres)
                        )
                    if config.get("dynamic_image_res") and vcfg.arch == "clip":
                        vcfg = _dc.replace(vcfg, dynamic_anyres=True)
                    params["visual"] = load_any_vision_params(sd, vcfg)
            except (FileNotFoundError, ValueError):
                pass
    # warm-start the learnable item-emb token(s) from a saved tensor
    # (reference item_emb_pretrain, hllm.py:105-108); accepts .npy or a
    # torch-pickled tensor
    pre = config.get("item_emb_pretrain")
    if pre and "item_emb_tokens" in params:
        if str(pre).endswith(".npy"):
            arr = np.load(pre)
        else:
            import torch

            arr = torch.load(pre, map_location="cpu", weights_only=True)
            arr = np.asarray(arr.float().numpy())
        cur = params["item_emb_tokens"]
        arr = np.asarray(arr, dtype=np.float32).reshape(np.shape(cur))
        params["item_emb_tokens"] = jnp.asarray(arr)
        logging.getLogger(__name__).info(
            "loaded item_emb_tokens from %s with %s", pre, arr.shape
        )
    return params


def hllm_from_config(config, dataload) -> HLLM:
    loss = config["loss"]
    num_prior = config["num_prior_head"] or 1
    if loss == "prior" and config["weighted_prior_loss"]:
        total_count = sum(dataload.category_counts.values())
        weights = [0.0] * num_prior
        for cat, cnt in dataload.category_counts.items():
            weights[dataload.category_to_int[cat]] = cnt / total_count
    else:
        weights = [1.0 / num_prior] * num_prior

    dummy = bool(config.get("dummy_llm", False))
    item_dir = config.get("item_pretrain_dir")
    user_dir = config.get("user_pretrain_dir")
    if dummy or not item_dir:
        vs = config.get("dummy_vocab_size", 1024)
        hs = config.get("dummy_hidden_size", 64)
        item_cfg = LLMConfig.tiny(vs, hs)
        user_cfg = LLMConfig.tiny(vs, hs)
        # random_init_towers: real (tiny) Llama backbones without checkpoints
        # — exercises the full tower path (TP annotations, RoPE, GQA) in
        # tests/dryruns; default keeps the reference's dummy_llm semantics
        dummy = not bool(config.get("random_init_towers", False)) or dummy
    else:
        item_cfg = LLMConfig.from_pretrained_dir(item_dir)
        user_cfg = LLMConfig.from_pretrained_dir(user_dir or item_dir)

    import dataclasses as _dc

    if int(config.get("tp_size", 1) or 1) > 1:
        item_cfg = _dc.replace(item_cfg, tp_shard=True)
        user_cfg = _dc.replace(user_cfg, tp_shard=True)
    if config.get("packed_item_tower", False):
        # bound the splash kernel to a causal band of the max segment length
        window = int(config.get("MAX_TEXT_LENGTH", 64)) + int(
            config.get("item_emb_token_n", 1) or 0
        )
        item_cfg = _dc.replace(item_cfg, packed_window=window)

    use_image = bool(config.get("use_image", False))
    use_video = bool(config.get("use_video", False))
    if use_image and use_video:
        raise ValueError("use_image and use_video are mutually exclusive")
    vid_grid_t = 1
    if use_video:
        use_image = True  # the video span rides the image plumbing
    vision_cfg = None
    img_grid = (16, 16)
    if use_image:
        assert not config.get("packed_item_tower"), (
            "use_image/use_video is incompatible with packed_item_tower "
            "(dense padded batches carry the static vision span)"
        )
        import os as _os

        if item_dir and _os.path.isdir(str(item_dir)):
            try:
                vision_cfg = VisionConfig.from_pretrained_dir(str(item_dir))
            except (ValueError, FileNotFoundError):
                vision_cfg = None
        if vision_cfg is None:
            vision_cfg = VisionConfig.tiny(item_cfg.hidden_size)
        anyres = config.get("anyres_grid") or None
        if anyres:
            assert vision_cfg.arch == "clip", (
                "anyres_grid is a LLaVA-family (CLIP tower) feature; the "
                "Qwen2-VL tower uses its own native grid"
            )
            vision_cfg = _dc.replace(
                vision_cfg, anyres_grid=tuple(int(x) for x in anyres)
            )
        if config.get("dynamic_image_res") and vision_cfg.arch == "clip":
            vision_cfg = _dc.replace(vision_cfg, dynamic_anyres=True)
        ih = int(config.get("img_height", 224))
        iw = int(config.get("img_width", 224))
        img_grid = (ih // vision_cfg.patch_size, iw // vision_cfg.patch_size)
        if use_video:
            vid_grid_t = max(
                int(config.get("video_nframes", 4) or 4)
                // vision_cfg.temporal_patch_size, 1,
            )

    i2c = config["int_to_category"] or {}
    eval_pred_len = config["eval_pred_len"]
    prior_given = bool(config.get("prior_given_at_test", False))
    # compute dtype from the reference's `precision` key (bf16-mixed default;
    # '32' / 'fp32' force full-precision towers — also the numerics knob the
    # sharding-parity tests use)
    prec = str(config.get("precision") or "bf16-mixed")
    compute_dtype = jnp.float32 if "32" in prec and "bf16" not in prec else jnp.bfloat16
    return HLLM(
        dtype=compute_dtype,
        item_config=item_cfg,
        user_config=user_cfg,
        max_seq_length=config["MAX_ITEM_LIST_LENGTH"],
        pred_len=config["pred_len"],
        dummy_llm=dummy,
        freeze_item_llm=bool(config.get("freeze_item_llm", False)),
        packed_item_tower=bool(config.get("packed_item_tower", False)),
        item_num=dataload.item_num,
        item_emb_token_n=config.get("item_emb_token_n", 1) or 0,
        gradient_checkpointing=bool(config.get("gradient_checkpointing", False)),
        remat_policy=str(config.get("remat_policy") or "full"),
        nce_impl=str(config.get("nce_impl") or "banded"),
        prior_loss_impl=str(config.get("prior_loss_impl") or "loop"),
        use_image=use_image,
        vision_config=vision_cfg,
        img_grid=img_grid,
        vid_grid_t=vid_grid_t,
        loss_type=loss,
        nce_thres=config["nce_thres"] or 0.99,
        fix_temp=bool(config["fix_temp"]),
        medusa_lambda=config["medusa_lambda"],
        medusa_num_layers=config["medusa_num_layers"] or 0,
        num_segment_head=config["num_segment_head"] or 1,
        num_prior_head=num_prior,
        head_interaction=config["head_interaction"],
        neg_sample_by_cat=bool(config["neg_sample_by_cat"]) and loss == "prior",
        pos_sample_mix_ratio=config["pos_sample_mix_ratio"] or 0.0,
        prior_loss_weight=tuple(weights),
        prior_switch=config["prior_switch"],
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
        int_to_category=tuple(i2c.get(i, str(i)) for i in range(num_prior)),
        head_norm=config.get("head_norm", False),
        cat_bottleneck=config.get("cat_bottleneck", False),
        cat_bottleneck_dim=config.get("cat_bottleneck_dim", 0) or 0,
        share_seg_weights=config.get("share_seg_weights", False),
        use_seg_embed=config.get("segment_embed", False),
    )
