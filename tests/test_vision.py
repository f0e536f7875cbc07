"""Image branch: host patchifier, vision tower, M-RoPE, HF weight loading,
and HLLM use_image end to end (reference trainset.py:386-471 +
modeling_qwen2_vl.py vision stack)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.data.vision import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    ImagePreprocessor,
)
from mhrec_tpu.models.llm.config import LLMConfig
from mhrec_tpu.models.llm.llama import (
    mrope_rotary_embedding,
    rotary_embedding,
)
from mhrec_tpu.models.llm.vision import (
    VisionConfig,
    VisionTower,
    load_vision_params,
    vision_rotary_tables,
)
from mhrec_tpu.trainer import Trainer

pytest.importorskip("PIL")


def test_patchify_pixel_mapping():
    """Patch rows are ordered (h_block, w_block, merge_h, merge_w) and each
    vector is [c, temporal, ps, ps] — the HF Qwen2-VL layout."""
    ps, m = 2, 2
    H = W = 8  # grid 4x4
    prep = ImagePreprocessor(H, W, patch_size=ps, temporal_patch_size=2,
                             spatial_merge_size=m)
    # encode pixel coordinates into the channels
    chw = np.zeros((3, H, W), np.float32)
    chw[0] = np.arange(H)[:, None]  # row index
    chw[1] = np.arange(W)[None, :]  # col index
    patches = prep._patchify(chw)
    assert patches.shape == (prep.n_patches, 3 * 2 * ps * ps)
    gh, gw = H // ps, W // ps
    for p in range(prep.n_patches):
        hb, rem = divmod(p, (gw // m) * m * m)
        wb, rem2 = divmod(rem, m * m)
        mh, mw = divmod(rem2, m)
        row0 = (hb * m + mh) * ps
        col0 = (wb * m + mw) * ps
        vec = patches[p].reshape(3, 2, ps, ps)
        np.testing.assert_array_equal(vec[0, 0], chw[0, row0:row0 + ps, col0:col0 + ps])
        np.testing.assert_array_equal(vec[1, 0], chw[1, row0:row0 + ps, col0:col0 + ps])
        np.testing.assert_array_equal(vec[:, 0], vec[:, 1])  # temporal dup


def test_black_fallback_and_load():
    prep = ImagePreprocessor(8, 8, patch_size=2, temporal_patch_size=2,
                             spatial_merge_size=2)
    black = prep.load(None)
    assert black.shape == (prep.n_patches, prep.patch_dim)
    # black pixels = (0 - mean)/std per channel
    vec = black[0].reshape(3, 2, 2, 2)
    for c in range(3):
        np.testing.assert_allclose(
            vec[c], (-OPENAI_CLIP_MEAN[c] / OPENAI_CLIP_STD[c]), rtol=1e-5
        )
    assert prep.load("/nonexistent/file.jpg") is black or np.array_equal(
        prep.load("/nonexistent/file.jpg"), black
    )


def test_real_image_roundtrip(tmp_path):
    from PIL import Image

    prep = ImagePreprocessor(8, 8, patch_size=2, temporal_patch_size=2,
                             spatial_merge_size=2)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (12, 10, 3), np.uint8), "RGB"
    )
    p = tmp_path / "x.jpg"
    img.save(p)
    patches = prep.load(str(p))
    assert patches.shape == (16, 24)
    assert np.isfinite(patches).all()
    assert not np.array_equal(patches, prep.load(None))


def test_vision_tower_shapes_and_grouping():
    import jax

    cfg = VisionConfig.tiny(hidden_size=48)
    grid_h = grid_w = 4
    tower = VisionTower(cfg, grid_h=grid_h, grid_w=grid_w, dtype=jnp.float32)
    patches = np.random.default_rng(0).normal(
        size=(3, grid_h * grid_w, cfg.patch_dim)
    ).astype(np.float32)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(patches))["params"]
    out = tower.apply({"params": params}, jnp.asarray(patches))
    assert out.shape == (3, (grid_h // 2) * (grid_w // 2), 48)
    assert np.isfinite(np.asarray(out)).all()


def test_vision_rotary_table_order():
    cos, sin = vision_rotary_tables(4, 4, merge=2, head_dim=8)
    assert cos.shape == (16, 8)
    # patch 0 is (h=0, w=0): zero angle -> cos 1, sin 0
    np.testing.assert_allclose(cos[0], 1.0)
    np.testing.assert_allclose(sin[0], 0.0)
    # patch 1 is (h=0, w=1) within the first merge block: h-half stays zero
    np.testing.assert_allclose(cos[1, :2], 1.0)
    assert not np.allclose(cos[1, 2:4], 1.0)


def test_mrope_reduces_to_1d_rope():
    """When the (t, h, w) components are all equal (text-only), M-RoPE must
    equal the standard rotary embedding."""
    B, T, dh = 2, 6, 8
    pos = np.arange(T)[None].repeat(B, 0)
    pos3 = jnp.asarray(np.stack([pos] * 3))
    c3, s3 = mrope_rotary_embedding(pos3, dh, 10000.0, (2, 1, 1))
    c1, s1 = rotary_embedding(jnp.asarray(pos), dh, 10000.0)
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s1), rtol=1e-6)


def _write_tiny_qwen2vl_ckpt(dirpath, vocab=96, hidden=32, layers=2, heads=4,
                             kv=2, vps=4, vdim=16, vdepth=2, vheads=4):
    """Tiny HF-style qwen2_vl checkpoint: text decoder with qkv bias +
    mrope, and a visual.* vision tower."""
    import torch

    os.makedirs(dirpath, exist_ok=True)
    inter = hidden * 2
    dh = hidden // heads
    g = torch.Generator().manual_seed(7)
    sd = {}
    sd["model.embed_tokens.weight"] = torch.randn(vocab, hidden, generator=g) * 0.02
    sd["model.norm.weight"] = torch.ones(hidden)
    for i in range(layers):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = torch.randn(heads * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(kv * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.v_proj.weight"] = torch.randn(kv * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.q_proj.bias"] = torch.zeros(heads * dh)
        sd[f"{p}.self_attn.k_proj.bias"] = torch.zeros(kv * dh)
        sd[f"{p}.self_attn.v_proj.bias"] = torch.zeros(kv * dh)
        sd[f"{p}.self_attn.o_proj.weight"] = torch.randn(hidden, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.gate_proj.weight"] = torch.randn(inter, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.up_proj.weight"] = torch.randn(inter, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(hidden, inter, generator=g) * 0.05
        sd[f"{p}.input_layernorm.weight"] = torch.ones(hidden)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(hidden)
    # vision tower
    patch_dim = 3 * 2 * vps * vps
    vmlp = vdim * 2
    sd["visual.patch_embed.proj.weight"] = torch.randn(vdim, 3, 2, vps, vps, generator=g) * 0.05
    for i in range(vdepth):
        p = f"visual.blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(vdim)
        sd[f"{p}.norm1.bias"] = torch.zeros(vdim)
        sd[f"{p}.norm2.weight"] = torch.ones(vdim)
        sd[f"{p}.norm2.bias"] = torch.zeros(vdim)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * vdim, vdim, generator=g) * 0.05
        sd[f"{p}.attn.qkv.bias"] = torch.zeros(3 * vdim)
        sd[f"{p}.attn.proj.weight"] = torch.randn(vdim, vdim, generator=g) * 0.05
        sd[f"{p}.attn.proj.bias"] = torch.zeros(vdim)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(vmlp, vdim, generator=g) * 0.05
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(vmlp)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(vdim, vmlp, generator=g) * 0.05
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(vdim)
    merged = vdim * 4
    sd["visual.merger.ln_q.weight"] = torch.ones(vdim)
    sd["visual.merger.ln_q.bias"] = torch.zeros(vdim)
    sd["visual.merger.mlp.0.weight"] = torch.randn(merged, merged, generator=g) * 0.05
    sd["visual.merger.mlp.0.bias"] = torch.zeros(merged)
    sd["visual.merger.mlp.2.weight"] = torch.randn(hidden, merged, generator=g) * 0.05
    sd["visual.merger.mlp.2.bias"] = torch.zeros(hidden)
    torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    with open(os.path.join(dirpath, "config.json"), "w") as fh:
        json.dump(
            {
                "model_type": "qwen2_vl", "vocab_size": vocab,
                "hidden_size": hidden, "intermediate_size": inter,
                "num_hidden_layers": layers, "num_attention_heads": heads,
                "num_key_value_heads": kv, "rms_norm_eps": 1e-5,
                "rope_scaling": {"type": "mrope", "mrope_section": [2, 1, 1]},
                "vision_config": {
                    "embed_dim": vdim, "depth": vdepth, "num_heads": vheads,
                    "mlp_ratio": 2, "patch_size": vps,
                    "temporal_patch_size": 2, "spatial_merge_size": 2,
                    "hidden_size": hidden, "hidden_act": "quick_gelu",
                },
            },
            fh,
        )
    return patch_dim


def test_vision_config_and_loader(tmp_path):
    import jax

    d = str(tmp_path / "qwen2vl")
    _write_tiny_qwen2vl_ckpt(d)
    lcfg = LLMConfig.from_pretrained_dir(d)
    assert lcfg.model_type == "qwen2_vl"
    assert lcfg.attention_bias is True
    assert lcfg.mrope_section == (2, 1, 1)
    vcfg = VisionConfig.from_pretrained_dir(d)
    assert vcfg.embed_dim == 16 and vcfg.depth == 2 and vcfg.patch_size == 4

    from mhrec_tpu.models.llm.loader import _load_state_dict

    sd = _load_state_dict(d)
    params = load_vision_params(sd, vcfg)
    tower = VisionTower(vcfg, grid_h=4, grid_w=4, dtype=jnp.float32)
    patches = np.random.default_rng(0).normal(size=(2, 16, vcfg.patch_dim))
    out = tower.apply({"params": params}, jnp.asarray(patches, jnp.float32))
    assert out.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(out)).all()
    # patch_embed kernel equals the flattened Conv3d weight, transposed
    np.testing.assert_allclose(
        params["patch_embed"]["kernel"],
        np.asarray(sd["visual.patch_embed.proj.weight"]).reshape(16, -1).T,
    )


@pytest.mark.slow
def test_hllm_use_image_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """Full use_image run: tiny qwen2-vl item tower, images on disk for some
    items, black fallback for the rest; one fit + evaluate."""
    from PIL import Image

    ckpt = str(tmp_path / "qwen2vl")
    _write_tiny_qwen2vl_ckpt(ckpt)
    image_dir = tmp_path / "images"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(0, 20):  # images for a subset of items (tokens i0..i19)
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_image=True,
            image_dir=str(image_dir),
            img_height=16, img_width=16,   # grid 4x4 -> 4 image tokens
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=16,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_img")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    n_pos = b["pos_tokens"].shape[0]
    assert b["pos_pixel_patches"].shape == (n_pos, 16, 96)  # 4x4 patches, 3*2*4*4
    # image prefix span occupies the head of every token row
    assert (b["pos_tokens"][:, 1:5] == b["pos_tokens"][0, 1]).all()
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def _write_tiny_llava_ckpt(dirpath, vocab=96, hidden=32, layers=2, heads=4,
                           kv=2, vps=4, vdim=16, vdepth=2, img=16):
    """Tiny HF-style llava_next checkpoint: text_config-nested llama decoder
    under language_model.*, CLIP vision tower + multimodal projector."""
    import torch

    os.makedirs(dirpath, exist_ok=True)
    inter = hidden * 2
    dh = hidden // heads
    g = torch.Generator().manual_seed(11)
    sd = {}
    P = f"language_model.model"
    sd[f"{P}.embed_tokens.weight"] = torch.randn(vocab, hidden, generator=g) * 0.02
    sd[f"{P}.norm.weight"] = torch.ones(hidden)
    for i in range(layers):
        p = f"{P}.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = torch.randn(heads * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(kv * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.v_proj.weight"] = torch.randn(kv * dh, hidden, generator=g) * 0.05
        sd[f"{p}.self_attn.o_proj.weight"] = torch.randn(hidden, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.gate_proj.weight"] = torch.randn(inter, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.up_proj.weight"] = torch.randn(inter, hidden, generator=g) * 0.05
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(hidden, inter, generator=g) * 0.05
        sd[f"{p}.input_layernorm.weight"] = torch.ones(hidden)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(hidden)
    V = "vision_tower.vision_model"
    n_patches = (img // vps) ** 2
    vmlp = vdim * 2
    sd[f"{V}.embeddings.class_embedding"] = torch.randn(vdim, generator=g) * 0.02
    sd[f"{V}.embeddings.patch_embedding.weight"] = torch.randn(vdim, 3, vps, vps, generator=g) * 0.05
    sd[f"{V}.embeddings.position_embedding.weight"] = torch.randn(n_patches + 1, vdim, generator=g) * 0.02
    sd[f"{V}.pre_layrnorm.weight"] = torch.ones(vdim)
    sd[f"{V}.pre_layrnorm.bias"] = torch.zeros(vdim)
    for i in range(vdepth - 1):
        p = f"{V}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{ln}.weight"] = torch.ones(vdim)
            sd[f"{p}.{ln}.bias"] = torch.zeros(vdim)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = torch.randn(vdim, vdim, generator=g) * 0.05
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(vdim)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(vmlp, vdim, generator=g) * 0.05
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(vmlp)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(vdim, vmlp, generator=g) * 0.05
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(vdim)
    sd["multi_modal_projector.linear_1.weight"] = torch.randn(hidden, vdim, generator=g) * 0.05
    sd["multi_modal_projector.linear_1.bias"] = torch.zeros(hidden)
    sd["multi_modal_projector.linear_2.weight"] = torch.randn(hidden, hidden, generator=g) * 0.05
    sd["multi_modal_projector.linear_2.bias"] = torch.zeros(hidden)
    torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    with open(os.path.join(dirpath, "config.json"), "w") as fh:
        json.dump(
            {
                "model_type": "llava_next",
                "text_config": {
                    "model_type": "llama", "vocab_size": vocab,
                    "hidden_size": hidden, "intermediate_size": inter,
                    "num_hidden_layers": layers, "num_attention_heads": heads,
                    "num_key_value_heads": kv, "rms_norm_eps": 1e-5,
                },
                "vision_config": {
                    "model_type": "clip_vision_model", "hidden_size": vdim,
                    "num_hidden_layers": vdepth, "num_attention_heads": 4,
                    "intermediate_size": vmlp, "patch_size": vps,
                    "image_size": img, "hidden_act": "quick_gelu",
                },
            },
            fh,
        )


@pytest.mark.slow
def test_llava_clip_tower_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """LLaVA-family item tower: text_config parsing, language_model.* weight
    nesting, CLIP vision tower, one fit + evaluate."""
    from PIL import Image

    from mhrec_tpu.models.llm.vision import ClipVisionTower

    ckpt = str(tmp_path / "llava")
    _write_tiny_llava_ckpt(ckpt)
    lcfg = LLMConfig.from_pretrained_dir(ckpt)
    assert lcfg.hidden_size == 32 and lcfg.model_type == "llama"
    vcfg = VisionConfig.from_pretrained_dir(ckpt)
    assert vcfg.arch == "clip" and vcfg.temporal_patch_size == 1
    assert vcfg.spatial_merge_size == 1

    from mhrec_tpu.models.llm.loader import _load_state_dict
    from mhrec_tpu.models.llm.vision import load_any_vision_params

    sd = _load_state_dict(ckpt)
    params = load_any_vision_params(sd, vcfg)
    tower = ClipVisionTower(vcfg, grid_h=4, grid_w=4, dtype=jnp.float32)
    patches = np.random.default_rng(0).normal(size=(2, 16, vcfg.patch_dim))
    out = tower.apply({"params": params}, jnp.asarray(patches, jnp.float32))
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()

    image_dir = tmp_path / "imgs"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(10):
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")
    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_image=True,
            image_dir=str(image_dir),
            img_height=16, img_width=16,   # 4x4 patches -> 16 image tokens
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=24,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_llava")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_anyres_preprocessor_crops():
    """Fixed-grid AnyRes host side: base crop first, grid crops row-major,
    each crop = patchify of the corresponding hi-res region (reference
    modeling_llava_next.py get_image_patches at one pinned pinpoint)."""
    from PIL import Image

    prep = ImagePreprocessor(8, 8, patch_size=4, temporal_patch_size=1,
                             spatial_merge_size=1, anyres_grid=(2, 2))
    assert prep.n_crops == 5
    # tokens = base P + (gh·grid_h)·(gw·grid_w + 1) newline-padded rows
    assert prep.n_tokens == 4 + (2 * 2) * (2 * 2 + 1)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8), "RGB")
    out = prep.preprocess(img)
    assert out.shape == (5, prep.n_patches, prep.patch_dim)

    base_prep = ImagePreprocessor(8, 8, patch_size=4, temporal_patch_size=1,
                                  spatial_merge_size=1)
    np.testing.assert_allclose(out[0], base_prep.preprocess(img), rtol=1e-6)
    # crop (r, c) of the (16, 16) hi-res resize
    hi = img.convert("RGB").resize((16, 16))
    hi_arr = (np.asarray(hi, np.float32) / 255.0 - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    hi_chw = hi_arr.transpose(2, 0, 1)
    for r in range(2):
        for c in range(2):
            region = np.ascontiguousarray(hi_chw[:, r * 8:(r + 1) * 8, c * 8:(c + 1) * 8])
            np.testing.assert_allclose(
                out[1 + r * 2 + c], base_prep._patchify(region), rtol=1e-6
            )
    # black fallback covers all crops
    assert prep._black.shape == out.shape


def test_anyres_clip_pack_matches_reference_math():
    """Rank-4 AnyRes input through ClipVisionTower == per-crop features
    packed with the llava-next pack_image_features layout (base first, grid
    stitched (gh,H,gw,W)→rows, image_newline per row)."""
    import dataclasses

    import jax

    from mhrec_tpu.models.llm.vision import ClipVisionTower

    vcfg = dataclasses.replace(
        VisionConfig(arch="clip", embed_dim=16, depth=2, num_heads=2,
                     intermediate_size=32, patch_size=4, temporal_patch_size=1,
                     spatial_merge_size=1, hidden_size=24, use_cls_token=True),
        anyres_grid=(2, 2),
    )
    tower = ClipVisionTower(vcfg, grid_h=2, grid_w=2, dtype=jnp.float32)
    N, P = 3, 4
    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.normal(size=(N, 5, P, vcfg.patch_dim)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), patches)["params"]
    packed = np.asarray(tower.apply({"params": params}, patches))
    assert packed.shape == (N, 4 + (2 * 2) * (2 * 2 + 1), 24)

    # per-crop features via the rank-3 (non-anyres) branch, same params
    flat = np.asarray(
        tower.apply({"params": params}, patches.reshape(N * 5, P, -1))
    ).reshape(N, 5, P, 24)
    newline = np.asarray(params["image_newline"])
    for n in range(N):
        np.testing.assert_allclose(packed[n, :P], flat[n, 0], rtol=1e-5)
        grid = flat[n, 1:].reshape(2, 2, 2, 2, 24)          # [gh, gw, H, W, D]
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(4, 4, 24)
        want = np.concatenate(
            [grid, np.broadcast_to(newline, (4, 1, 24))], axis=1
        ).reshape(-1, 24)
        np.testing.assert_allclose(packed[n, P:], want, rtol=1e-5)


@pytest.mark.slow
def test_llava_anyres_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """HLLM + LLaVA tower with anyres_grid: fit + evaluate run, image span
    sized base+grid+newlines."""
    from PIL import Image

    ckpt = str(tmp_path / "llava")
    _write_tiny_llava_ckpt(ckpt)
    image_dir = tmp_path / "imgs"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(6)
    for i in range(10):
        Image.fromarray(
            rng.integers(0, 255, (20, 28, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")
    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_image=True,
            anyres_grid=[2, 2],
            image_dir=str(image_dir),
            img_height=8, img_width=8,     # 2x2 patches: 4 + 4*5 = 24 img tokens
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=48,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_anyres")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


# ---------------------------------------------------------------------------
# dynamic resolution (smart-resize) — reference qwen_vl_utils.py:53-79 +
# the varlen vision path of modeling_qwen2_vl.py
# ---------------------------------------------------------------------------


def test_smart_resize_reference_math():
    from mhrec_tpu.data.vision import smart_resize

    # constraints: divisible by factor, pixels within budget, aspect kept
    for (h, w) in [(480, 640), (1024, 768), (30, 50), (2000, 300), (28, 28)]:
        hb, wb = smart_resize(h, w, factor=28, min_pixels=4 * 28 * 28,
                              max_pixels=256 * 28 * 28)
        assert hb % 28 == 0 and wb % 28 == 0
        assert 4 * 28 * 28 <= hb * wb <= 256 * 28 * 28
    # aspect preserved when no clamping needed
    hb, wb = smart_resize(280, 560, factor=28, min_pixels=4 * 784,
                          max_pixels=16384 * 784)
    assert (hb, wb) == (280, 560)
    # max_pixels clamp scales down keeping ratio roughly
    hb, wb = smart_resize(2800, 2800, factor=28, min_pixels=4 * 784,
                          max_pixels=100 * 784)
    assert hb * wb <= 100 * 784 and hb == wb


def test_dynamic_preprocessor_capacity_arrays(tmp_path):
    from PIL import Image

    from mhrec_tpu.data.vision import DynamicImagePreprocessor

    dyn = DynamicImagePreprocessor(
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        min_pixels=4 * 8 * 8, max_pixels=16 * 8 * 8,  # factor=8, cap 16 tokens
    )
    assert dyn.token_cap == 16 and dyn.patch_cap == 64
    rng = np.random.default_rng(0)
    p = tmp_path / "a.png"
    Image.fromarray(rng.integers(0, 255, (16, 32, 3), np.uint8), "RGB").save(p)
    patches, valid, hw, ntok = dyn.load(str(p))
    assert patches.shape == (64, dyn.patch_dim)
    # 16x32 -> smart target 16x32 -> grid 4x8 patches, 8 merged tokens
    assert valid.sum() == 32 and ntok == 8
    assert hw[:32, 0].max() == 3 and hw[:32, 1].max() == 7
    assert not valid[32:].any() and (patches[32:] == 0).all()
    # merge-block patch order: first block covers h,w in {0,1}x{0,1}
    assert set(map(tuple, hw[:4].tolist())) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    # missing file -> default grid black image, still valid arrays
    pb, vb, hb, nb = dyn.load(None)
    assert vb.sum() > 0 and nb == vb.sum() // 4


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_dynamic_matches_static_when_sizes_equal(synth_dir, tmp_path_factory,
                                                 tmp_path):
    """With every image at one native size, the dynamic path must reproduce
    the static fixed-resolution path's item embeddings exactly (same grid,
    same rope positions, same splice)."""
    from PIL import Image

    from mhrec_tpu.parallel.mesh import shard_batch

    ckpt = str(tmp_path / "qwen2vl")
    _write_tiny_qwen2vl_ckpt(ckpt)
    image_dir = tmp_path / "images"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(0, 30):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")

    base = dict(
        data_path=synth_dir["data_path"],
        dataset=synth_dir["name"],
        text_path=synth_dir["text_path"],
        model="HLLM",
        dummy_llm=False,
        item_pretrain_dir=ckpt,
        user_pretrain_dir=ckpt,
        use_image=True,
        image_dir=str(image_dir),
        MAX_ITEM_LIST_LENGTH=4,
        MAX_TEXT_LENGTH=16,
        train_batch_size=4,
        eval_batch_size=8,
        num_negatives=4,
        tag_version="v1",
        eval_pred_len=2, pred_len=2,
        topk=[5],
        total_iters=1, eval_interval=100,
        seed=11,
    )

    def item_embs(extra_cfg, tag):
        cfg = Config(
            config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
            config_dict=dict(
                base, checkpoint_dir=str(tmp_path_factory.mktemp(tag)),
                **extra_cfg,
            ),
        ).finalize()
        data = InteractionData(cfg).build()
        train, _, _ = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        b = next(iter(train.epoch_batches(0)))
        import jax

        b = {k: jnp.asarray(v) for k, v in b.items()}
        extra = None
        if "pos_img_src" in b:
            extra = {
                "patch_valid": b["pos_patch_valid"],
                "patch_hw": b["pos_patch_hw"],
                "img_src": b["pos_img_src"],
                "img_pos": b["pos_img_pos"],
            }
        fn = jax.jit(lambda p, tok, lens, px, ex: t.model.apply(
            {"params": p}, tok, lens, px, ex, method="encode_items"))
        embs = fn(t.state.params, b["pos_tokens"], b["pos_token_lens"],
                  b["pos_pixel_patches"], extra)
        return np.asarray(embs), np.asarray(b["pos_tokens"]), t

    # native 16x16, ps=4, merge=2 -> static grid 4x4 == smart-resize target
    dyn_embs, dyn_tokens, _ = item_embs(
        dict(dynamic_image_res=True,
             image_min_pixels=4 * 8 * 8, image_max_pixels=4 * 8 * 8),
        "dyn",
    )
    st_embs, st_tokens, _ = item_embs(
        dict(img_height=16, img_width=16), "static"
    )
    assert (dyn_tokens == st_tokens).all()
    np.testing.assert_allclose(dyn_embs, st_embs, rtol=2e-2, atol=2e-2)


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_dynamic_mixed_sizes_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """Images at DIFFERENT native sizes in one batch: per-item spans differ,
    the run trains + evaluates, and each item's token stream carries exactly
    its n_i image pads."""
    from PIL import Image

    ckpt = str(tmp_path / "qwen2vl")
    _write_tiny_qwen2vl_ckpt(ckpt)
    image_dir = tmp_path / "images"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    sizes = [(8, 8), (16, 8), (16, 24), (8, 32)]
    for i in range(0, 24):
        h, w = sizes[i % len(sizes)]
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_image=True,
            dynamic_image_res=True,
            image_min_pixels=1 * 8 * 8,
            image_max_pixels=6 * 8 * 8,
            image_dir=str(image_dir),
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=16,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_dyn")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    # spans vary: image-pad counts differ across rows
    n_img = (b["pos_img_src"] >= 0).sum(axis=1)
    assert len(np.unique(n_img)) > 1, "expected mixed image-token counts"
    # img_src enumerates 0..n_i-1 contiguously from position 1
    row = int(np.argmax(n_img))
    n = int(n_img[row])
    assert (b["pos_img_src"][row, 1:1 + n] == np.arange(n)).all()
    assert (b["pos_img_src"][row, 1 + n:] == -1).all()
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


# ---------------------------------------------------------------------------
# dynamic AnyRes (LLaVA-Next per-image pinpoints) — reference
# modeling_llava_next.py get_image_patches / pack_image_features / unpad_image
# ---------------------------------------------------------------------------


def test_select_best_resolution_matches_hf():
    from mhrec_tpu.data.vision import select_best_resolution

    hf = pytest.importorskip(
        "transformers.image_processing_utils"
    ).select_best_resolution
    pins = [[32, 16], [16, 32], [32, 32], [48, 16], [16, 48]]
    for (oh, ow) in [(10, 40), (40, 10), (20, 20), (100, 30), (17, 33),
                     (16, 16), (300, 300)]:
        ours = select_best_resolution(oh, ow, pins)
        theirs = tuple(hf((oh, ow), pins))
        assert ours == theirs, (oh, ow, ours, theirs)


def test_anyres_preprocessor_dynamic_maps(tmp_path):
    from PIL import Image

    from mhrec_tpu.data.vision import AnyResPreprocessor

    prep = AnyResPreprocessor(patch_size=4, image_size=16,
                              pinpoints=[(32, 16), (16, 32)])
    assert prep.c_cap == 3 and prep.P == 16
    rng = np.random.default_rng(3)
    # wide image → (16, 32) pinpoint: 1x2 grid, rows unpadded per aspect
    p = tmp_path / "wide.jpg"
    Image.fromarray(rng.integers(0, 255, (16, 64, 3), np.uint8), "RGB").save(p)
    crops, tok_src, n = prep.load(str(p))
    assert crops.shape == (3, 16, 48)
    # base tokens first
    assert (tok_src[:16] == np.arange(16)).all()
    # feature grid 4x8, original 16x64 → new_h = round(16*8/64)=2 rows kept,
    # 1-row pad top/bottom; each kept row = 8 cols + newline
    assert n == 16 + 2 * 9
    newline = prep.c_cap * prep.P
    grid_part = tok_src[16:n].reshape(2, 9)
    assert (grid_part[:, -1] == newline).all()
    assert (grid_part[:, :-1] != newline).all()
    assert (tok_src[n:] == -1).all()
    # count_for_size agrees with load without decoding pixels
    assert prep.count_for_size(16, 64) == n
    # missing image → base crop only
    _, tok_b, nb = prep.load(None)
    assert nb == 16 and (tok_b[16:] == -1).all()


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_dynamic_anyres_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """LLaVA item tower with per-image pinpoints: mixed aspect ratios in one
    batch, variable spans, train + eval."""
    from PIL import Image

    ckpt = str(tmp_path / "llava")
    _write_tiny_llava_ckpt(ckpt)
    image_dir = tmp_path / "images"
    ds_dir = image_dir / synth_dir["name"]
    ds_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    sizes = [(16, 16), (16, 48), (48, 16), (24, 24)]
    for i in range(0, 24):
        h, w = sizes[i % len(sizes)]
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), np.uint8), "RGB"
        ).save(ds_dir / f"i{i}.jpg")

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_image=True,
            dynamic_image_res=True,
            image_grid_pinpoints=[[32, 16], [16, 32]],
            img_height=16, img_width=16,
            image_dir=str(image_dir),
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=64,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_anyres")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    assert b["pos_pixel_patches"].ndim == 4          # [N, C_cap, P, dim]
    n_img = (b["pos_img_src"] >= 0).sum(axis=1)
    assert len(np.unique(n_img)) > 1, "expected mixed image-token counts"
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


# ---------------------------------------------------------------------------
# Video inputs (reference qwen_vl_utils.py video branch)
# ---------------------------------------------------------------------------
def test_smart_nframes_reference_semantics():
    from mhrec_tpu.data.vision import smart_nframes

    # explicit nframes rounds to FRAME_FACTOR (banker's round, like the
    # reference's round_by_factor: round(5/2)=2 → 4)
    assert smart_nframes({"nframes": 5}, total_frames=100, video_fps=30) == 4
    assert smart_nframes({"nframes": 7}, total_frames=100, video_fps=30) == 8
    # fps mode: 100 frames @30fps sampled at 2fps → 6.67 → clamp/round
    n = smart_nframes({}, total_frames=100, video_fps=30.0)
    assert n == 6  # round_by_factor(6.67, 2)
    # min_frames clamp
    assert smart_nframes({}, total_frames=10, video_fps=30.0) == 4
    # explicit fps + max_frames clamp
    assert smart_nframes({"fps": 30.0, "max_frames": 8},
                         total_frames=100, video_fps=30.0) == 8
    import pytest as _pt
    with _pt.raises(ValueError):
        smart_nframes({"nframes": 200}, total_frames=100, video_fps=30)
    with _pt.raises(AssertionError):
        smart_nframes({"nframes": 4, "fps": 2}, total_frames=100, video_fps=30)


def test_fetch_video_frame_list_pads_to_frame_factor():
    from PIL import Image

    from mhrec_tpu.data.vision import fetch_video

    rng = np.random.default_rng(0)
    frames = [
        Image.fromarray(rng.integers(0, 255, (40, 52, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    out = fetch_video({"video": frames})
    assert len(out) == 4  # padded to FRAME_FACTOR multiple, last repeated
    assert out[3] == out[2]
    # smart-resized to factor-28 dims
    assert out[0].height % 28 == 0 and out[0].width % 28 == 0


def test_patchify_video_matches_hf_processor():
    """Bit-parity of the video patch flattening (REAL temporal pairs) with
    HF Qwen2VLImageProcessor's video path."""
    from transformers import Qwen2VLImageProcessor

    from mhrec_tpu.data.vision import patchify_video

    rng = np.random.default_rng(1)
    T, H, W = 4, 56, 84
    frames_hwc = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
    proc = Qwen2VLImageProcessor(do_resize=False)
    ref = proc(images=None, videos=[list(frames_hwc)], return_tensors="np")
    ours, grid = patchify_video(
        np.asarray(frames_hwc, np.float32).transpose(0, 3, 1, 2))
    assert tuple(ref["video_grid_thw"][0]) == grid
    np.testing.assert_allclose(
        ours, ref["pixel_values_videos"], rtol=0, atol=2e-6
    )


def test_patchify_video_odd_frames_repeat_last():
    from mhrec_tpu.data.vision import patchify_video

    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 255, (3, 3, 28, 28)).astype(np.float32)
    p3, g3 = patchify_video(frames)
    p4, g4 = patchify_video(
        np.concatenate([frames, frames[-1:]], axis=0))
    assert g3 == g4 == (2, 2, 2)
    np.testing.assert_array_equal(p3, p4)


def test_video_file_decode_unavailable_is_loud():
    from mhrec_tpu.data.vision import fetch_video

    try:
        import torchvision  # noqa: F401
        pytest.skip("torchvision available; decode path would run")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="list of frame images"):
        fetch_video({"video": "/tmp/nonexistent.mp4"})


def test_video_store_batch_matches_patchify(synth_dir, tmp_path):
    """ItemVideoStore static batch == direct fetch_video+patchify_video on
    the same frames; missing items get black-frame fallback patches."""
    from PIL import Image

    from mhrec_tpu.data.vision import ItemVideoStore, patchify_video

    ckpt = str(tmp_path / "qwen2vl_v")
    _write_tiny_qwen2vl_ckpt(ckpt)
    video_dir = tmp_path / "videos"
    ds_dir = video_dir / synth_dir["name"]
    rng = np.random.default_rng(3)
    frames_dir = ds_dir / "i1"
    frames_dir.mkdir(parents=True)
    frame_paths = []
    for t in range(4):
        p = frames_dir / f"f{t:02d}.png"
        Image.fromarray(
            rng.integers(0, 255, (20, 24, 3), np.uint8), "RGB").save(p)
        frame_paths.append(str(p))

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"], model="HLLM",
            item_pretrain_dir=ckpt, use_video=True, video_nframes=4,
            video_dir=str(video_dir), img_height=16, img_width=16,
            MAX_ITEM_LIST_LENGTH=4, MAX_TEXT_LENGTH=16,
            tag_version="v1", eval_pred_len=2, pred_len=2,
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    store = ItemVideoStore(cfg, data)
    # internal id of token 'i1'
    iid = list(data.id2token["item_id"]).index("i1")
    out = store.batch([iid, 0])  # item with frames + pad item (no video)
    assert out.shape == (2, 2 * 4 * 4, 3 * 2 * 4 * 4)  # grid_t=2, 4x4, dim 96

    frames = np.stack([
        np.asarray(
            Image.open(p).convert("RGB").resize(
                (16, 16), Image.Resampling.BICUBIC), np.float32
        ).transpose(2, 0, 1)
        for p in frame_paths
    ])
    ref, grid = patchify_video(frames, patch_size=4, temporal_patch_size=2,
                               merge_size=2)
    assert grid == (2, 4, 4)
    np.testing.assert_allclose(out[0], ref, atol=1e-6)
    # pad item: black frames — every patch identical (channelwise-constant
    # normalized black)
    assert np.allclose(out[1], out[1][0])


@pytest.mark.slow
def test_hllm_use_video_end_to_end(synth_dir, tmp_path_factory, tmp_path):
    """Full use_video run (ADVICE r4: the pipeline integration, not just
    building blocks): tiny qwen2-vl tower with grid_t=2 temporal groups,
    frame-directory videos for a subset of items, black fallback for the
    rest; one fit + evaluate through the standard loop."""
    from PIL import Image

    ckpt = str(tmp_path / "qwen2vl")
    _write_tiny_qwen2vl_ckpt(ckpt)
    video_dir = tmp_path / "videos"
    ds_dir = video_dir / synth_dir["name"]
    rng = np.random.default_rng(5)
    for i in range(0, 12):  # frame dirs for a subset of items
        d = ds_dir / f"i{i}"
        d.mkdir(parents=True)
        for t in range(4):
            Image.fromarray(
                rng.integers(0, 255, (20, 20, 3), np.uint8), "RGB"
            ).save(d / f"f{t:02d}.jpg")

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=synth_dir["data_path"],
            dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            model="HLLM",
            dummy_llm=False,
            item_pretrain_dir=ckpt,
            user_pretrain_dir=ckpt,
            use_video=True,
            video_dir=str(video_dir),
            video_nframes=4,
            img_height=16, img_width=16,  # grid_t=2 x 4x4 -> 8 video tokens
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=16,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("hllm_vid")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    n_pos = b["pos_tokens"].shape[0]
    # grid_t*gh*gw = 2*4*4 = 32 patches of dim 3*2*4*4 = 96
    assert b["pos_pixel_patches"].shape == (n_pos, 32, 96)
    # video span: [vision_start][pad x 8][vision_end] at the head of each row
    assert (b["pos_tokens"][:, 1:9] == b["pos_tokens"][0, 1]).all()
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]
