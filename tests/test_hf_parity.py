"""Numerical parity of the flax backbones against Hugging Face torch
implementations (the reference's towers are patched copies of these HF
classes, so matching HF hidden states = matching the reference's math).

All runs are fp32 CPU at tiny shapes; tolerances cover op-order noise.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mhrec_tpu.models.llm.config import LLMConfig
from mhrec_tpu.models.llm.llama import LlamaBackbone
from mhrec_tpu.models.llm.loader import load_llama_params


def _tiny_hf_llama(vocab=64, hidden=32, layers=2, heads=4, kv=2):
    from transformers import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, rms_norm_eps=1e-5, max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    return LlamaModel(cfg).eval(), cfg


def _save_hf(model, cfg, dirpath, model_type="llama", extra_cfg=None):
    os.makedirs(dirpath, exist_ok=True)
    sd = {f"model.{k}": v for k, v in model.state_dict().items()}
    torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    raw = {
        "model_type": model_type, "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": getattr(cfg, "rope_theta", 10000.0),
    }
    raw.update(extra_cfg or {})
    with open(os.path.join(dirpath, "config.json"), "w") as fh:
        json.dump(raw, fh)


def test_llama_backbone_matches_hf(tmp_path):
    """Same weights, same input → same last hidden state as HF LlamaModel
    (causal mask, RoPE, GQA, SwiGLU all line up)."""
    hf, cfg = _tiny_hf_llama()
    d = str(tmp_path / "llama")
    _save_hf(hf, cfg, d)

    lcfg = LLMConfig.from_pretrained_dir(d)
    params = load_llama_params(d, lcfg)
    model = LlamaBackbone(lcfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (3, 10))
    mask = np.ones((3, 10), np.int64)
    mask[1, 7:] = 0  # ragged row

    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(
        model.apply(
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        )
    )
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], rtol=2e-4, atol=2e-4)


def test_llama_backbone_qkv_bias_matches_hf_qwen2_style(tmp_path):
    """attention_bias=True path (qwen2) against HF LlamaConfig with bias."""
    from transformers import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        vocab_size=48, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-5, attention_bias=True, attn_implementation="eager",
    )
    torch.manual_seed(5)
    hf = LlamaModel(cfg).eval()
    # give the biases non-zero values
    with torch.no_grad():
        for layer in hf.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.05)
    d = str(tmp_path / "qwen2ish")
    _save_hf(hf, cfg, d, extra_cfg={"attention_bias": True})

    lcfg = LLMConfig.from_pretrained_dir(d)
    assert lcfg.attention_bias
    params = load_llama_params(d, lcfg)
    model = LlamaBackbone(lcfg, dtype=jnp.float32)
    ids = np.arange(1, 9)[None, :]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    out = np.asarray(
        model.apply({"params": params}, input_ids=jnp.asarray(ids))
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_bert_backbone_matches_hf(tmp_path):
    """Same weights (incl. token-type-0 folding and fused qkv stacking) →
    same hidden states as HF BertModel."""
    from transformers import BertConfig, BertModel

    from mhrec_tpu.models.llm.bert import BertBackbone
    from mhrec_tpu.models.llm.loader import load_bert_params

    cfg = BertConfig(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=64, type_vocab_size=2,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    hf = BertModel(cfg, add_pooling_layer=False).eval()
    d = str(tmp_path / "bert")
    os.makedirs(d)
    torch.save(hf.state_dict(), os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as fh:
        json.dump(
            {
                "model_type": "bert", "vocab_size": cfg.vocab_size,
                "hidden_size": cfg.hidden_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "num_attention_heads": cfg.num_attention_heads,
                "intermediate_size": cfg.intermediate_size,
                "max_position_embeddings": cfg.max_position_embeddings,
                "type_vocab_size": cfg.type_vocab_size,
                "layer_norm_eps": cfg.layer_norm_eps,
                "hidden_act": cfg.hidden_act,
            },
            fh,
        )

    lcfg = LLMConfig.from_pretrained_dir(d)
    assert lcfg.rms_norm_eps == cfg.layer_norm_eps
    params = load_bert_params(d, lcfg)
    model = BertBackbone(lcfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    out = np.asarray(
        model.apply(
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        )
    )
    keep = mask.astype(bool)
    np.testing.assert_allclose(out[keep], ref[keep], rtol=3e-4, atol=3e-4)


def test_qwen2vl_vision_tower_matches_hf():
    """Our VisionTower vs HF Qwen2VisionTransformerPretrainedModel on the
    same random weights and a fixed 2×(4×4) grid."""
    try:
        from transformers.models.qwen2_vl.modeling_qwen2_vl import (
            Qwen2VisionTransformerPretrainedModel,
        )
        from transformers.models.qwen2_vl.configuration_qwen2_vl import (
            Qwen2VLVisionConfig,
        )
    except ImportError:
        pytest.skip("transformers lacks qwen2_vl")

    from mhrec_tpu.models.llm.vision import (
        VisionConfig, VisionTower, load_vision_params,
    )

    vps, vdim, vdepth = 4, 16, 2
    hf_cfg = Qwen2VLVisionConfig(
        depth=vdepth, embed_dim=vdim, hidden_size=24, num_heads=4,
        mlp_ratio=2, patch_size=vps, temporal_patch_size=2,
        spatial_merge_size=2, in_channels=3,
    )
    torch.manual_seed(9)
    hf = Qwen2VisionTransformerPretrainedModel(hf_cfg).float().eval()
    sd = {f"visual.{k}": v.numpy() for k, v in hf.state_dict().items()}

    vcfg = VisionConfig(
        embed_dim=vdim, depth=vdepth, num_heads=4, mlp_ratio=2,
        patch_size=vps, temporal_patch_size=2, spatial_merge_size=2,
        hidden_size=24, hidden_act="quick_gelu",
    )
    params = load_vision_params(sd, vcfg)
    grid = 4
    n_patches = grid * grid
    rng = np.random.default_rng(2)
    # two images
    patches = rng.normal(size=(2, n_patches, vcfg.patch_dim)).astype(np.float32)

    with torch.no_grad():
        flat = torch.tensor(patches.reshape(-1, vcfg.patch_dim))
        grid_thw = torch.tensor([[1, grid, grid], [1, grid, grid]])
        ref = hf(flat, grid_thw=grid_thw).numpy()  # [2*4, 24]

    tower = VisionTower(vcfg, grid_h=grid, grid_w=grid, dtype=jnp.float32)
    out = np.asarray(tower.apply({"params": params}, jnp.asarray(patches)))
    np.testing.assert_allclose(
        out.reshape(-1, 24), ref, rtol=3e-4, atol=3e-4
    )


def test_clip_vision_tower_matches_hf():
    """ClipVisionTower vs HF CLIPVisionModel: penultimate-layer hidden
    states (LLaVA vision_feature_layer=-2, CLS dropped) + projector."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from mhrec_tpu.models.llm.vision import (
        ClipVisionTower, VisionConfig, load_clip_vision_params,
    )

    vdim, vdepth, vps, img = 16, 3, 4, 16
    hf_cfg = CLIPVisionConfig(
        hidden_size=vdim, num_hidden_layers=vdepth, num_attention_heads=4,
        intermediate_size=vdim * 2, image_size=img, patch_size=vps,
        hidden_act="quick_gelu", attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = {f"vision_tower.{k}": v.numpy() for k, v in hf.state_dict().items()}
    # random projector
    rng = np.random.default_rng(3)
    out_dim = 24
    w1 = rng.normal(size=(out_dim, vdim)).astype(np.float32) * 0.05
    b1 = np.zeros(out_dim, np.float32)
    w2 = rng.normal(size=(out_dim, out_dim)).astype(np.float32) * 0.05
    b2 = np.zeros(out_dim, np.float32)
    sd["multi_modal_projector.linear_1.weight"] = w1
    sd["multi_modal_projector.linear_1.bias"] = b1
    sd["multi_modal_projector.linear_2.weight"] = w2
    sd["multi_modal_projector.linear_2.bias"] = b2

    vcfg = VisionConfig(
        arch="clip", embed_dim=vdim, depth=vdepth, num_heads=4,
        intermediate_size=vdim * 2, patch_size=vps, temporal_patch_size=1,
        spatial_merge_size=1, hidden_size=out_dim, hidden_act="quick_gelu",
        layer_norm_eps=hf_cfg.layer_norm_eps,
    )
    params = load_clip_vision_params(sd, vcfg)

    pixels = rng.normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        hs = hf(torch.tensor(pixels), output_hidden_states=True).hidden_states
        feats = hs[-2][:, 1:].numpy()            # drop CLS
        ref = np.tanh(0)  # noqa - placeholder
        h = feats @ w1.T + b1
        # HF llava projector uses exact gelu by default config (gelu)
        from scipy.special import erf

        h = h * 0.5 * (1.0 + erf(h / np.sqrt(2.0)))
        ref = h @ w2.T + b2

    # our patchifier flattens [c, ps, ps] per patch row-major — equal to the
    # HF conv over the same pixels
    from mhrec_tpu.data.vision import ImagePreprocessor

    prep = ImagePreprocessor(img, img, patch_size=vps, temporal_patch_size=1,
                             spatial_merge_size=1)
    patches = np.stack([prep._patchify(p) for p in pixels])
    tower = ClipVisionTower(vcfg, grid_h=img // vps, grid_w=img // vps,
                            dtype=jnp.float32)
    out = np.asarray(tower.apply({"params": params}, jnp.asarray(patches)))
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize(
    "scaling",
    [
        {"rope_type": "linear", "factor": 2.0},
        {"rope_type": "dynamic", "factor": 2.0,
         "original_max_position_embeddings": 2048},
        {"rope_type": "yarn", "factor": 4.0,
         "original_max_position_embeddings": 2048},
        {"rope_type": "yarn", "factor": 4.0, "beta_fast": 16.0,
         "beta_slow": 2.0, "attention_factor": 1.3,
         "original_max_position_embeddings": 1024},
    ],
)
def test_rope_scaling_matches_hf(scaling, tmp_path):
    """linear / dynamic-NTK / yarn inverse frequencies and attention scaling
    must match transformers' ROPE_INIT_FUNCTIONS (the reference vendors the
    same module as modeling_rope_utils.py)."""
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from mhrec_tpu.models.llm.llama import rope_parameters

    hf_cfg = LlamaConfig(
        hidden_size=256, num_attention_heads=4,
        max_position_embeddings=4096, rope_theta=10000.0,
        rope_scaling=dict(scaling),
    )
    fn = ROPE_INIT_FUNCTIONS[scaling["rope_type"]]
    hf_inv, hf_att = fn(hf_cfg, device="cpu")

    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(dict(
        model_type="llama", vocab_size=128, hidden_size=256,
        intermediate_size=512, num_hidden_layers=1, num_attention_heads=4,
        max_position_embeddings=4096, rope_theta=10000.0,
        rope_scaling=dict(scaling),
    )))
    cfg = LLMConfig.from_pretrained_dir(str(d))
    inv, att = rope_parameters(cfg, head_dim=64)
    np.testing.assert_allclose(
        np.asarray(inv), hf_inv.numpy(), rtol=1e-6,
        err_msg=f"inv_freq mismatch for {scaling}",
    )
    assert att == pytest.approx(float(hf_att), rel=1e-6)


def test_sliding_window_dense_mask():
    """Mistral sliding-window attention (reference modeling_mistral.py:752):
    token i must ignore keys older than i - sliding_window. Verified by
    perturbing an out-of-window key and checking the query's output is
    bit-unchanged, while an in-window perturbation changes it."""
    cfg = LLMConfig.tiny()
    cfg = type(cfg)(**{**cfg.__dict__, "model_type": "mistral",
                       "sliding_window": 3})
    model = LlamaBackbone(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    T = 8
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(1, T)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)["params"]

    emb = params["embed_tokens"]["embedding"]
    out0 = model.apply({"params": params}, input_ids=ids)

    def perturb(pos):
        p2 = dict(params)
        e2 = emb.at[int(ids[0, pos])].add(1.0)
        p2["embed_tokens"] = dict(params["embed_tokens"], embedding=e2)
        return model.apply({"params": p2}, input_ids=ids)

    # token 0 is outside token 7's window (7 - 0 >= 3) but inside token 2's
    out_p = perturb(0)
    np.testing.assert_array_equal(
        np.asarray(out_p[0, 7]), np.asarray(out0[0, 7])
    )
    assert np.abs(np.asarray(out_p[0, 2]) - np.asarray(out0[0, 2])).max() > 0


def test_sliding_window_packed_matches_manual():
    """Packed varlen + sliding window: the dense packed path must equal a
    hand-built causal ∧ same-segment ∧ band mask."""
    from mhrec_tpu.models.llm.packed import packed_attention_dense

    rng = np.random.default_rng(1)
    S, H, dh = 12, 2, 4
    q = jnp.asarray(rng.normal(size=(S, H, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(S, H, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(S, H, dh)).astype(np.float32))
    seg = jnp.asarray([1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 0, 0])
    sw = 3   # attend to the last 3 tokens → window = sw - 1 = 2
    out = packed_attention_dense(q, k, v, seg, window=sw - 1)

    idx = np.arange(S)
    mask = (
        (np.asarray(seg)[:, None] == np.asarray(seg)[None, :])
        & (np.asarray(seg) > 0)[None, :]
        & (idx[:, None] >= idx[None, :])
        & (idx[:, None] - idx[None, :] <= sw - 1)
    )
    scores = np.einsum("shd,thd->hst", q, k) / np.sqrt(dh)
    scores = np.where(mask[None], scores, np.finfo(np.float32).min)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    ref = np.einsum("hst,thd->shd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_qwen2vl_vision_tower_video_matches_hf():
    """Video input (grid_t=2, real temporal frame pairs): our VisionTower
    with tiled rotary tables vs HF on the same weights and patch stream."""
    try:
        from transformers.models.qwen2_vl.modeling_qwen2_vl import (
            Qwen2VisionTransformerPretrainedModel,
        )
        from transformers.models.qwen2_vl.configuration_qwen2_vl import (
            Qwen2VLVisionConfig,
        )
    except ImportError:
        pytest.skip("transformers lacks qwen2_vl")

    from mhrec_tpu.data.vision import patchify_video
    from mhrec_tpu.models.llm.vision import (
        VisionConfig, VisionTower, load_vision_params,
    )

    vps, vdim, vdepth = 4, 16, 2
    hf_cfg = Qwen2VLVisionConfig(
        depth=vdepth, embed_dim=vdim, hidden_size=24, num_heads=4,
        mlp_ratio=2, patch_size=vps, temporal_patch_size=2,
        spatial_merge_size=2, in_channels=3,
    )
    torch.manual_seed(11)
    hf = Qwen2VisionTransformerPretrainedModel(hf_cfg).float().eval()
    sd = {f"visual.{k}": v.numpy() for k, v in hf.state_dict().items()}
    vcfg = VisionConfig(
        embed_dim=vdim, depth=vdepth, num_heads=4, mlp_ratio=2,
        patch_size=vps, temporal_patch_size=2, spatial_merge_size=2,
        hidden_size=24, hidden_act="quick_gelu",
    )
    params = load_vision_params(sd, vcfg)

    # 4 frames of 16x16 → grid (2, 4, 4) via the REAL temporal-pair path
    rng = np.random.default_rng(7)
    frames = rng.uniform(0, 255, (4, 3, 16, 16)).astype(np.float32)
    patches, (gt, gh, gw) = patchify_video(
        frames, patch_size=vps, temporal_patch_size=2, merge_size=2)
    assert (gt, gh, gw) == (2, 4, 4)

    with torch.no_grad():
        ref = hf(torch.tensor(patches),
                 grid_thw=torch.tensor([[gt, gh, gw]])).numpy()

    tower = VisionTower(vcfg, grid_h=gh, grid_w=gw, dtype=jnp.float32,
                        grid_t=gt)
    out = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(patches[None])))
    np.testing.assert_allclose(
        out.reshape(-1, 24), ref, rtol=3e-4, atol=3e-4
    )


def test_alibi_slopes_match_transformers():
    """Per-head ALiBi slopes must match transformers' closest-power-of-two
    formula (bloom ``build_alibi_tensor``) for both power-of-two and ragged
    head counts (40 = Baichuan-13B)."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from mhrec_tpu.models.llm.llama import alibi_slopes

    for n_heads in (4, 8, 12, 40):
        mask = torch.ones(1, 5)
        alibi = build_alibi_tensor(mask, n_heads, torch.float32)
        # alibi[h, 0, j] = slope_h * j  →  read slopes off position 1
        ref = alibi.reshape(n_heads, 5)[:, 1].numpy()
        np.testing.assert_allclose(alibi_slopes(n_heads), ref, rtol=1e-6)


def test_alibi_backbone_matches_hf(tmp_path):
    """ALiBi backbone (Baichuan-13B topology) vs HF LlamaModel with RoPE
    neutralized (linear scaling factor 1e12 → rotation angles ~1e-11 ≈
    identity) and the same per-head causal+padding+ALiBi bias supplied as a
    4D additive attention mask (transformers passes 4D masks through
    verbatim). Same weights via the standard loader path."""
    from transformers import LlamaConfig, LlamaModel

    from mhrec_tpu.models.llm.llama import alibi_slopes

    heads, hidden = 4, 32
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=2, num_attention_heads=heads,
        num_key_value_heads=2, rms_norm_eps=1e-5,
        max_position_embeddings=128, attn_implementation="eager",
        rope_scaling={"rope_type": "linear", "factor": 1e12},
    )
    torch.manual_seed(7)
    hf = LlamaModel(cfg).eval()
    d = str(tmp_path / "alibi")
    _save_hf(hf, cfg, d, extra_cfg={"position_embedding_type": "alibi"})

    lcfg = LLMConfig.from_pretrained_dir(d)
    assert lcfg.alibi
    params = load_llama_params(d, lcfg)
    model = LlamaBackbone(lcfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    B, T = 3, 10
    ids = rng.integers(1, 64, (B, T))
    mask = np.ones((B, T), np.int64)
    mask[1, 7:] = 0  # ragged row

    # HF side: explicit [B, H, T, T] additive bias = causal+pad mask + alibi
    neg = np.finfo(np.float32).min
    idx = np.arange(T)
    keep = (idx[None, :, None] >= idx[None, None, :]) & mask[:, None, :].astype(bool)
    rel = (idx[None, :] - idx[:, None]).astype(np.float32)  # j - i
    bias = alibi_slopes(heads)[None, :, None, None] * rel[None, None]
    bias4 = np.where(keep[:, None], bias, neg).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(bias4),
        ).last_hidden_state.numpy()

    out = np.asarray(
        model.apply(
            {"params": params},
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
        )
    )
    kept = mask.astype(bool)
    np.testing.assert_allclose(out[kept], ref[kept], rtol=2e-4, atol=2e-4)


def test_alibi_packed_raises(tmp_path):
    """The packed-varlen path has no score-bias input — an alibi tower must
    fail loudly rather than silently drop the positional encoding."""
    cfg = LLMConfig.tiny()
    cfg = LLMConfig(**{**cfg.__dict__, "alibi": True})
    model = LlamaBackbone(cfg, dtype=jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    seg = jnp.asarray([1, 1, 1, 2, 2, 2, 0, 0])
    with pytest.raises(NotImplementedError, match="alibi"):
        model.init(jax.random.PRNGKey(0), input_ids=ids, segment_ids=seg)
