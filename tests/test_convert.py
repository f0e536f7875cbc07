"""Reference-checkpoint converter (tools/convert_reference_ckpt.py).

Roundtrip oracle: ``tests/test_e2e_reference``'s our-init → torch copy
helpers are independently validated by the 120-step trajectory-parity
tests, so converting the torch model's ``state_dict`` BACK through the
converter must reproduce our original params bit-for-bit — a wrong
transpose or misrouted tensor in the converter cannot cancel against the
proven inverse.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

import jax

from mhrec_tpu.data import InteractionData
from mhrec_tpu.trainer import Trainer

from conftest import make_config
from test_reference_parity import REF, _import_reference_hstu  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")


def _prior_cfg(synth_dir, **over):
    base = dict(
        loss="prior", eval_num_cats=4, num_prior_head=4, num_segment_head=1,
        medusa_num_layers=1, head_interaction="multiplicative",
        split_mode="combine", prior_switch="in", prior_switch_loss_weight=1.0,
        neg_sample_by_cat=True, weighted_prior_loss=True,
        pred_len=2, total_iters=2, eval_interval=100, train_batch_size=8,
        sparse_item_adam=False,
    )
    base.update(over)
    return make_config(synth_dir, **base)


def _build_ref_model(ref_hstu, cfg, data):
    # the reference BaseModel touches torch.distributed unconditionally
    # (basemodel.py:15) — world-1 gloo group as a single-GPU launch would have
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29735", world_size=1, rank=0
        )
    from test_e2e_reference import RefConfig

    C = cfg["eval_num_cats"]
    refcfg = RefConfig(
        item_embedding_size=cfg["item_embedding_size"],
        hstu_embedding_size=cfg["hstu_embedding_size"],
        MAX_ITEM_LIST_LENGTH=cfg["MAX_ITEM_LIST_LENGTH"],
        pred_len=cfg["pred_len"],
        medusa_lambda=cfg["medusa_lambda"],
        num_segment_head=cfg["num_segment_head"], num_prior_head=C,
        head_interaction="multiplicative", medusa_num_layers=1,
        category_by="item",
        n_layers=cfg["n_layers"], n_heads=cfg["n_heads"],
        hidden_act="silu", hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
        loss="prior", neg_sample_by_cat=True, pos_sample_mix_ratio=0.0,
        fix_temp=None, nce_thres=cfg["nce_thres"],
        prior_switch="in", prior_switch_loss_weight=1.0,
        split_mode="combine", weighted_prior_loss=True,
        int_to_category=[str(i) for i in range(C)],
        use_prior_switch_test=False,
        eval_pred_len=cfg["eval_pred_len"],
        enable_relative_attention_bias=True,
    )

    class DL:
        item_num = data.item_num
        category_counts = data.category_counts
        category_to_int = data.category_to_int

    torch.manual_seed(0)
    return ref_hstu.HSTU(refcfg, DL()).float()


def test_state_dict_roundtrip(synth_dir):
    ref_hstu = _import_reference_hstu()
    from test_e2e_reference import (
        _copy_head_params_to_torch, _copy_params_to_torch,
    )

    from convert_reference_ckpt import convert_hstu

    cfg = _prior_cfg(synth_dir)
    data = InteractionData(cfg).build()
    t = Trainer(cfg, data)
    t.setup_model()
    params0 = jax.tree.map(np.asarray, t.state.params)

    ref = _build_ref_model(ref_hstu, cfg, data)
    _copy_params_to_torch(t.state.params, ref)
    _copy_head_params_to_torch(t.state.params, ref, cfg, "multiplicative")

    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    new_params, used, missing, unused = convert_hstu(sd, t.state.params, cfg)

    assert not missing, f"converter expected tensors absent in ref: {missing}"
    # every proven-inverse-copied leaf must round-trip bit-for-bit
    for path in (
        ("item_embedding", "embedding"),
        ("position_embedding", "embedding"),
        ("logit_scale",),
        ("stu_0", "uvqk"),
        ("stu_0", "o_proj", "kernel"),
        ("stu_0", "o_proj", "bias"),
        ("medusa_head_0", "res_0", "Dense_0", "kernel"),
        ("medusa_head_3", "res_0", "Dense_0", "bias"),
        ("aux_cat_head_0", "kernel"),
        ("aux_cat_head_3", "bias"),
    ):
        a, b = params0, new_params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=".".join(path))
    # components outside the e2e inverse (direct-layout): rel bias
    np.testing.assert_array_equal(
        new_params["rel_bias_0"]["ts_w"],
        sd["_hstu._attention_layers.0._rel_attn_bias._ts_w"])
    np.testing.assert_array_equal(
        new_params["rel_bias_0"]["pos_w"],
        sd["_hstu._attention_layers.0._rel_attn_bias._pos_w"])


def test_val_only_on_converted_checkpoint(synth_dir, tmp_path):
    """VERDICT r3 #3 'done' bar: a torch-format reference checkpoint
    converts and `val_only` evaluates from it through the CLI loop."""
    ref_hstu = _import_reference_hstu()

    import convert_reference_ckpt as crc

    cfg = _prior_cfg(synth_dir, checkpoint_dir=str(tmp_path / "saved"))
    data = InteractionData(cfg).build()
    ref = _build_ref_model(ref_hstu, cfg, data)
    ckpt_path = tmp_path / "full_model_fp32.pt"
    # the consolidated-fp32 form incl. a DeepSpeed-style wrapper prefix
    torch.save({"module": {f"_forward_module.{k}": v
                           for k, v in ref.state_dict().items()}},
               str(ckpt_path))

    common = [
        "--data_path", synth_dir["data_path"], "--dataset", synth_dir["name"],
        "--text_path", synth_dir["text_path"],
        "--MAX_ITEM_LIST_LENGTH", "20", "--train_batch_size", "8",
        "--eval_batch_size", "32", "--num_negatives", "256",
        "--tag_version", "v1", "--n_layers", "2", "--n_heads", "2",
        "--item_embedding_size", "32", "--hstu_embedding_size", "32",
        "--eval_pred_len", "4", "--pred_len", "2", "--topk", "[5,10,50]",
        "--total_iters", "2", "--eval_interval", "100",
        "--loss", "prior", "--eval_num_cats", "4", "--num_prior_head", "4",
        "--num_segment_head", "1", "--head_interaction", "multiplicative",
        "--medusa_num_layers", "1", "--prior_switch", "in",
        "--prior_switch_loss_weight", "1.0", "--neg_sample_by_cat", "True",
        "--weighted_prior_loss", "True",
        "--checkpoint_dir", str(tmp_path / "saved"),
    ]
    files = ["IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml"]
    crc.main(["--ckpt", str(ckpt_path), "--config_file", *files, "--", *common])

    from mhrec_tpu.run import run_loop

    result = run_loop(files, common + ["--val_only", "True"])
    key = f"pred_{cfg['eval_pred_len'] - 1}"
    assert key in result and any("recall" in m for m in result[key])


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #4): HLLM + trunk-nested baseline conversion
# ---------------------------------------------------------------------------


def test_hllm_convert_towers_and_heads(synth_dir, tmp_path, tmp_path_factory):
    """HLLM full-model state_dict (reference hllm.py:69-252 surface:
    ``item_llm.*``/``user_llm.*`` HF tower weights + item_emb_tokens +
    logit_scale + medusa/aux heads) → our flax tree. The tower mapping must
    equal the HF-dir loader bit-for-bit (whose forward parity vs HF
    transformers is proven in tests/test_hf_parity.py), and head tensors
    must land transposed in their slots."""
    import jax

    from test_hllm import _hllm_config, _write_tiny_llama_ckpt

    from convert_reference_ckpt import convert_hllm

    ckpt_dir = str(tmp_path / "tiny_llama")
    os.makedirs(ckpt_dir)
    _write_tiny_llama_ckpt(ckpt_dir)
    cfg = _hllm_config(
        synth_dir, tmp_path_factory,
        dummy_llm=False, item_pretrain_dir=ckpt_dir, user_pretrain_dir=ckpt_dir,
        loss="prior", eval_num_cats=4, num_prior_head=4, num_segment_head=1,
        medusa_num_layers=1, head_interaction="multiplicative",
        prior_switch="in", prior_switch_loss_weight=0.1,
    )
    data = InteractionData(cfg).build()
    t = Trainer(cfg, data)
    t.setup_model()
    params0 = jax.tree.map(np.asarray, t.state.params)

    tower_sd = {
        k: v.numpy().astype(np.float32)
        for k, v in torch.load(os.path.join(ckpt_dir, "pytorch_model.bin"),
                               weights_only=True).items()
    }
    rng = np.random.default_rng(0)
    sd = {}
    for name in ("item_llm", "user_llm"):
        for k, v in tower_sd.items():
            sd[f"{name}.{k}"] = v
    sd["item_emb_tokens"] = rng.normal(
        size=np.shape(params0["item_emb_tokens"])).astype(np.float32)
    sd["logit_scale"] = np.float32(0.5)
    h = 0
    while f"medusa_head_{h}" in params0:
        head = params0[f"medusa_head_{h}"]
        j = 0
        while f"res_{j}" in head:
            k = head[f"res_{j}"]["Dense_0"]["kernel"]
            sd[f"medusa_head.{h}.{j}.linear.weight"] = rng.normal(
                size=k.T.shape).astype(np.float32)
            sd[f"medusa_head.{h}.{j}.linear.bias"] = rng.normal(
                size=head[f"res_{j}"]["Dense_0"]["bias"].shape).astype(np.float32)
            if "LayerNorm_0" in head[f"res_{j}"]:
                D = head[f"res_{j}"]["LayerNorm_0"]["scale"].shape
                sd[f"medusa_head.{h}.{j}.norm.weight"] = rng.normal(size=D).astype(np.float32)
                sd[f"medusa_head.{h}.{j}.norm.bias"] = rng.normal(size=D).astype(np.float32)
            j += 1
        h += 1
    c = 0
    while f"aux_cat_head_{c}" in params0:
        k = params0[f"aux_cat_head_{c}"]["kernel"]
        sd[f"aux_cat_head.{c}.weight"] = rng.normal(size=k.T.shape).astype(np.float32)
        sd[f"aux_cat_head.{c}.bias"] = rng.normal(
            size=params0[f"aux_cat_head_{c}"]["bias"].shape).astype(np.float32)
        c += 1
    assert h > 0 and c > 0  # the config actually built heads to convert

    new_params, used, missing, unused = convert_hllm(sd, t.state.params, cfg)
    assert not missing, f"expected tensors absent: {missing}"

    # towers == the independently HF-parity-proven dir loader, bit for bit
    from mhrec_tpu.models.llm.config import LLMConfig
    from mhrec_tpu.models.llm.loader import load_llama_params

    loader_tree = load_llama_params(ckpt_dir, LLMConfig.from_pretrained_dir(ckpt_dir))
    for tower in ("item_llm", "user_llm"):
        flat_a = jax.tree.leaves_with_path(loader_tree)
        flat_b = dict(jax.tree.leaves_with_path(new_params[tower]))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=f"{tower}{jax.tree_util.keystr(path)}")

    np.testing.assert_array_equal(new_params["item_emb_tokens"], sd["item_emb_tokens"])
    np.testing.assert_array_equal(new_params["logit_scale"], sd["logit_scale"])
    np.testing.assert_array_equal(
        new_params["medusa_head_0"]["res_0"]["Dense_0"]["kernel"],
        sd["medusa_head.0.0.linear.weight"].T)
    np.testing.assert_array_equal(
        new_params["aux_cat_head_3"]["kernel"], sd["aux_cat_head.3.weight"].T)
    np.testing.assert_array_equal(
        new_params["aux_cat_head_0"]["bias"], sd["aux_cat_head.0.bias"])


def test_hllm_val_only_on_converted_checkpoint(synth_dir, tmp_path,
                                               tmp_path_factory):
    """A reference-format HLLM full-model checkpoint converts and
    ``val_only`` evaluates from it through the CLI loop."""
    import convert_reference_ckpt as crc

    from test_hllm import _write_tiny_llama_ckpt

    ckpt_dir = str(tmp_path / "tiny_llama")
    os.makedirs(ckpt_dir)
    _write_tiny_llama_ckpt(ckpt_dir)
    tower_sd = {
        k: v.numpy().astype(np.float32)
        for k, v in torch.load(os.path.join(ckpt_dir, "pytorch_model.bin"),
                               weights_only=True).items()
    }
    rng = np.random.default_rng(1)
    sd = {}
    for name in ("item_llm", "user_llm"):
        for k, v in tower_sd.items():
            sd[f"{name}.{k}"] = torch.from_numpy(v)
    sd["item_emb_tokens"] = torch.from_numpy(
        rng.normal(size=(1, 1, 32)).astype(np.float32))
    sd["logit_scale"] = torch.tensor(np.float32(np.log(1 / 0.07)))
    for hh in range(2):
        sd[f"medusa_head.{hh}.0.linear.weight"] = torch.from_numpy(
            rng.normal(size=(32, 32)).astype(np.float32) * 0.05)
        sd[f"medusa_head.{hh}.0.linear.bias"] = torch.zeros(32)
    ckpt_path = tmp_path / "full_model_fp32.pt"
    torch.save({"module": {f"_forward_module.{k}": v for k, v in sd.items()}},
               str(ckpt_path))

    common = [
        "--data_path", synth_dir["data_path"], "--dataset", synth_dir["name"],
        "--text_path", synth_dir["text_path"],
        "--dummy_llm", "False",
        "--item_pretrain_dir", ckpt_dir, "--user_pretrain_dir", ckpt_dir,
        "--MAX_ITEM_LIST_LENGTH", "6", "--MAX_TEXT_LENGTH", "16",
        "--train_batch_size", "8", "--eval_batch_size", "16",
        "--num_negatives", "32", "--tag_version", "v1",
        "--eval_pred_len", "2", "--pred_len", "2", "--topk", "[5,10]",
        "--total_iters", "2", "--eval_interval", "100",
        "--medusa_num_layers", "1", "--num_segment_head", "2",
        "--num_prior_head", "1", "--head_interaction", "multiplicative",
        "--checkpoint_dir", str(tmp_path / "saved"),
    ]
    files = ["overall/LLM.yaml", "HLLM/HLLM.yaml"]
    crc.main(["--ckpt", str(ckpt_path), "--config_file", *files, "--", *common])

    from mhrec_tpu.run import run_loop

    result = run_loop(files, common + ["--val_only", "True"])
    assert any("recall" in m for m in result["pred_1"])


def test_comirec_convert_predict_parity(synth_dir):
    """Reference torch ComiRec (random init) → convert → our ComiRec
    produces IDENTICAL full-corpus predict scores (the VERDICT r4 #4 'done'
    bar for a trunk-nested baseline). Exercises item_id_proj_tower
    (item 16d → hstu 32d), the nested `_hstu` trunk, and the
    attention_net interest extractor."""
    import jax
    import jax.numpy as jnp

    _import_reference_hstu()  # sys.path + torch stubs
    from REC.model.IDNet import comirec as ref_comirec

    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29735", world_size=1, rank=0
        )
    from test_e2e_reference import RefConfig

    from convert_reference_ckpt import convert_comirec
    from mhrec_tpu.models.idnet.comirec import ComiRec, comirec_from_config

    L = 12
    refcfg = RefConfig(
        item_embedding_size=16, hstu_embedding_size=32,
        MAX_ITEM_LIST_LENGTH=L, pred_len=2, eval_pred_len=2,
        medusa_lambda=0.99, n_layers=2, n_heads=2, hidden_act="silu",
        hidden_dropout_prob=0.0, attn_dropout_prob=0.0, loss="nce",
        nce_thres=0.99, enable_relative_attention_bias=False,
    )

    class DL:
        item_num = 200

    torch.manual_seed(3)
    ref = ref_comirec.ComiRec(refcfg, DL()).float().eval()
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}

    ours = comirec_from_config(refcfg, DL())
    seq0 = jnp.ones((2, L), jnp.int32)
    params = ours.init(jax.random.PRNGKey(0), seq0,
                       method=ComiRec.predict_embeddings)["params"]
    conv, used, missing, unused = convert_comirec(sd, params, refcfg)
    assert not missing, f"expected tensors absent in reference sd: {missing}"

    rng = np.random.default_rng(7)
    item_seq = rng.integers(1, 200, size=(4, L)).astype(np.int64)
    item_seq[0, :5] = 0  # left padding
    item_seq[2, :9] = 0

    with torch.no_grad():
        all_feat = ref.compute_item_all()
        ref_scores, _, _, _ = ref.predict(
            torch.from_numpy(item_seq), None, all_feat, None, None)

    emb = ours.apply({"params": conv}, jnp.asarray(item_seq, jnp.int32),
                     method=ComiRec.predict_embeddings)
    feats = ours.apply({"params": conv}, method=ComiRec.compute_item_all)
    our_scores = np.einsum("bkd,id->bki", np.asarray(emb["head_embs"]),
                           np.asarray(feats))
    # item 0 is the pad row (zero vector; normalization of 0 is
    # implementation-defined) — eval masks it, compare the real items
    np.testing.assert_allclose(
        our_scores[:, :, 1:], ref_scores.numpy()[:, :, 1:], atol=2e-5)
