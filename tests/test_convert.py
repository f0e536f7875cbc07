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
