"""Multi-device (8 virtual CPU devices): sharded train step, ZeRO optimizer
state sharding, single↔multi device numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.parallel.mesh import make_mesh, shard_batch, zero_sharded_opt_state
from mhrec_tpu.trainer import Trainer
from tests.conftest import make_config


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _make_trainer(synth_dir, tmp_path_factory, mesh_devices, tag):
    cfg = make_config(
        synth_dir, train_batch_size=16, total_iters=5,
        checkpoint_dir=str(tmp_path_factory.mktemp(f"ckpt_{tag}")),
        shard_optimizer_state=True,
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.mesh = make_mesh(mesh_devices)
    t.setup_model()
    return cfg, data, t, train


def test_multi_device_step_runs(synth_dir, tmp_path_factory, devices):
    cfg, data, t, train = _make_trainer(synth_dir, tmp_path_factory, devices[:8], "m8")
    b = next(iter(train.epoch_batches(0)))
    batch = shard_batch(t.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    t.state, out = t._jit_train_step(t.state, batch)
    assert np.isfinite(float(out["loss"]))


def test_single_vs_multi_device_parity(synth_dir, tmp_path_factory, devices):
    """One train step must produce (nearly) identical loss and params on a
    1-device and an 8-device mesh."""
    cfg1, data1, t1, train1 = _make_trainer(synth_dir, tmp_path_factory, devices[:1], "s1")
    cfg8, data8, t8, train8 = _make_trainer(synth_dir, tmp_path_factory, devices[:8], "s8")
    b = next(iter(train1.epoch_batches(0)))
    batch1 = shard_batch(t1.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    batch8 = shard_batch(t8.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    t1.state, out1 = t1._jit_train_step(t1.state, batch1)
    t8.state, out8 = t8._jit_train_step(t8.state, batch8)
    np.testing.assert_allclose(float(out1["loss"]), float(out8["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(t1.state.params)
    l8 = jax.tree.leaves(t8.state.params)
    for a, b_ in zip(l1, l8):
        # Adam divides by sqrt(v)+eps: near-zero gradients amplify f32
        # reduction-order differences between 1- and 8-way partitions
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=5e-3)


def test_zero_opt_state_sharded(synth_dir, tmp_path_factory, devices):
    cfg, data, t, train = _make_trainer(synth_dir, tmp_path_factory, devices[:8], "z8")
    shardings = zero_sharded_opt_state(t.mesh, t.state.opt_state)
    # at least one large leaf is sharded over the data axis
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(any(p == "data" for p in spec) for spec in specs if len(spec))


def test_eval_multi_host_striding_parity(synth_dir, tmp_path_factory, devices):
    """Metrics from 1-host eval equal merged metrics from 4 simulated hosts."""
    from mhrec_tpu.data.evalset import SeqEvalBatcher

    cfg = make_config(synth_dir, train_batch_size=16, total_iters=2,
                      checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_ev")))
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    res_single = t.evaluate(test, load_best_model=False)

    # simulate 4 hosts: each evaluates its stride; collectors accumulate
    from mhrec_tpu.evaluator import Collector, Evaluator

    t2 = Trainer(cfg, data)
    t2.state = t.state
    total_val = {}
    P = cfg["metrics_pred_len_list"][-1]
    vals = []
    for host in range(4):
        t_host = Trainer(cfg, data)
        t_host.state = t.state
        batcher = SeqEvalBatcher(cfg, data, phase="test", host_id=host, num_hosts=4)
        res = t_host.evaluate(batcher, load_best_model=False)
        # un-normalize: multiply back by the global denominator
        vals.append(res[f"pred_{P}"]["recall@10"] * len(batcher))
    merged = sum(vals) / len(test)
    np.testing.assert_allclose(
        merged, res_single[f"pred_{P}"]["recall@10"], rtol=1e-5, atol=1e-7
    )


def test_sharded_item_embedding(synth_dir, tmp_path_factory, devices):
    """Row-sharded item table: placement, one train step, loss parity with
    the replicated table."""
    from jax.sharding import PartitionSpec

    cfg_r = make_config(
        synth_dir, train_batch_size=16, total_iters=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("emb_r")),
    )
    cfg_s = make_config(
        synth_dir, train_batch_size=16, total_iters=2,
        shard_item_embedding=True,
        checkpoint_dir=str(tmp_path_factory.mktemp("emb_s")),
    )
    data = InteractionData(cfg_r).build()
    train, _, _ = build_dataloader(cfg_r, data)
    tr = Trainer(cfg_r, data)
    tr.mesh = make_mesh(devices[:8])
    tr.setup_model()
    ts = Trainer(cfg_s, data)
    ts.mesh = make_mesh(devices[:8])
    ts.setup_model()

    emb = ts.state.params["item_embedding"]["embedding"]
    assert emb.sharding.spec == PartitionSpec("data", None)
    # table rows padded to a multiple of the mesh size
    assert emb.shape[0] % 8 == 0 and emb.shape[0] >= data.item_num
    b = next(iter(train.epoch_batches(0)))
    batch_r = shard_batch(tr.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    batch_s = shard_batch(ts.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    tr.state, out_r = tr._jit_train_step(tr.state, batch_r)
    ts.state, out_s = ts._jit_train_step(ts.state, batch_s)
    assert np.isfinite(float(out_s["loss"]))
    # losses are in the same ballpark despite the different init row layout
    np.testing.assert_allclose(float(out_r["loss"]), float(out_s["loss"]), rtol=0.2)
    # table stays sharded after the update
    emb2 = ts.state.params["item_embedding"]["embedding"]
    assert emb2.sharding.spec == PartitionSpec("data", None)
    # eval works on the sharded table
    _, _, test = build_dataloader(cfg_s, data)
    res = ts.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg_s['eval_pred_len'] - 1}"]


@pytest.mark.slow
def test_tensor_parallel_hllm_towers(synth_dir, tmp_path_factory, devices, tmp_path):
    """tp_size=4 on a (2, 4) ('data','model') mesh: tower projection kernels
    shard over 'model' (Megatron column/row parallel via GSPMD), GQA kv
    projections fall back to replication (kv=2 < tp=4), one train step +
    eval run end to end."""
    import os

    from mhrec_tpu.config import Config

    sys_path_fix = os.path.join(os.path.dirname(__file__))
    import sys

    if sys_path_fix not in sys.path:
        sys.path.insert(0, sys_path_fix)
    from test_hllm import _write_tiny_llama_ckpt

    ckpt = str(tmp_path / "tiny_llama_tp")
    os.makedirs(ckpt)
    _write_tiny_llama_ckpt(ckpt)

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
            tp_size=4,
            MAX_ITEM_LIST_LENGTH=4,
            MAX_TEXT_LENGTH=12,
            train_batch_size=8,
            eval_batch_size=8,
            num_negatives=8,
            tag_version="v1",
            eval_pred_len=2, pred_len=2,
            topk=[5, 10],
            total_iters=2, eval_interval=100,
            checkpoint_dir=str(tmp_path_factory.mktemp("tp")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    assert t.mesh.shape == {"data": 2, "model": 4}
    t.setup_model()

    # column-parallel: q_proj kernel [D, h, dh] sharded over heads
    qk = t.state.params["item_llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    # row-parallel: down_proj kernel [I, D] sharded on the input dim
    dk = t.state.params["item_llm"]["layers_0"]["mlp"]["down_proj"]["kernel"]
    assert "model" in str(dk.sharding.spec)
    # GQA kv heads (2) don't divide tp (4) -> replicated fallback
    kk = t.state.params["item_llm"]["layers_0"]["self_attn"]["k_proj"]["kernel"]
    assert "model" not in str(kk.sharding.spec)

    stats = t.fit(train, None)
    assert stats["iters"] == 2
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_fsdp_param_sharding_matches_replicated(synth_dir, tmp_path_factory, devices, tmp_path):
    """ZeRO-3 / FSDP (reference DeepSpeed stage 3, trainer.py:439-446): with
    ``fsdp: true`` every large tower parameter (and its Adam state) shards
    over the data axis; the train-step math must be identical to the
    replicated run."""
    import os
    import sys

    from mhrec_tpu.config import Config

    sys_path_fix = os.path.dirname(__file__)
    if sys_path_fix not in sys.path:
        sys.path.insert(0, sys_path_fix)
    from test_hllm import _write_tiny_llama_ckpt

    ckpt = str(tmp_path / "tiny_llama_fsdp")
    os.makedirs(ckpt)
    _write_tiny_llama_ckpt(ckpt)

    def run(fsdp):
        cfg = Config(
            config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
            config_dict=dict(
                data_path=synth_dir["data_path"],
                dataset=synth_dir["name"],
                text_path=synth_dir["text_path"],
                model="HLLM", dummy_llm=False,
                item_pretrain_dir=ckpt, user_pretrain_dir=ckpt,
                fsdp=fsdp, fsdp_min_size=256,   # tiny towers: shard everything
                MAX_ITEM_LIST_LENGTH=4, MAX_TEXT_LENGTH=12,
                train_batch_size=8, eval_batch_size=8, num_negatives=8,
                tag_version="v1", eval_pred_len=2, pred_len=2, topk=[5],
                total_iters=2, eval_interval=100, update_interval=1,
                show_progress=False,
                # random-init-ish tiny towers: near-identical item embs trip
                # the cos>0.99 false-negative mask; disable it
                nce_thres=1.1,
                # fp32 towers: loss parity must be tight — bf16 accumulation
                # differs with the weight partitioning and would mask bugs
                precision="32",
                checkpoint_dir=str(tmp_path_factory.mktemp("fsdp")),
            ),
        ).finalize()
        data = InteractionData(cfg).build()
        train, _, _ = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        if fsdp:
            qk = t.state.params["item_llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
            assert "data" in str(qk.sharding.spec), qk.sharding.spec
            emb = t.state.params["item_llm"]["embed_tokens"]["embedding"]
            assert "data" in str(emb.sharding.spec), emb.sharding.spec
            # Adam state inherits the sharding (stage-3: 1/N params AND opt
            # state per device)
            import jax

            mu_leaves = [
                x for x in jax.tree.leaves(t.state.opt_state)
                if getattr(x, "ndim", 0) >= 2 and x.shape == qk.shape
            ]
            assert any("data" in str(x.sharding.spec) for x in mu_leaves)
        stats = t.fit(train, None)
        return stats["loss"]

    l_rep = run(False)
    l_fsdp = run(True)
    np.testing.assert_allclose(l_fsdp, l_rep, rtol=2e-5)
