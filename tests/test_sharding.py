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
