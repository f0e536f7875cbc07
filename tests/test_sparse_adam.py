"""Sparse (lazy) row-wise AdamW for the item-embedding table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.trainer import Trainer

from conftest import make_config


def _one_batch(cfg, data):
    train, _, _ = build_dataloader(cfg, data)
    return next(iter(train.epoch_batches(0))), train


def test_sparse_batch_remap(synth_dir):
    """unique_ids[0] == 0, remapped indices reconstruct the global ids."""
    cfg = make_config(synth_dir, sparse_item_adam=True)
    data = InteractionData(cfg).build()
    b, _ = _one_batch(cfg, data)
    assert b["unique_ids"][0] == 0
    n = int(b["unique_mask"].sum())
    uniq = b["unique_ids"][:n]
    assert (np.diff(uniq) > 0).all()  # sorted unique
    # remap round-trip
    dense_cfg = make_config(synth_dir, sparse_item_adam=False)
    db, _ = _one_batch(dense_cfg, data)
    np.testing.assert_array_equal(uniq[b["items"]], db["items"])
    np.testing.assert_array_equal(uniq[b["neg_items"]], db["neg_items"])
    # pad slots alias id 0
    assert (b["unique_ids"][n:] == 0).all()


def _config_for(synth_dir, model: str, **overrides):
    """Model-specific config (sparse_item_adam is model-agnostic: the
    trainer substitutes the gathered sub-table for the embedding param)."""
    files = {
        "HSTU": ["IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml"],
        "SASRec": ["IDNet/sasrec.yaml", "overall/ID.yaml"],
        "ComiRec": ["IDNet/comirec.yaml", "overall/ID.yaml"],
        "REMI": ["IDNet/remi.yaml", "overall/ID.yaml"],
        "DualVAE": ["IDNet/dualvae.yaml", "overall/ID.yaml"],
    }[model]
    from mhrec_tpu.config import Config

    base = dict(
        data_path=synth_dir["data_path"], dataset=synth_dir["name"],
        text_path=synth_dir["text_path"], MAX_ITEM_LIST_LENGTH=20,
        train_batch_size=8, eval_batch_size=32, num_negatives=64,
        tag_version="v1", n_layers=2, n_heads=2, item_embedding_size=32,
        hstu_embedding_size=32, embedding_size=32, eval_pred_len=4,
        pred_len=2 if model == "HSTU" else 1, topk=[5, 10], total_iters=2,
        eval_interval=100,
    )
    if model != "HSTU":
        base["model"] = model
    base.update(overrides)
    return Config(config_file_list=files, config_dict=base).finalize()


@pytest.mark.parametrize("model", ["HSTU", "SASRec", "ComiRec", "REMI", "DualVAE"])
def test_sparse_single_step_matches_dense(synth_dir, model):
    """With weight_decay=0, ONE sparse step == one dense AdamW step
    (untouched rows have zero moments in both; touched rows identical) —
    for EVERY IDNet family (reference FusedAdam universality,
    trainer.py:292-299)."""
    data = None
    states = {}
    for sparse in (False, True):
        cfg = _config_for(
            synth_dir, model, sparse_item_adam=sparse, total_iters=1,
            # SASRec draws per-position negatives; route them through the
            # batcher in BOTH runs so sparse and dense see identical draws
            batch_position_negatives=True,
            optim_args={"learning_rate": 1e-2, "weight_decay": 0.0},
        )
        if data is None:
            data = InteractionData(cfg).build()
        t = Trainer(cfg, data)
        t.setup_model(seed=7)
        b, _ = _one_batch(cfg, data)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        t.state, out = t._jit_train_step(t.state, batch)
        states[sparse] = (jax.device_get(t.state.params), float(out["loss"]))

    dense_params, dense_loss = states[False]
    sparse_params, sparse_loss = states[True]
    assert dense_loss == pytest.approx(sparse_loss, rel=1e-5)
    flat_d = jax.tree_util.tree_leaves_with_path(dense_params)
    flat_s = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(sparse_params)
    )
    for path, xd in flat_d:
        xs = flat_s[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(xd), np.asarray(xs), rtol=2e-4, atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("model", ["HSTU", "SASRec"])
def test_sparse_with_grad_accumulation_matches_dense(synth_dir, model):
    """accumulate_grad=2: two sparse micro-steps == two dense MultiSteps
    micro-steps (one optimizer update on the mean gradient; the sparse row
    update consumes the deduped union of both micro-batches' rows)."""
    data = None
    states = {}
    for sparse in (False, True):
        cfg = _config_for(
            synth_dir, model, sparse_item_adam=sparse, accumulate_grad=2,
            total_iters=1, batch_position_negatives=True,
            optim_args={"learning_rate": 1e-2, "weight_decay": 0.0},
        )
        if data is None:
            data = InteractionData(cfg).build()
        t = Trainer(cfg, data)
        t.setup_model(seed=7)
        _, train = _one_batch(cfg, data)
        it = iter(train.epoch_batches(0))
        for _ in range(2):
            batch = {k: jnp.asarray(v) for k, v in next(it).items()}
            t.state, out = t._jit_train_step(t.state, batch)
        states[sparse] = jax.device_get(t.state.params)

    flat_d = jax.tree_util.tree_leaves_with_path(states[False])
    flat_s = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(states[True])
    )
    for path, xd in flat_d:
        np.testing.assert_allclose(
            np.asarray(flat_s[jax.tree_util.keystr(path)]), np.asarray(xd),
            rtol=2e-4, atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_sparse_fit_and_resume(synth_dir, tmp_path):
    """Multi-step sparse training runs, checkpoints carry the table moments,
    and resume restores them."""
    cfg = make_config(
        synth_dir, sparse_item_adam=True, total_iters=4, eval_interval=100,
        checkpoint_dir=str(tmp_path),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model(seed=1)
    stats = t.fit(train, None)
    assert stats["iters"] == 4
    assert np.isfinite(stats["examples_per_s"])
    assert t.state.table_m is not None
    assert float(jnp.abs(t.state.table_m).sum()) > 0
    t.save_checkpoint()

    t2 = Trainer(cfg, data)
    t2.setup_model(seed=2)
    assert t2.load_checkpoint()
    assert int(t2.state.step) == 4
    np.testing.assert_allclose(
        np.asarray(t2.state.table_m), np.asarray(t.state.table_m)
    )
    np.testing.assert_allclose(
        np.asarray(t2.state.params["item_embedding"]["embedding"]),
        np.asarray(t.state.params["item_embedding"]["embedding"]),
    )


def test_sparse_with_sharded_table(synth_dir):
    """sparse_item_adam composes with the row-sharded item table on an
    8-device mesh (gather/scatter through GSPMD)."""
    cfg = make_config(
        synth_dir, sparse_item_adam=True, shard_item_embedding=True,
        train_batch_size=8, total_iters=1,
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model(seed=0)
    from mhrec_tpu.parallel.mesh import shard_batch

    b = next(iter(train.epoch_batches(0)))
    batch = shard_batch(t.mesh, {k: jnp.asarray(v) for k, v in b.items()})
    state, out = t._jit_train_step(t.state, batch)
    assert np.isfinite(float(out["loss"]))


def test_dedup_touched_rows_matches_summed_grads():
    """Cross-host duplicate row ids: the deduped row update must equal one
    Adam step on the SUMMED gradients (what a dense optimizer sees after the
    grad psum) — never two sequential nonlinear row updates."""
    from mhrec_tpu.trainer.sparse_adam import (
        SparseAdamConfig, dedup_touched_rows, sparse_adamw_row_update,
    )

    rng = np.random.default_rng(3)
    N, D, U = 20, 4, 6
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    m = jnp.zeros((N, D), jnp.float32)
    v = jnp.zeros((N, D), jnp.float32)
    cfg = SparseAdamConfig(weight_decay=0.01)

    # two virtual host blocks, overlapping on rows 5 and 7; pad slots (id 0,
    # mask 0) in both blocks
    ids = jnp.asarray([0, 5, 7, 9, 0, 0,        # host 0 block
                       0, 5, 7, 11, 13, 0])     # host 1 block
    mask = jnp.asarray([1, 1, 1, 1, 0, 0,
                        1, 1, 1, 1, 1, 0], jnp.float32)
    grads = jnp.asarray(rng.normal(size=(2 * U, D)).astype(np.float32))

    ids_u, mask_u, g_u = dedup_touched_rows(ids, mask, grads)
    t1, m1, v1 = sparse_adamw_row_update(
        table, m, v, ids_u, mask_u, g_u, lr=0.01, step_count=jnp.asarray(0),
        cfg=cfg,
    )

    # oracle: manually summed gradients, one entry per distinct id
    man_ids = jnp.asarray([0, 5, 7, 9, 11, 13])
    man_mask = jnp.ones(6, jnp.float32)
    man_g = jnp.stack([
        grads[0] + grads[6],          # id 0 (both hosts' real pad rows)
        grads[1] + grads[7],          # id 5
        grads[2] + grads[8],          # id 7
        grads[3],                     # id 9
        grads[9],                     # id 11
        grads[10],                    # id 13
    ])
    t2, m2, v2 = sparse_adamw_row_update(
        table, m, v, man_ids, man_mask, man_g, lr=0.01,
        step_count=jnp.asarray(0), cfg=cfg,
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # masked pad slots (mask 0 everywhere) never touched their rows
    untouched = np.setdiff1d(np.arange(N), np.asarray([0, 5, 7, 9, 11, 13]))
    np.testing.assert_array_equal(
        np.asarray(t1)[untouched], np.asarray(table)[untouched]
    )


@pytest.mark.parametrize("model", ["ComiRec", "HSTU"])
def test_no_dense_moments_for_table(synth_dir, model):
    """Under sparse_item_adam the optax state must hold NO dense [N, D]
    moments for the item table — including when the table is nested under
    ``trunk.`` (ComiRec/REMI), where a prefix match on 'item_embedding'
    silently labeled it 'normal' (ADVICE r3)."""
    cfg = _config_for(synth_dir, model, sparse_item_adam=True)
    data = InteractionData(cfg).build()
    t = Trainer(cfg, data)
    t.setup_model()
    from mhrec_tpu.trainer.trainer import _get_path

    table = _get_path(t.state.params, t._table_path)
    n_table_shaped = sum(
        1 for leaf in jax.tree.leaves(t.state.opt_state)
        if getattr(leaf, "shape", None) == table.shape
    )
    assert n_table_shaped == 0, (
        f"{n_table_shaped} dense [N, D] moment buffers exist for the "
        f"{model} item table under sparse_item_adam"
    )
    # and the row-sparse moments DO exist (trainer-owned, outside optax)
    assert t.state.table_m.shape == table.shape


# ---------------------------------------------------------------------------
# bf16 item-table storage (item_table_dtype: bfloat16, VERDICT r3 #4)
# ---------------------------------------------------------------------------
def test_quantize_bf16_stochastic_rounding():
    from mhrec_tpu.trainer.sparse_adam import quantize_bf16

    # on-grid values pass through exactly, both modes
    on_grid = jnp.asarray([1.0, -2.5, 0.0, 3.0], jnp.float32)
    np.testing.assert_array_equal(np.asarray(quantize_bf16(on_grid)), np.asarray(on_grid))
    key = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(
        np.asarray(quantize_bf16(on_grid, key)), np.asarray(on_grid)
    )
    # off-grid: SR is unbiased in expectation; nearest is deterministic
    x = jnp.full((20000,), 1.0 + 2.0 ** -10, jnp.float32)  # 1/8 ulp above 1.0
    q = np.asarray(quantize_bf16(x, key), np.float64)
    ulp = 2.0 ** -7  # bf16: 7 mantissa bits → ulp(1.0) = 2^-7
    assert set(np.unique(q)) <= {1.0, 1.0 + ulp}
    frac_up = (q > 1.0).mean()
    assert abs(frac_up - 0.125) < 0.02, frac_up  # E[q] == x
    assert float(quantize_bf16(x[:1])[0]) == 1.0  # nearest rounds down


def test_bf16_table_trains_and_tracks_f32(synth_dir, tmp_path):
    """bf16-stored item table: param dtype is bf16, moments stay f32, the
    loss trajectory tracks the f32-table run closely, and checkpoints
    round-trip the dtype."""
    def run(dtype, ckpt):
        cfg = make_config(
            synth_dir, sparse_item_adam=True, item_table_dtype=dtype,
            total_iters=30, eval_interval=1000, update_interval=1,
            checkpoint_dir=ckpt,
        )
        data = InteractionData(cfg).build()
        train, _, _ = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model(seed=3)
        stats = t.fit(train, None)
        return t, stats

    t16, s16 = run("bfloat16", str(tmp_path / "b"))
    table = t16.state.params["item_embedding"]["embedding"]
    assert table.dtype == jnp.bfloat16
    assert t16.state.table_m.dtype == jnp.float32
    t32, s32 = run("float32", str(tmp_path / "f"))
    # same data/seed/rng streams: trajectories coincide up to storage noise
    assert np.isfinite(s16["loss"]) and np.isfinite(s32["loss"])
    assert abs(s16["loss"] - s32["loss"]) < 0.02 * max(1.0, abs(s32["loss"])), (
        s16["loss"], s32["loss"])

    # checkpoint round-trip keeps the bf16 table bit-exactly
    t16.save_checkpoint()
    cfg2 = make_config(
        synth_dir, sparse_item_adam=True, item_table_dtype="bfloat16",
        total_iters=30, eval_interval=1000,
        checkpoint_dir=str(tmp_path / "b"),
    )
    data2 = InteractionData(cfg2).build()
    t2 = Trainer(cfg2, data2)
    t2.setup_model(seed=9)
    assert t2.load_checkpoint()
    restored = t2.state.params["item_embedding"]["embedding"]
    assert restored.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored, np.float32), np.asarray(table, np.float32)
    )


def test_bf16_table_requires_sparse_adam(synth_dir):
    cfg = make_config(synth_dir, item_table_dtype="bfloat16")
    data = InteractionData(cfg).build()
    with pytest.raises(ValueError, match="sparse_item_adam"):
        Trainer(cfg, data)
