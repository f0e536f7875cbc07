"""End-to-end training: fit/eval smoke, checkpoint resume, loss decreases."""

import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.trainer import Trainer
from tests.conftest import make_config


@pytest.fixture(scope="module")
def trained(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir,
        loss="prior", eval_num_cats=4, num_prior_head=4, num_segment_head=1,
        medusa_num_layers=1, pred_len=4, total_iters=20, eval_interval=10,
        train_batch_size=16,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")),
    )
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, valid)
    return cfg, data, t, test, stats


def test_fit_runs_and_saves(trained):
    cfg, data, t, test, stats = trained
    assert stats["iters"] == 20
    assert t.best_valid_score is not None


def test_evaluate_best_model(trained):
    cfg, data, t, test, stats = trained
    res = t.evaluate(test, load_best_model=True)
    last = f"pred_{cfg['eval_pred_len'] - 1}"
    assert last in res
    assert 0.0 <= res[last]["recall@10"] <= 1.0
    assert "Entropy@10" in res["shared"]
    # per-category and outlier splits present
    assert any(k.startswith("cat_") for k in res[last])
    assert any(k.startswith("outlier_") for k in res[last])


def test_checkpoint_roundtrip(trained):
    import jax

    cfg, data, t, test, stats = trained
    params_before = jax.tree.leaves(t.state.params)
    assert t.load_checkpoint()
    params_after = jax.tree.leaves(t.state.params)
    assert len(params_before) == len(params_after)
    for a, b in zip(params_before, params_after):
        assert a.shape == b.shape


def test_loss_decreases(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir, total_iters=60, eval_interval=1000, train_batch_size=16,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt2")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()

    import jax.numpy as jnp
    from mhrec_tpu.parallel.mesh import shard_batch

    losses = []
    stream = train.infinite_batches(prefetch=0)
    for i in range(60):
        batch = shard_batch(t.mesh, next(stream))
        t.state, out = t._jit_train_step(t.state, batch)
        losses.append(float(out["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_debug_mode_breaks_early(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir, total_iters=1000, debug=True,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt3")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 10


def test_freeze_prefix(synth_dir, tmp_path_factory):
    """freeze_prefix parameters must not change during training."""
    import jax

    cfg = make_config(
        synth_dir, total_iters=5, train_batch_size=16,
        freeze_prefix=["item_embedding"],
        checkpoint_dir=str(tmp_path_factory.mktemp("fz")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    emb_before = np.asarray(t.state.params["item_embedding"]["embedding"]).copy()
    pos_before = np.asarray(t.state.params["position_embedding"]["embedding"]).copy()
    t.fit(train, None)
    emb_after = np.asarray(t.state.params["item_embedding"]["embedding"])
    pos_after = np.asarray(t.state.params["position_embedding"]["embedding"])
    np.testing.assert_array_equal(emb_before, emb_after)
    assert not np.array_equal(pos_before, pos_after)


def test_lr_mult_prefix(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir, total_iters=2, train_batch_size=16,
        lr_mult_prefix=["position_embedding"], lr_mult_rate=10.0,
        checkpoint_dir=str(tmp_path_factory.mktemp("lm")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 2


def test_resume_continues(synth_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("res"))
    cfg = make_config(synth_dir, total_iters=6, eval_interval=3,
                      train_batch_size=16, checkpoint_dir=ckpt)
    data = InteractionData(cfg).build()
    train, valid, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, valid)  # saves checkpoints at evals
    # new trainer with resume picks up the saved step
    cfg2 = make_config(synth_dir, total_iters=6, eval_interval=3,
                       train_batch_size=16, checkpoint_dir=ckpt, resume=True)
    t2 = Trainer(cfg2, data)
    t2.setup_model()
    assert int(t2.state.step) > 0
    stats = t2.fit(train, None)
    assert stats["iters"] < 6  # only the remaining steps ran


def test_clip_grad_norm(synth_dir, tmp_path_factory):
    """clip_grad_norm caps the global grad norm before the AdamW update
    (the reference reads the key, trainer.py:99, without applying it)."""
    import jax
    import jax.numpy as jnp

    cfg = make_config(
        synth_dir, total_iters=2, clip_grad_norm=1e-8,
        sparse_item_adam=False,
        checkpoint_dir=str(tmp_path_factory.mktemp("clip")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    p0 = jax.tree.map(lambda x: np.asarray(x), t.state.params)
    b = next(iter(train.epoch_batches(0)))
    t.state, out = t._jit_train_step(
        t.state, {k: jnp.asarray(v) for k, v in b.items()}
    )
    # with a vanishing clip norm the updates are (numerically) tiny
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(b) - a))), p0, t.state.params
    )
    assert max(jax.tree.leaves(deltas)) < 1e-3


def test_adam_mu_dtype_bf16(synth_dir, tmp_path_factory):
    """adam_mu_dtype stores the Adam first moment in bfloat16 (half the
    m-buffer HBM footprint/traffic); update math stays fp32 and training
    still advances the params."""
    import jax
    import jax.numpy as jnp

    cfg = make_config(
        synth_dir, total_iters=2, adam_mu_dtype="bfloat16",
        sparse_item_adam=False,
        checkpoint_dir=str(tmp_path_factory.mktemp("mu16")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    mu_leaves = [
        x for x in jax.tree.leaves(t.state.opt_state)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
    ]
    assert mu_leaves, "no bf16 moment buffers found in the optimizer state"
    p0 = jax.tree.map(lambda x: np.asarray(x), t.state.params)
    b = next(iter(train.epoch_batches(0)))
    t.state, out = t._jit_train_step(
        t.state, {k: jnp.asarray(v) for k, v in b.items()}
    )
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(b, np.float32) - a))),
        p0, jax.tree.map(lambda x: np.asarray(x, np.float32), t.state.params),
    )
    assert max(jax.tree.leaves(deltas)) > 0.0
    assert np.isfinite(float(out["loss"]))


def test_user_cluster_prior_end_to_end(tmp_path_factory):
    """category_by='user': user-cluster prior heads with oracle priors at
    test (reference trainer.py:104-105 constraints; user one-hot tags from
    trainset.py:147)."""
    import tempfile

    from mhrec_tpu.config import Config
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset

    tmp = tempfile.mkdtemp(prefix="mhrec_ucl_")
    meta = generate_synthetic_dataset(
        tmp, num_users=100, num_items=200, seed=4, with_user_clusters=True
    )
    cfg = Config(
        config_file_list=["IDNet/hstu-size1.yaml", "overall/ID.yaml",
                          "IDNet/hstu.yaml"],
        config_dict=dict(
            data_path=meta["data_path"], dataset=meta["name"],
            text_path=meta["text_path"],
            MAX_ITEM_LIST_LENGTH=8, train_batch_size=8, eval_batch_size=16,
            num_negatives=32, n_layers=1, n_heads=2,
            item_embedding_size=16, hstu_embedding_size=16,
            total_iters=2, eval_interval=100,
            eval_pred_len=2, pred_len=2, topk=[5, 10],
            loss="prior", category_by="user", cluster_as_tag=True,
            tag_version="v1", eval_num_cats=4, num_prior_head=4,
            medusa_num_layers=1,
            prior_given_at_test=True, given_prior_len=1,
            checkpoint_dir=str(tmp_path_factory.mktemp("ucl")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    assert data.user_cluster_list is not None
    train, _, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    # user one-hot: exactly one active category per position
    assert (b["tag_categories"].sum(axis=-1) == 1).all()
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_decay_check_name_modal_split(synth_dir):
    """decay_check_name reroutes the modal/recsys grouping to a name
    substring (reference trainer.py:232-250): params whose path contains
    the substring get the modal group's LR."""
    import jax.numpy as jnp
    import optax

    from mhrec_tpu.trainer.optim import build_optimizer

    cfg = make_config(
        synth_dir,
        optim_args=dict(modal_lr=0.0, modal_decay=0.0, rec_lr=0.5, rec_decay=0.0),
        decay_check_name="special",
        scheduler_args=dict(type="constant", warmup=0.0),
    )
    make = build_optimizer(cfg, lambda lr: lr, total_iters=10)
    params = {"special_w": jnp.ones((4,)), "other_w": jnp.ones((4,))}
    tx = make(params)
    state = tx.init(params)
    grads = {"special_w": jnp.ones((4,)), "other_w": jnp.ones((4,))}
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # modal_lr=0 -> the 'special' param must be untouched; rec param moves
    np.testing.assert_allclose(np.asarray(new["special_w"]), 1.0)
    assert not np.allclose(np.asarray(new["other_w"]), 1.0)


def test_item_emb_pretrain_loads(tmp_path):
    """item_emb_pretrain warm-starts item_emb_tokens (hllm.py:105-108)."""
    import jax.numpy as jnp

    from mhrec_tpu.models.hllm.hllm import load_pretrained_towers

    arr = np.arange(8, dtype=np.float32).reshape(1, 1, 8)
    path = tmp_path / "emb.npy"
    np.save(path, arr)
    params = {"item_emb_tokens": jnp.zeros((1, 1, 8), jnp.float32)}
    out = load_pretrained_towers(params, {"item_emb_pretrain": str(path)})
    np.testing.assert_allclose(np.asarray(out["item_emb_tokens"]), arr)


class _NaNInjector:
    """Delegating model proxy that poisons the loss at one train step —
    lets the in-jit NaN guard be tested without corrupting any params."""

    def __init__(self, model, at_step):
        object.__setattr__(self, "_m", model)
        object.__setattr__(self, "_s", at_step)

    def __getattr__(self, k):
        return getattr(object.__getattribute__(self, "_m"), k)

    def apply(self, variables, batch, *a, **k):
        import jax.numpy as jnp

        out = object.__getattribute__(self, "_m").apply(variables, batch, *a, **k)
        if isinstance(out, dict) and "loss" in out \
                and isinstance(batch, dict) and "step" in batch:
            bad = batch["step"] == object.__getattribute__(self, "_s")
            out = dict(out, loss=jnp.where(bad, jnp.nan, out["loss"]))
        return out


@pytest.mark.parametrize("sparse", [False, True])
def test_nan_guard_in_jit(synth_dir, tmp_path_factory, sparse):
    """Reference checks isnan(loss) on host EVERY step (trainer.py:371-373).
    Here the guard lives inside the jit: the first NaN step is recorded in
    TrainState.nan_step, its (and later) updates are grad-zeroed so params
    stay finite, and the host raises with the OFFENDING step index at the
    next metrics fetch — no per-step host sync."""
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.parallel.mesh import shard_batch

    cfg = make_config(
        synth_dir, total_iters=6, eval_interval=1000, train_batch_size=8,
        sparse_item_adam=sparse,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_nan")),
    )
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.model = _NaNInjector(t.model, at_step=3)
    t.setup_model()
    stream = train.infinite_batches(prefetch=0)
    for _ in range(6):  # run PAST the poisoned step without any host fetch
        t.state, out = t._jit_train_step(t.state, shard_batch(t.mesh, next(stream)))
    assert int(t.state.nan_step) == 3
    assert int(t.state.step) == 6  # device kept going; host never synced
    for leaf in jax.tree.leaves(t.state.params):
        assert bool(jnp.isfinite(leaf).all()), "NaN reached params"

    # fit-level: the raise carries the offending step index
    t2 = Trainer(cfg, data)
    t2.model = _NaNInjector(t2.model, at_step=3)
    t2.setup_model()
    with pytest.raises(RuntimeError, match="iter 3"):
        t2.fit(train, None)
