"""HSTU model: attention math, forward shapes, head variants, predict masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.data import build_dataloader
from mhrec_tpu.models.idnet.hstu import hstu_from_config
from mhrec_tpu.ops.hstu_attention import hstu_attention_xla
from tests.conftest import make_config
from mhrec_tpu.data import InteractionData


def test_hstu_attention_matches_naive():
    rng = np.random.default_rng(0)
    B, L, H, Dq, Dv = 2, 7, 3, 4, 5
    q = rng.normal(size=(B, L, H, Dq)).astype(np.float32)
    k = rng.normal(size=(B, L, H, Dq)).astype(np.float32)
    v = rng.normal(size=(B, L, H, Dv)).astype(np.float32)
    nonpad = rng.random((B, L)) > 0.2
    causal = np.tril(np.ones((L, L), bool))
    mask = nonpad[:, None, None, :] & causal[None, None]
    out = np.asarray(hstu_attention_xla(q, k, v, jnp.asarray(mask)))
    # naive per-element
    expected = np.zeros_like(v)
    for b in range(B):
        for h in range(H):
            s = q[b, :, h] @ k[b, :, h].T
            s = s / (1 + np.exp(-s)) / L  # silu(x) = x*sigmoid(x)
            s = s * mask[b, 0]
            expected[b, :, h] = s @ v[b, :, h]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_setup(synth_dir):
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        num_segment_head=2, medusa_num_layers=1, pred_len=4,
        prior_switch="in", prior_switch_loss_weight=0.1,
        use_prior_switch_test=True,
    )
    data = InteractionData(cfg).build()
    model = hstu_from_config(cfg, data)
    train, valid, test = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mix": jax.random.PRNGKey(2),
    }
    params = model.init(rngs, batch, deterministic=False)
    return cfg, data, model, params, batch, test


def test_forward_outputs(tiny_setup):
    cfg, data, model, params, batch, _ = tiny_setup
    out = model.apply(
        params, batch, deterministic=True,
        rngs={"mix": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss"]) > 0
    for c in range(4):
        assert f"head_nce_cat_{c}_loss" in out
    assert "seg_0_loss" in out and "seg_1_loss" in out


def test_forward_deterministic_reproducible(tiny_setup):
    cfg, data, model, params, batch, _ = tiny_setup
    o1 = model.apply(params, batch, deterministic=True, rngs={"mix": jax.random.PRNGKey(7)})
    o2 = model.apply(params, batch, deterministic=True, rngs={"mix": jax.random.PRNGKey(7)})
    assert float(o1["loss"]) == float(o2["loss"])


def test_causality(tiny_setup):
    """Changing a later item must not affect earlier positions' outputs."""
    cfg, data, model, params, batch, _ = tiny_setup
    items = np.asarray(batch["items"]).copy()
    mask = np.asarray(batch["masked_index"])
    L = cfg["MAX_ITEM_LIST_LENGTH"]
    ctx = np.where(mask[:, :L] == 1, items[:, :L], 0)
    enc1 = np.asarray(model.apply(params, jnp.asarray(ctx), method="encode"), np.float32)
    ctx2 = ctx.copy()
    ctx2[:, -1] = np.where(ctx2[:, -1] > 0, (ctx2[:, -1] % (data.item_num - 1)) + 1, 0)
    enc2 = np.asarray(model.apply(params, jnp.asarray(ctx2), method="encode"), np.float32)
    np.testing.assert_allclose(enc1[:, : L - 1], enc2[:, : L - 1], rtol=1e-4, atol=1e-5)


def test_predict_and_masks(tiny_setup):
    cfg, data, model, params, batch, test = tiny_setup
    eb = next(iter(test.batches()))
    feats = model.apply(params, method="compute_item_all")
    pe = model.apply(
        params, jnp.asarray(eb["item_seq"]), jnp.asarray(eb["target_tags"]),
        method="predict_embeddings",
    )
    assert pe["head_embs"].shape[1] == model.medusa_num_heads
    norms = np.linalg.norm(np.asarray(pe["head_embs"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
    scores = model.apply(
        params, pe["head_embs"], feats, jnp.asarray(data.item_tag_matrix),
        jnp.asarray(eb["target_tags"]), pe.get("switch_pred"),
        method="score_items",
    )
    s = np.asarray(scores)
    # category-item mask: head h (= s*C + c) can only score items of category c
    C = cfg["num_prior_head"]
    for h in range(model.medusa_num_heads):
        c = h % C
        off_cat = ~np.asarray(data.item_tag_matrix)[:, c]
        assert np.isneginf(s[:, h, :][:, off_cat]).all()


def test_nce_only_single_head(synth_dir):
    cfg = make_config(synth_dir)  # loss=nce defaults
    data = InteractionData(cfg).build()
    model = hstu_from_config(cfg, data)
    train, _, _ = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=False,
    )
    out = model.apply(params, batch, deterministic=True)
    assert np.isfinite(float(out["loss"]))
    assert "nce_top1_acc" in out


def test_additive_interaction(synth_dir):
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        num_segment_head=2, medusa_num_layers=1, head_interaction="additive",
        pred_len=4,
    )
    data = InteractionData(cfg).build()
    model = hstu_from_config(cfg, data)
    assert model.medusa_num_heads == 6
    train, _, _ = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mix": jax.random.PRNGKey(2)},
        batch, deterministic=False,
    )
    out = model.apply(params, batch, deterministic=True, rngs={"mix": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out["loss"]))


def test_hierarchical_interaction(synth_dir):
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        num_segment_head=2, medusa_num_layers=1, head_interaction="hierarchical",
        pred_len=4, segment_embed=True, cat_bottleneck=True,
    )
    data = InteractionData(cfg).build()
    model = hstu_from_config(cfg, data)
    assert model.medusa_num_heads == 8
    train, _, _ = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mix": jax.random.PRNGKey(2)},
        batch, deterministic=False,
    )
    out = model.apply(params, batch, deterministic=True, rngs={"mix": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out["loss"]))
    pe = model.apply(
        params, batch["items"][:, : cfg["MAX_ITEM_LIST_LENGTH"]],
        None, method="predict_embeddings",
    )
    assert pe["head_embs"].shape[1] == 8


def test_relative_bias_modules():
    import jax
    from mhrec_tpu.models.idnet.rel_bias import (
        RelativeBucketedTimeAndPositionBasedBias,
        RelativePositionalBias,
    )

    m = RelativePositionalBias(max_seq_len=6)
    params = m.init(jax.random.PRNGKey(0), None)
    bias = m.apply(params, None)
    assert bias.shape == (1, 6, 6)
    w = np.asarray(params["params"]["w"])
    b = np.asarray(bias[0])
    for i in range(6):
        for j in range(6):
            assert b[i, j] == w[j - i + 5]

    mt = RelativeBucketedTimeAndPositionBasedBias(max_seq_len=4, num_buckets=8)
    ts = jnp.asarray(np.array([[10, 20, 40, 80]], dtype=np.int64))
    p2 = mt.init(jax.random.PRNGKey(0), ts)
    out = mt.apply(p2, ts)
    assert out.shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_hstu_relative_bias_flag(synth_dir):
    from mhrec_tpu.data import InteractionData

    cfg = make_config(synth_dir, enable_relative_attention_bias=True,
                      apply_relative_attention_bias=True)
    data = InteractionData(cfg).build()
    model = hstu_from_config(cfg, data)
    from mhrec_tpu.data import build_dataloader

    train, _, _ = build_dataloader(cfg, data)
    b = next(iter(train.epoch_batches(0)))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, deterministic=False,
    )
    assert "rel_bias_0" in params["params"]
    out = model.apply(params, batch, deterministic=True)
    assert np.isfinite(float(out["loss"]))


def test_scan_layers_matches_unrolled():
    """scan_layers=True must compute exactly the unrolled trunk: stacking the
    per-layer `stu_{i}` params along axis 0 into the scanned layout
    reproduces the forward bit-for-bit (same per-layer math, one jit body)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mhrec_tpu.models.idnet.hstu import HSTU

    kw = dict(
        item_num=50, item_embedding_size=16, hstu_embedding_size=16,
        max_seq_length=8, pred_len=2, n_layers=3, n_heads=2,
        hidden_dropout_prob=0.0, eval_pred_len=2,
    )
    unrolled = HSTU(**kw)
    scanned = HSTU(scan_layers=True, **kw)

    rng = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
           "mix": jax.random.PRNGKey(2)}
    items = jnp.asarray(np.random.default_rng(0).integers(1, 50, (4, 8)))
    pu = unrolled.init(rng, {"items": jnp.pad(items, ((0, 0), (0, 2))),
                             "neg_items": jnp.ones((4, 1, 8), jnp.int32),
                             "masked_index": jnp.ones((4, 10), jnp.int32)},
                       deterministic=True)["params"]
    ps = scanned.init(rng, {"items": jnp.pad(items, ((0, 0), (0, 2))),
                            "neg_items": jnp.ones((4, 1, 8), jnp.int32),
                            "masked_index": jnp.ones((4, 10), jnp.int32)},
                      deterministic=True)["params"]

    # graft the unrolled layer params into the scanned stacked layout
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=0),
        *[pu[f"stu_{i}"] for i in range(3)],
    )
    ps = dict(ps)
    ps["stu_stack"] = {"layers": {"stu": stacked}}
    for k in pu:
        if not k.startswith("stu_"):
            ps[k] = pu[k]

    out_u = unrolled.apply(
        {"params": pu}, items, method=lambda m, x: m.encode(x, deterministic=True)
    )
    out_s = scanned.apply(
        {"params": ps}, items, method=lambda m, x: m.encode(x, deterministic=True)
    )
    np.testing.assert_allclose(
        np.asarray(out_u, np.float32), np.asarray(out_s, np.float32),
        rtol=1e-5, atol=1e-5,
    )
