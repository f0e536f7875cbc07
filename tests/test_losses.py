"""Loss math parity: the fixed-shape JAX multi-horizon NCE must match a
direct numpy transcription of the reference formulas (hstu.py:600-713) that
gathers valid tokens exactly like the torch code does."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhrec_tpu.models.losses import clamp_logit_scale, multi_horizon_nce


def reference_nce_numpy(
    head_embs, target_embs, neg_norm, mask, head_for_pred, lam, logit_scale,
    nce_thres, extra_mask=None, loss_weight=1.0,
):
    """Direct reimplementation of the reference masked-gather loss."""
    B, H, L, D = head_embs.shape
    P = len(head_for_pred)
    scale = np.exp(np.clip(logit_scale, 0, np.log(100)))
    per_pred = []
    for p in range(P):
        h = head_for_pred[p]
        losses = []
        for b in range(B):
            for l in range(L):
                valid = mask[b, l] and mask[b, l + p + 1]
                if extra_mask is not None:
                    valid = valid and extra_mask[b, p, l]
                if not valid:
                    continue
                out = head_embs[b, h, l]
                out = out / np.linalg.norm(out)
                tgt = target_embs[b, l + p + 1]
                tgt = tgt / np.linalg.norm(tgt)
                pos_logit = out @ tgt
                neg_logits = out @ neg_norm.T
                fix = tgt @ neg_norm.T
                neg_logits = np.where(
                    fix > nce_thres, np.finfo(np.float32).min, neg_logits
                )
                logits = np.concatenate([[pos_logit], neg_logits]) * scale
                m = logits.max()
                lse = m + np.log(np.exp(logits - m).sum())
                losses.append(lse - logits[0])
        mean_p = np.mean(losses) if losses else 0.0
        per_pred.append(lam[p] * loss_weight * mean_p)
    return np.sum(per_pred), np.asarray(per_pred)


@pytest.mark.parametrize("impl", ["per_offset", "banded"])
@pytest.mark.parametrize("seg_heads,P", [(1, 3), (3, 3)])
def test_multi_horizon_nce_parity(seg_heads, P, impl):
    rng = np.random.default_rng(0)
    B, L, D, M = 4, 6, 8, 32
    H = seg_heads
    head_embs = rng.normal(size=(B, H, L, D)).astype(np.float32)
    target_embs = rng.normal(size=(B, L + P, D)).astype(np.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    neg_norm = neg / np.linalg.norm(neg, axis=-1, keepdims=True)
    mask = rng.random((B, L + P)) > 0.3
    mask[:, 2:5] = True
    lam = 0.9 ** np.arange(P)
    lam = (lam / lam.sum()).astype(np.float32)
    head_for_pred = np.arange(P) // max(P // seg_heads, 1)
    head_for_pred = np.minimum(head_for_pred, H - 1)
    logit_scale = np.float32(np.log(1 / 0.05))
    thres = 0.8

    base_mask = np.stack(
        [mask[:, :L] & mask[:, p + 1 : p + 1 + L] for p in range(P)], axis=1
    )
    total, per_pred, _ = multi_horizon_nce(
        head_embs=jnp.asarray(head_embs),
        target_embs=jnp.asarray(target_embs),
        neg_embs_norm=jnp.asarray(neg_norm),
        base_mask=jnp.asarray(base_mask),
        head_for_pred=head_for_pred,
        horizon_discount=jnp.asarray(lam),
        logit_scale=jnp.asarray(logit_scale),
        nce_thres=thres,
        impl=impl,
    )
    ref_total, ref_per_pred = reference_nce_numpy(
        head_embs, target_embs, neg_norm, mask, head_for_pred, lam,
        logit_scale, thres,
    )
    np.testing.assert_allclose(np.asarray(per_pred), ref_per_pred, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-2)


def test_multi_horizon_nce_extra_mask_and_weight():
    rng = np.random.default_rng(1)
    B, L, D, M, P = 3, 5, 8, 16, 2
    head_embs = rng.normal(size=(B, 1, L, D)).astype(np.float32)
    target_embs = rng.normal(size=(B, L + P, D)).astype(np.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    neg_norm = neg / np.linalg.norm(neg, axis=-1, keepdims=True)
    mask = np.ones((B, L + P), bool)
    extra = rng.random((B, P, L)) > 0.5
    lam = np.asarray([0.6, 0.4], np.float32)
    hfp = np.zeros(P, int)
    ls = np.float32(1.0)

    base_mask = np.stack(
        [mask[:, :L] & mask[:, p + 1 : p + 1 + L] for p in range(P)], axis=1
    )
    total, per_pred, _ = multi_horizon_nce(
        jnp.asarray(head_embs), jnp.asarray(target_embs), jnp.asarray(neg_norm),
        jnp.asarray(base_mask), hfp, jnp.asarray(lam), jnp.asarray(ls),
        0.9, loss_weight=0.25, extra_mask=jnp.asarray(extra),
    )
    ref_total, ref_per_pred = reference_nce_numpy(
        head_embs, target_embs, neg_norm, mask, hfp, lam, ls, 0.9,
        extra_mask=extra, loss_weight=0.25,
    )
    np.testing.assert_allclose(np.asarray(per_pred), ref_per_pred, rtol=2e-2, atol=2e-3)


def test_empty_mask_contributes_zero():
    B, L, D, M, P = 2, 4, 8, 8, 2
    rng = np.random.default_rng(2)
    head_embs = jnp.asarray(rng.normal(size=(B, 1, L, D)), jnp.float32)
    target_embs = jnp.asarray(rng.normal(size=(B, L + P, D)), jnp.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    neg_norm = jnp.asarray(neg / np.linalg.norm(neg, axis=-1, keepdims=True))
    base_mask = jnp.zeros((B, P, L), bool)
    total, per_pred, _ = multi_horizon_nce(
        head_embs, target_embs, neg_norm, base_mask, np.zeros(P, int),
        jnp.asarray([0.5, 0.5], jnp.float32), jnp.asarray(1.0), 0.99,
    )
    assert float(total) == 0.0


def test_clamp_logit_scale_straight_through():
    v = jnp.asarray(10.0)  # above ln(100)
    out = clamp_logit_scale(v)
    np.testing.assert_allclose(float(out), 100.0, rtol=1e-5)
    g = jax.grad(lambda x: clamp_logit_scale(x))(v)
    assert float(g) > 0  # straight-through keeps gradient alive


def test_gradients_flow_and_finite():
    rng = np.random.default_rng(3)
    B, L, D, M, P = 2, 4, 8, 8, 2
    head = jnp.asarray(rng.normal(size=(B, 1, L, D)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, L + P, D)), jnp.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    negn = jnp.asarray(neg / np.linalg.norm(neg, axis=-1, keepdims=True))
    mask = jnp.ones((B, P, L), bool)

    def f(h):
        t, _, _ = multi_horizon_nce(
            h, tgt, negn, mask, np.zeros(P, int),
            jnp.asarray([0.5, 0.5], jnp.float32), jnp.asarray(1.0), 0.99,
        )
        return t

    g = jax.grad(f)(head)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("force_f32", [True, False])
@pytest.mark.parametrize("seg_heads,P,M", [(1, 4, 64), (2, 4, 48)])
def test_banded_matches_per_offset_loss_and_grads(seg_heads, P, M, force_f32,
                                                  monkeypatch):
    """The banded (one-matmul) NCE must agree with the per-offset path on
    value AND gradients — same math, different contraction order. With the
    internal bf16 tables forced to f32 the agreement is exact (~1e-7); in
    bf16 the two paths round at different points so only a loose bound
    holds."""
    if force_f32:
        monkeypatch.setattr(jnp, "bfloat16", jnp.float32)
    rng = np.random.default_rng(7)
    B, L, D = 3, 6, 16
    head = jnp.asarray(rng.normal(size=(B, seg_heads, L, D)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, L + P, D)), jnp.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    negn = jnp.asarray(neg / np.linalg.norm(neg, axis=-1, keepdims=True))
    mask = rng.random((B, L + P)) > 0.2
    base_mask = jnp.asarray(
        np.stack([mask[:, :L] & mask[:, p + 1 : p + 1 + L] for p in range(P)], 1)
    )
    extra = jnp.asarray(rng.random((B, P, L)) > 0.3)
    lam = 0.95 ** np.arange(P)
    lam = jnp.asarray(lam / lam.sum(), jnp.float32)
    hfp = np.arange(P) // max(P // seg_heads, 1)
    ls = jnp.asarray(np.log(1 / 0.05), jnp.float32)
    # a threshold low enough that some negatives actually get masked
    thres = 0.2

    def f(impl):
        def inner(h, t, n, s):
            total, per_pred, logs = multi_horizon_nce(
                h, t, n, base_mask, hfp, lam, s, thres,
                loss_weight=0.7, extra_mask=extra, compute_topk_log=True,
                impl=impl,
            )
            return total, (per_pred, logs)
        return inner

    (tb, (ppb, logb)), gb = jax.value_and_grad(f("banded"), argnums=(0, 1, 2, 3),
                                               has_aux=True)(head, tgt, negn, ls)
    (tp, (ppp, logp)), gp = jax.value_and_grad(f("per_offset"), argnums=(0, 1, 2, 3),
                                               has_aux=True)(head, tgt, negn, ls)
    rtol, atol = (1e-5, 1e-6) if force_f32 else (5e-2, 1e-3)
    np.testing.assert_allclose(float(tb), float(tp), rtol=max(rtol, 1e-5))
    np.testing.assert_allclose(np.asarray(ppb), np.asarray(ppp), rtol=2e-2, atol=1e-4)
    for a, b in zip(gb, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
    # some negatives were actually masked (otherwise the test is vacuous)
    assert float(logb["nce_samples"]) < M + 1
    for k in logp:
        np.testing.assert_allclose(
            float(logb[k]), float(logp[k]), rtol=2e-2, atol=1e-3
        )


def test_banded_nce_underflow_guard():
    """Adversarial tail (VERDICT round-1 weak #7): logit_scale at its ln(100)
    clamp and a masked false negative sitting ~99 log-units above every kept
    negative. The naive global-max shift underflows the kept partition sum
    (bf16 exp dies ~92 log-units down); the headroom-lowered shift must keep
    the CE exact vs the per-offset reference path, and nonzero."""
    B, L, P, D, M = 2, 4, 2, 8, 32
    thres = 0.1

    # head output = e1; target = e2 (pos logit 0)
    head = np.zeros((B, 1, L, D), np.float32)
    head[..., 0] = 1.0
    tgt = np.zeros((B, L + P, D), np.float32)
    tgt[..., 1] = 1.0
    # masked false negative: cos(th)·e1 + sin(th)·e2 with sin(th) > thres
    # → fix = 0.15 > thres (masked) while head·neg = 0.989 → scaled 98.9
    th = np.arcsin(0.15)
    neg = np.zeros((M, D), np.float32)
    neg[0, 0], neg[0, 1] = np.cos(th), np.sin(th)
    neg[1:, 2] = 1.0  # kept negatives orthogonal: head·neg = 0, gap ≈ 99
    base_mask = np.ones((B, P, L), bool)
    lam = np.full(P, 1.0 / P, np.float32)
    hfp = np.zeros(P, np.int32)
    ls = jnp.asarray(np.log(100.0), jnp.float32)  # at the clamp

    outs = {}
    for impl in ("banded", "per_offset"):
        total, per_pred, _ = multi_horizon_nce(
            jnp.asarray(head), jnp.asarray(tgt), jnp.asarray(neg),
            jnp.asarray(base_mask), hfp, jnp.asarray(lam), ls, thres,
            impl=impl,
        )
        outs[impl] = (float(total), np.asarray(per_pred))

    # exact CE: pos 0 vs M-1 kept zeros → log(M) per token
    expect = np.log(M)
    assert outs["per_offset"][0] == pytest.approx(expect, rel=1e-3)
    assert outs["banded"][0] == pytest.approx(expect, rel=5e-3)
    assert outs["banded"][0] > 1.0  # nonzero CE (the old path read 0 or +29)
    np.testing.assert_allclose(
        outs["banded"][1], outs["per_offset"][1], rtol=5e-3
    )


def test_banded_nce_underflow_rate_log():
    """The residual-underflow monitor reports 0 on normal data."""
    rng = np.random.default_rng(7)
    B, L, P, D, M = 2, 5, 2, 8, 16
    head = rng.normal(size=(B, 1, L, D)).astype(np.float32)
    tgt = rng.normal(size=(B, L + P, D)).astype(np.float32)
    neg = rng.normal(size=(M, D)).astype(np.float32)
    neg /= np.linalg.norm(neg, axis=-1, keepdims=True)
    _, _, logs = multi_horizon_nce(
        jnp.asarray(head), jnp.asarray(tgt), jnp.asarray(neg),
        jnp.ones((B, P, L), bool), np.zeros(P, np.int32),
        jnp.full(P, 0.5, jnp.float32), jnp.asarray(2.0, jnp.float32), 0.9,
        compute_topk_log=True, impl="banded",
    )
    assert "nce_underflow_rate" in logs
    assert float(logs["nce_underflow_rate"]) == 0.0


@pytest.mark.parametrize("by_cat", [True, False])
@pytest.mark.parametrize("switch", [None, "in"])
def test_stacked_prior_matches_loop(synth_dir, by_cat, switch):
    """The category-stacked additive prior path (VERDICT r4 #3,
    losses.multi_horizon_nce_stacked) must reproduce the per-category-loop
    losses — total, per-category logs, switch losses, and gradients — for
    both per-category and shared (global) negative pools."""
    import jax

    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.models.idnet.hstu import hstu_from_config
    from tests.conftest import make_config

    def run(impl):
        cfg = make_config(
            synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
            num_segment_head=2, medusa_num_layers=1,
            head_interaction="additive", pred_len=4,
            neg_sample_by_cat=by_cat, weighted_prior_loss=True,
            prior_switch=switch,
            prior_switch_loss_weight=0.3 if switch else 0.0,
            prior_loss_impl=impl,
        )
        data = InteractionData(cfg).build()
        model = hstu_from_config(cfg, data)
        train, _, _ = build_dataloader(cfg, data)
        b = next(iter(train.epoch_batches(0)))
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "mix": jax.random.PRNGKey(2)},
            batch, deterministic=False,
        )

        def loss_fn(p):
            return model.apply(p, batch, deterministic=True,
                               rngs={"mix": jax.random.PRNGKey(3)})["loss"]

        out = model.apply(params, batch, deterministic=True,
                          rngs={"mix": jax.random.PRNGKey(3)})
        grads = jax.grad(loss_fn)(params)
        return out, grads

    out_loop, g_loop = run("loop")
    out_stacked, g_stacked = run("stacked")
    assert set(out_loop) == set(out_stacked)
    for k in out_loop:
        np.testing.assert_allclose(
            np.asarray(out_loop[k]), np.asarray(out_stacked[k]),
            rtol=2e-4, atol=2e-5, err_msg=k)
    # gradient tolerance: with C=1 the two paths are BIT-EXACT (verified —
    # the stacked slice math IS the loop math); with shared negatives and
    # C>1 the categories' matmul-backward contributions to the SAME negative
    # rows accumulate in different orders through bf16-input matmuls, giving
    # ~1-ulp-of-bf16 differences on those rows only
    flat_l = jax.tree_util.tree_leaves_with_path(g_loop)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_stacked))
    for path, leaf in flat_l:
        ref = np.asarray(flat_s[path])
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=5e-3, atol=6e-3,
            err_msg=jax.tree_util.keystr(path))
