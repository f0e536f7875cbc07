"""Numerical parity against the actual reference implementation.

Imports the reference's torch modules read-only from /root/reference (when
present), copies weights into our flax modules, and compares forward
outputs. This pins the flagship HSTU math — fused uvqk projection, the
softmax-free ``silu(q·kᵀ)/n`` attention, the u·LN(attn) gating, residual —
bit-for-bit against the code we are re-implementing
(reference hstu.py:137-290).
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/code"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference repo not mounted"
)


def _import_reference_hstu():
    import importlib

    stubs = {
        "colorlog": {},
        "tensorboardX": {"SummaryWriter": object},
        "lightning": {}, "lightning.fabric": {},
        "deepspeed": {}, "wandb": {},
        "pytz": {"timezone": lambda s: None},
    }
    for name, attrs in stubs.items():
        if name in sys.modules:
            continue
        try:
            # never shadow a real installed module (a fake tensorboardX
            # would break the trainer's tensorboard sink in later tests)
            importlib.import_module(name)
            continue
        except ImportError:
            pass
        m = types.ModuleType(name)
        for a, v in attrs.items():
            setattr(m, a, v)
        # a valid ModuleSpec: later `importlib.util.find_spec(name)` calls
        # (transformers probes deepspeed this way) raise ValueError on
        # spec-less sys.modules entries, which poisoned every test imported
        # after this one in the same process
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from REC.model.IDNet import hstu as ref_hstu  # noqa: E402

    return ref_hstu


def test_stu_layer_matches_reference():
    ref_hstu = _import_reference_hstu()

    D, dv, dqk, h, B, L = 32, 8, 8, 4, 3, 12
    torch.manual_seed(0)
    ref_layer = ref_hstu.SequentialTransductionUnitJagged(
        embedding_dim=D, linear_hidden_dim=dv, attention_dim=dqk,
        dropout_ratio=0.0, attn_dropout_ratio=0.0, num_heads=h,
        linear_activation="silu",
    ).eval()

    from mhrec_tpu.models.idnet.hstu import STULayer

    layer = STULayer(
        embedding_dim=D, linear_dim=dv, attention_dim=dqk, num_heads=h,
        dropout_ratio=0.0, dtype=jnp.float32,
    )
    params = {
        "uvqk": np.asarray(ref_layer._uvqk.detach()),
        "o_proj": {
            "kernel": np.asarray(ref_layer._o.weight.detach()).T,
            "bias": np.asarray(ref_layer._o.bias.detach()),
        },
        # the reference norms are non-learnable F.layer_norm — identity affine
        "input_norm": {"scale": np.ones(D, np.float32),
                       "bias": np.zeros(D, np.float32)},
        "attn_norm": {"scale": np.ones(dv * h, np.float32),
                      "bias": np.zeros(dv * h, np.float32)},
    }

    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    tri = np.tril(np.ones((L, L), np.float32))
    mask = np.broadcast_to(tri, (B, 1, L, L)).copy()

    with torch.no_grad():
        ref_out = ref_layer(
            x=torch.tensor(x), attention_mask=torch.tensor(mask)
        ).numpy()
    out = np.asarray(
        layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                    deterministic=True)
    )
    np.testing.assert_allclose(out, ref_out, rtol=2e-5, atol=2e-5)


def test_stu_stack_matches_reference():
    """Two stacked layers through the reference HSTUJagged wrapper."""
    ref_hstu = _import_reference_hstu()

    D, dv, dqk, h, B, L, n_layers = 16, 4, 4, 4, 2, 8, 2
    torch.manual_seed(2)
    ref_layers = [
        ref_hstu.SequentialTransductionUnitJagged(
            embedding_dim=D, linear_hidden_dim=dv, attention_dim=dqk,
            dropout_ratio=0.0, attn_dropout_ratio=0.0, num_heads=h,
            linear_activation="silu",
        )
        for _ in range(n_layers)
    ]
    ref_stack = ref_hstu.HSTUJagged(ref_layers, torch.float32).eval()

    from mhrec_tpu.models.idnet.hstu import STULayer

    def our_params(ref_layer):
        return {
            "uvqk": np.asarray(ref_layer._uvqk.detach()),
            "o_proj": {"kernel": np.asarray(ref_layer._o.weight.detach()).T,
                       "bias": np.asarray(ref_layer._o.bias.detach())},
            "input_norm": {"scale": np.ones(D, np.float32),
                           "bias": np.zeros(D, np.float32)},
            "attn_norm": {"scale": np.ones(dv * h, np.float32),
                          "bias": np.zeros(dv * h, np.float32)},
        }

    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    # ragged: row 1 has only 5 real positions
    keep = np.ones((B, L), bool)
    keep[1, 5:] = False
    tri = np.tril(np.ones((L, L), np.float32))
    mask = (keep[:, None, None, :] * tri[None, None]).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_stack(
            x=torch.tensor(x), attention_mask=torch.tensor(mask)
        ).numpy()

    layer = STULayer(embedding_dim=D, linear_dim=dv, attention_dim=dqk,
                     num_heads=h, dropout_ratio=0.0, dtype=jnp.float32)
    out = jnp.asarray(x)
    for rl in ref_layers:
        out = layer.apply({"params": our_params(rl)}, out, jnp.asarray(mask),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-5, atol=5e-5)


def test_pallas_path_matches_reference_attention():
    """The Pallas kernel (interpret mode on CPU) against the reference
    einsum attention."""
    ref_hstu = _import_reference_hstu()
    import jax

    from mhrec_tpu.ops.hstu_attention import hstu_attention_xla

    B, L, h, dqk, dv = 2, 16, 2, 8, 8
    rng = np.random.default_rng(4)
    q = rng.normal(size=(B, L, h, dqk)).astype(np.float32)
    k = rng.normal(size=(B, L, h, dqk)).astype(np.float32)
    v = rng.normal(size=(B, L, h, dv)).astype(np.float32)
    tri = np.tril(np.ones((L, L), np.float32))
    mask = np.broadcast_to(tri, (B, 1, L, L)).copy()

    with torch.no_grad():
        ref = ref_hstu._hstu_attention_maybe_from_cache(
            num_heads=h, attention_dim=dqk, linear_dim=dv,
            q=torch.tensor(q.reshape(B, L, h * dqk)),
            k=torch.tensor(k.reshape(B, L, h * dqk)),
            v=torch.tensor(v.reshape(B, L, h * dv)),
            attention_mask=torch.tensor(mask),
        ).numpy()
    ours = np.asarray(
        hstu_attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask))
    ).reshape(B, L, h * dv)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_multi_horizon_nce_matches_reference_pipeline():
    """Full multi-horizon InfoNCE against a faithful torch transcription of
    the reference pipeline (unfold → mask → nce_loss → per-offset CE →
    λ-schedule, hstu.py:600-713) using the actual reference ``nce_loss``
    method. Tolerance covers our bf16 logit tables (the reference runs
    bf16-mixed autocast in training too)."""
    ref_hstu = _import_reference_hstu()
    import torch.nn.functional as F

    from mhrec_tpu.models.losses import multi_horizon_nce

    B, L, P, D, M = 3, 6, 2, 8, 20
    rng = np.random.default_rng(7)
    head_embs = rng.normal(size=(B, 1, L, D)).astype(np.float32)
    target_embs = rng.normal(size=(B, L + P, D)).astype(np.float32)
    negs = rng.normal(size=(M, D)).astype(np.float32)
    negs_norm = negs / np.linalg.norm(negs, axis=-1, keepdims=True)
    user_mask = np.ones((B, L + P), bool)
    user_mask[0, 5:] = False  # ragged row
    logit_scale = np.float32(1.2)
    nce_thres = 0.9
    lam = np.asarray([0.6, 0.4], np.float32)

    # ---- reference pipeline (torch) ----
    class _Stub:
        pass

    stub = _Stub()
    stub.logit_scale = torch.tensor(logit_scale)
    stub.nce_thres = nce_thres
    t_heads = torch.tensor(head_embs)
    t_tgt = torch.tensor(target_embs)
    t_negs = torch.tensor(negs_norm)
    t_mask = torch.tensor(user_mask)
    cur_embs = t_heads[:, [0] * P]                                  # (B,P,L,D)
    windows_pos = t_tgt.unfold(1, P, 1)[:, 1:].permute(0, 3, 1, 2)  # (B,P,L,D)
    windows_mask = t_mask.unfold(1, P, 1)[:, 1:].permute(0, 2, 1)   # (B,P,L)
    base_mask = t_mask[:, :L].unsqueeze(1)
    final_mask = (base_mask & windows_mask)
    mask_flat = final_mask.reshape(B * P, L).bool()
    cur_flat = cur_embs.reshape(B * P, L, D)[mask_flat]
    pos_flat = windows_pos.reshape(B * P, L, D)[mask_flat]
    with torch.no_grad():
        logits, labels = ref_hstu.HSTU.nce_loss(
            stub, cur_flat, pos_flat, t_negs
        )
        tok_loss = F.cross_entropy(logits, labels, reduction="none")
        pred_idx_token = (
            torch.arange(P).repeat(B).unsqueeze(1).expand(-1, L).reshape(-1)
            [mask_flat.reshape(-1)]
        )
        loss_sum = torch.zeros(P)
        cnt = torch.zeros(P)
        loss_sum.index_add_(0, pred_idx_token, tok_loss.float())
        cnt.index_add_(0, pred_idx_token, torch.ones_like(tok_loss))
        mean_per_p = loss_sum / torch.clamp_min(cnt, 1.0)
        ref_per_pred = (torch.tensor(lam) * mean_per_p).numpy()

    # ---- ours ----
    bm = np.stack(
        [user_mask[:, :L] & user_mask[:, p + 1 : p + 1 + L] for p in range(P)],
        axis=1,
    )
    total, per_pred, _ = multi_horizon_nce(
        head_embs=jnp.asarray(head_embs),
        target_embs=jnp.asarray(target_embs),
        neg_embs_norm=jnp.asarray(negs_norm),
        base_mask=jnp.asarray(bm),
        head_for_pred=np.zeros(P, np.int32),
        horizon_discount=jnp.asarray(lam),
        logit_scale=jnp.asarray(logit_scale),
        nce_thres=nce_thres,
    )
    np.testing.assert_allclose(np.asarray(per_pred), ref_per_pred,
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(float(total), float(ref_per_pred.sum()),
                               rtol=2e-2)
