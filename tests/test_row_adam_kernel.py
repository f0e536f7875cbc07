"""Parity of the fused Pallas row-AdamW kernel (ops/pallas/row_adam_tpu)
against the XLA scatter formulation (trainer/sparse_adam) — interpret mode
on CPU; the same kernel body compiles on TPU (measured in BASELINE r5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.ops.pallas.row_adam_tpu import sparse_adamw_row_update_pallas
from mhrec_tpu.trainer.sparse_adam import (
    SparseAdamConfig,
    dedup_touched_rows,
    sparse_adamw_row_update,
)


def _mk(N=400, D=256, U=70, n_real=50, seed=0, moments=True):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    if moments:
        m = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32) * 0.01)
        v = jnp.asarray(
            np.abs(rng.normal(size=(N, D)).astype(np.float32)) * 0.01
        )
    else:
        m = jnp.zeros((N, D), jnp.float32)
        v = jnp.zeros((N, D), jnp.float32)
    ids = np.zeros(U, np.int32)
    ids[:n_real] = rng.choice(
        np.arange(1, N), size=n_real, replace=False
    ).astype(np.int32)
    mask = np.zeros(U, np.float32)
    mask[:n_real] = 1.0
    g = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    return table, m, v, jnp.asarray(ids), jnp.asarray(mask), g


@pytest.mark.parametrize("wd,step", [(0.0, 0), (0.01, 7)])
def test_kernel_matches_xla_update(wd, step):
    table, m, v, ids, mask, g = _mk()
    cfg = SparseAdamConfig(weight_decay=wd)
    ref = sparse_adamw_row_update(
        table, m, v, ids, mask, g, 1e-3, jnp.asarray(step), cfg
    )
    out = sparse_adamw_row_update_pallas(
        table, m, v, ids, mask, g, 1e-3, jnp.asarray(step), cfg
    )
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_pad_slots_are_exact_noops():
    """Pad slots (mask 0, aliasing row 0) must leave row 0 BIT-identical —
    the kernel skips their DMAs entirely."""
    table, m, v, ids, mask, g = _mk(n_real=30)
    cfg = SparseAdamConfig()
    p2, m2, v2 = sparse_adamw_row_update_pallas(
        table, m, v, ids, mask, g, 1e-3, jnp.asarray(0), cfg
    )
    np.testing.assert_array_equal(np.asarray(p2[0]), np.asarray(table[0]))
    np.testing.assert_array_equal(np.asarray(m2[0]), np.asarray(m[0]))
    np.testing.assert_array_equal(np.asarray(v2[0]), np.asarray(v[0]))
    # untouched real rows too
    touched = set(np.asarray(ids)[np.asarray(mask) > 0].tolist())
    untouched = [r for r in range(100) if r not in touched and r != 0][:5]
    for r in untouched:
        np.testing.assert_array_equal(np.asarray(p2[r]), np.asarray(table[r]))


def test_kernel_after_dedup_block():
    """The multi-host path feeds dedup_touched_rows output (summed grads,
    re-padded trailing slots) — kernel must match XLA on that layout."""
    rng = np.random.default_rng(3)
    N, D, U = 300, 128, 64
    table = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    m = jnp.zeros((N, D), jnp.float32)
    v = jnp.zeros((N, D), jnp.float32)
    raw_ids = jnp.asarray(
        rng.integers(1, N, size=U).astype(np.int32)
    )  # duplicates likely
    raw_mask = jnp.ones((U,), jnp.float32)
    g = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    ids_u, mask_u, g_u = dedup_touched_rows(raw_ids, raw_mask, g)
    cfg = SparseAdamConfig()
    ref = sparse_adamw_row_update(
        table, m, v, ids_u, mask_u, g_u, 1e-2, jnp.asarray(2), cfg
    )
    out = sparse_adamw_row_update_pallas(
        table, m, v, ids_u, mask_u, g_u, 1e-2, jnp.asarray(2), cfg
    )
    for a, b in zip(ref, out):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_fallbacks_delegate_to_xla():
    """bf16 tables (needs quantized delta-adds) and D % 128 != 0 fall back
    to the XLA formulation with identical results."""
    cfg = SparseAdamConfig()
    # D not divisible by 128
    table, m, v, ids, mask, g = _mk(D=96)
    ref = sparse_adamw_row_update(table, m, v, ids, mask, g, 1e-3,
                                  jnp.asarray(0), cfg)
    out = sparse_adamw_row_update_pallas(table, m, v, ids, mask, g, 1e-3,
                                         jnp.asarray(0), cfg)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bf16 table
    table, m, v, ids, mask, g = _mk(D=128)
    tb = table.astype(jnp.bfloat16)
    ref = sparse_adamw_row_update(tb, m, v, ids, mask, g, 1e-3,
                                  jnp.asarray(0), cfg)
    out = sparse_adamw_row_update_pallas(tb, m, v, ids, mask, g, 1e-3,
                                         jnp.asarray(0), cfg)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_with_pallas_impl(synth_dir, tmp_path_factory):
    """`sparse_adam_impl: pallas` through the full jitted train step must
    track the XLA impl's parameters step for step.

    Tolerances are trajectory-coincidence, not bitwise: a single update
    matches at ~1 ulp (the tests above), but XLA's fusion (FMA / excess
    precision) makes its op sequence unreproducible bit-for-bit, and the
    near-zero-ν Adam denominator amplifies those ulps chaotically across
    steps. What this test guards is the WIRING (right rows, right grads,
    right state threading) — garbage there produces O(1) divergence."""
    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.trainer import Trainer
    from tests.conftest import make_config

    results = {}
    for impl in ("xla", "pallas"):
        cfg = make_config(
            synth_dir,
            item_embedding_size=128, hstu_embedding_size=128,
            sparse_item_adam=True, sparse_adam_impl=impl,
            total_iters=3,
            checkpoint_dir=str(tmp_path_factory.mktemp(f"rk_{impl}")),
        )
        data = InteractionData(cfg).build()
        train, _, _ = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        t.fit(train, None)
        results[impl] = (
            jax.tree.map(np.asarray, t.state.params),
            np.asarray(t.state.table_m),
            np.asarray(t.state.table_v),
        )
    ref_p, ref_m, ref_v = results["xla"]
    out_p, out_m, out_v = results["pallas"]
    for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(out_p)):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(ref_m, out_m, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(ref_v, out_v, rtol=2e-2, atol=5e-3)
