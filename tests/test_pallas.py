"""Pallas HSTU attention kernel vs the XLA einsum path (interpret mode on
CPU), forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.ops.hstu_attention import hstu_attention_xla
from mhrec_tpu.ops.pallas.hstu_attention_tpu import hstu_attention_pallas


def _setup(B=2, L=70, H=2, D=16, Dv=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, L, H, D)).astype(np.float32)
    v = rng.normal(size=(B, L, H, Dv)).astype(np.float32)
    nonpad = rng.random((B, L)) > 0.25
    nonpad[:, -1] = True
    causal = np.tril(np.ones((L, L), bool))
    mask = nonpad[:, None, None, :] & causal[None, None]
    return map(jnp.asarray, (q, k, v, mask))


def test_pallas_forward_matches_xla():
    q, k, v, mask = _setup()
    ref = hstu_attention_xla(q, k, v, mask)
    out = hstu_attention_pallas(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_backward_matches_xla():
    q, k, v, mask = _setup(L=40)

    def loss_ref(q, k, v):
        return (hstu_attention_xla(q, k, v, mask) ** 2).sum()

    def loss_pl(q, k, v):
        return (hstu_attention_pallas(q, k, v, mask, interpret=True) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_pallas_full_nonpad():
    q, k, v, _ = _setup(L=128)
    mask = jnp.tril(jnp.ones((128, 128), bool))[None, None]
    mask = jnp.broadcast_to(mask, (2, 1, 128, 128))
    ref = hstu_attention_xla(q, k, v, mask)
    out = hstu_attention_pallas(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_v2_matches_xla_fwd_and_grads():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mhrec_tpu.ops.hstu_attention import hstu_attention_xla
    from mhrec_tpu.ops.pallas.hstu_attention_tpu import hstu_attention_pallas_v2

    rng = np.random.default_rng(5)
    B, L, H, D = 2, 10, 4, 8
    q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    nonpad = np.ones((B, L), bool)
    nonpad[1, 7:] = False
    causal = np.tril(np.ones((L, L), bool))
    mask = jnp.asarray(nonpad[:, None, None, :] & causal[None, None])

    out_ref = hstu_attention_xla(q, k, v, mask)
    out_v2 = hstu_attention_pallas_v2(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out_v2), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(hstu_attention_xla(q, k, v, mask) ** 2)

    def loss_v2(q, k, v):
        return jnp.sum(hstu_attention_pallas_v2(q, k, v, mask, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_v2 = jax.grad(loss_v2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_v2, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "B,L",
    [
        (2, 20),   # short-L row-packed mode: seg=32, 4 rows/tile, B padded
        (3, 50),   # seg=64, 2 rows/tile, odd B padded to 4 (size4 shape)
        (2, 70),   # unpacked mode (L > 64)
    ],
)
def test_fused_gated_kernel_matches_unfused_layer(B, L):
    """v3 fused STU kernel (attention + u·LN gating, custom VJP) must match
    the unfused XLA path — outputs and every gradient incl. the LN affine."""
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.models.idnet.hstu import STULayer

    D, h = 128, 2
    dqk = dv = D // h
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    nonpad = np.ones((B, L), bool)
    nonpad[1, 13:] = False
    tri = np.tril(np.ones((L, L), bool))
    mask = jnp.asarray(nonpad[:, None, None, :] & tri[None, None])

    def make(impl):
        return STULayer(
            embedding_dim=D, linear_dim=dv, attention_dim=dqk, num_heads=h,
            dropout_ratio=0.0, attn_impl=impl, dtype=jnp.float32,
        )

    params = make("xla").init(
        {"params": jax.random.PRNGKey(0)}, x, mask, deterministic=True
    )["params"]
    # nudge the LN affine away from identity so its gradients are exercised
    params = dict(params)
    params["attn_norm"] = {
        "scale": jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.float32),
        "bias": jnp.asarray(0.05 * rng.normal(size=(D,)), jnp.float32),
    }

    def loss(p, impl):
        out = make(impl).apply({"params": p}, x, mask, deterministic=True)
        w = jnp.cos(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out * w)

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, "xla"))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, "fused"))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=2e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(g_f)}
    for p, v in flat_x:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(v), rtol=2e-4, atol=2e-5,
            err_msg=key,
        )
