"""Native C++ sampler: build, correctness vs the numpy path, throughput."""

import numpy as np
import pytest

from mhrec_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_uniform_excludes_blacklist_and_unique():
    rng = np.random.default_rng(0)
    bl = rng.integers(1, 10000, size=(32, 40)).astype(np.int64)
    out = native.sample_negatives_uniform(bl, k=128, item_num=10000, seed=7)
    assert out.shape == (32, 128)
    for i in range(32):
        assert len(set(out[i].tolist())) == 128
        assert not np.isin(out[i], bl[i]).any()
        assert out[i].min() >= 1 and out[i].max() < 10000


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_pool_variant():
    rng = np.random.default_rng(1)
    pool = np.arange(100, 1100, dtype=np.int64)
    bl = pool[rng.integers(0, 1000, size=(8, 20))]
    out = native.sample_negatives_pool(bl, k=64, pool=pool, seed=3)
    for i in range(8):
        assert set(out[i].tolist()) <= set(pool.tolist())
        assert not np.isin(out[i], bl[i]).any()
        assert len(set(out[i].tolist())) == 64


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_weighted_variant_distribution():
    counts = np.zeros(1000)
    counts[:50] = 100.0
    counts[50:] = 1.0
    cdf = np.cumsum(counts)
    cdf = cdf / cdf[-1]
    pool = np.arange(1, 1001, dtype=np.int64)
    bl = np.zeros((4, 2), dtype=np.int64)
    out = native.sample_negatives_weighted(bl, k=2048, pool=pool, cdf=cdf, seed=9)
    frac_popular = (out <= 50).mean()
    assert frac_popular > 0.7


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_determinism():
    bl = np.zeros((4, 2), dtype=np.int64)
    a = native.sample_negatives_uniform(bl, k=16, item_num=1000, seed=42)
    b = native.sample_negatives_uniform(bl, k=16, item_num=1000, seed=42)
    np.testing.assert_array_equal(a, b)
    c = native.sample_negatives_uniform(bl, k=16, item_num=1000, seed=43)
    assert not np.array_equal(a, c)


def test_sampler_integration_with_native(base_config, base_data):
    """NegativeSampler routes through native code and keeps its contract."""
    from mhrec_tpu.data.samplers import make_negative_sampler

    sampler = make_negative_sampler(base_config, base_data)
    rng = np.random.default_rng(0)
    bl = rng.integers(1, base_data.item_num, size=(16, 22)).astype(np.int64)
    out = sampler.sample(rng, bl, k=32)
    for i in range(16):
        assert not np.isin(out[i], bl[i]).any()

