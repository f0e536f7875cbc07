"""Clustering tools + observability utilities."""

import numpy as np

from mhrec_tpu.data import InteractionData
from mhrec_tpu.tools.clustering import (
    build_item_cluster_dict,
    build_user_cluster_dict,
    cooccurrence_graph,
    label_propagation,
)
from mhrec_tpu.utils.observability import load_log_dict, save_log_dict


def test_label_propagation_two_cliques():
    """Two disjoint cliques must land in two clusters."""
    from scipy import sparse

    n = 10
    rows, cols = [], []
    for group in (range(0, 5), range(5, 10)):
        for i in group:
            for j in group:
                if i != j:
                    rows.append(i)
                    cols.append(j)
    g = sparse.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()
    labels = label_propagation(g, seed=0)
    assert len(set(labels[:5])) == 1
    assert len(set(labels[5:])) == 1
    assert labels[0] != labels[5]


def test_item_clustering_on_synthetic(base_data):
    payload, clusters = build_item_cluster_dict(base_data, window=3, min_count=2)
    assert "v1" in payload
    assert len(payload["v1"]["category_counts"]) >= 1
    assert clusters.shape == (base_data.item_num,)
    # category-sticky generator → clusters should correlate with categories
    assert (clusters >= 0).sum() > base_data.item_num // 4


def test_user_clustering_on_synthetic(base_data):
    payload, user_clusters = build_user_cluster_dict(base_data, min_count=2)
    assert user_clusters.shape == (base_data.user_num,)
    assert len(payload["v1"]["category_counts"]) >= 1


def test_save_load_log_dict(tmp_path):
    d = {
        "topk": np.arange(12).reshape(3, 4),
        "scores": np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32),
        "note": "hello",
    }
    path = str(tmp_path / "dump")
    save_log_dict(path, d)
    back = load_log_dict(path)
    np.testing.assert_array_equal(back["topk"], d["topk"])
    np.testing.assert_allclose(back["scores"], d["scores"])
    assert back["note"] == "hello"


def test_convert_priors_roundtrip(tmp_path):
    """Reference-style *_dict.py module → JSON the registry loads."""
    mod = tmp_path / "Foo_tag_dict.py"
    mod.write_text(
        "tag_to_general = {\n"
        "    'v1': {\n"
        "        'tag_to_category': {'rock': ['music'], 7: ['cluster_7']},\n"
        "        'category_counts': {'music': 10, 'cluster_7': 3},\n"
        "    }\n"
        "}\n"
    )
    out = tmp_path / "Foo_tag_dict.json"
    from mhrec_tpu.tools.convert_priors import convert

    data = convert(str(mod), str(out))
    assert data["v1"]["category_counts"]["music"] == 10

    from mhrec_tpu.data.tag_dicts import load_prior_dict

    loaded = load_prior_dict(str(tmp_path), "Foo", "tag_dict")
    assert loaded["v1"]["tag_to_category"]["rock"] == ["music"]
    # int keys become strings in JSON; the loader looks up str(tag) too
    assert loaded["v1"]["tag_to_category"]["7"] == ["cluster_7"]


def test_leiden_planted_partition():
    """Leiden recovers 4 planted communities exactly and reports higher
    modularity than label propagation on a noisy stochastic block model."""
    from scipy import sparse

    from mhrec_tpu.tools.clustering import leiden, modularity

    rng = np.random.default_rng(7)
    n_blocks, per = 4, 25
    n = n_blocks * per
    dense = np.zeros((n, n))
    for b in range(n_blocks):
        s = slice(b * per, (b + 1) * per)
        block = rng.random((per, per)) < 0.6
        dense[s, s] = block
    noise = rng.random((n, n)) < 0.02
    dense = np.maximum(dense, noise)
    dense = np.triu(dense, 1)
    dense = dense + dense.T
    g = sparse.csr_matrix(dense)

    labels = leiden(g, seed=0)
    truth = np.repeat(np.arange(n_blocks), per)
    # perfect recovery up to relabeling
    for b in range(n_blocks):
        blk = labels[truth == b]
        assert (blk == blk[0]).all(), f"block {b} split: {np.unique(blk)}"
    assert len(np.unique(labels)) == n_blocks

    q = modularity(g, labels)
    assert q > 0.4
    # determinism under a fixed seed
    assert (leiden(g, seed=0) == labels).all()


def test_leiden_resolution_and_edge_cases():
    from scipy import sparse

    from mhrec_tpu.tools.clustering import leiden

    # two triangles joined by one weak edge: resolution sweep merges/splits
    rows = [0, 0, 1, 3, 3, 4, 2]
    cols = [1, 2, 2, 4, 5, 5, 3]
    m = sparse.coo_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(6, 6)
    )
    g = (m + m.T).tocsr()
    hi = leiden(g, resolution=1.5, seed=0)
    assert hi[0] == hi[1] == hi[2] and hi[3] == hi[4] == hi[5]
    assert hi[0] != hi[3]
    lo = leiden(g, resolution=0.05, seed=0)
    assert len(np.unique(lo)) == 1          # coarse at tiny resolution
    # empty graph → all -1
    empty = sparse.csr_matrix((4, 4))
    assert (leiden(empty) == -1).all()


def test_cluster_dict_builders_use_leiden(base_data):
    from mhrec_tpu.tools.clustering import build_item_cluster_dict

    payload, clusters = build_item_cluster_dict(
        base_data, window=3, min_count=2, algorithm="leiden", resolution=1.0
    )
    tv = payload["v1"]
    assert set(tv) == {"category_counts", "tag_to_category"}
    assert len(clusters) == base_data.item_num
