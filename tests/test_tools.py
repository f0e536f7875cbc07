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
