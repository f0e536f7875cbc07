"""Offline item / user clustering — prior-dictionary builders.

Counterparts of the reference offline tools (``code/item-clustering.py``,
``code/user-clustering.py``): build a co-occurrence graph from interaction
windows (item–item) or co-interaction counts (user–user), detect
communities, and emit the cluster → category mapping in the prior-dict JSON
schema consumed by :mod:`mhrec_tpu.data.tag_dicts`.

The reference uses igraph Leiden; this environment has no igraph, so
communities come from weighted label propagation over the sparse graph —
a standard modularity-seeking heuristic with the same output contract
(cluster ids), deterministic under a seed.
"""

from __future__ import annotations

import json
import os
from collections import Counter
from typing import Dict, Optional

import numpy as np
from scipy import sparse


def cooccurrence_graph(
    seqs, num_nodes: int, window: int = 5, min_count: int = 2
) -> sparse.csr_matrix:
    """Symmetric item–item co-occurrence counts over sliding windows."""
    rows, cols = [], []
    for seq in seqs:
        arr = np.asarray(seq)
        for off in range(1, window + 1):
            if len(arr) <= off:
                continue
            rows.append(arr[:-off])
            cols.append(arr[off:])
    if not rows:
        return sparse.csr_matrix((num_nodes, num_nodes))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    m = sparse.coo_matrix(
        (np.ones(len(r)), (r, c)), shape=(num_nodes, num_nodes)
    ).tocsr()
    m = m + m.T
    m.data[m.data < min_count] = 0
    m.eliminate_zeros()
    m.setdiag(0)
    m.eliminate_zeros()
    return m


def co_interaction_graph(seqs, num_users: int, num_items: int,
                         min_count: int = 2) -> sparse.csr_matrix:
    """User–user graph weighted by shared-item counts (B Bᵀ)."""
    rows, cols = [], []
    for uid, seq in enumerate(seqs):
        arr = np.unique(np.asarray(seq))
        rows.append(np.full(len(arr), uid))
        cols.append(arr)
    if not rows:
        return sparse.csr_matrix((num_users, num_users))
    b = sparse.coo_matrix(
        (np.ones(sum(len(x) for x in cols)), (np.concatenate(rows), np.concatenate(cols))),
        shape=(num_users, num_items),
    ).tocsr()
    m = (b @ b.T).tocsr()
    m.data[m.data < min_count] = 0
    m.setdiag(0)
    m.eliminate_zeros()
    return m


def label_propagation(
    graph: sparse.csr_matrix, max_iter: int = 30, seed: int = 0,
    min_cluster_size: int = 2,
) -> np.ndarray:
    """Weighted label propagation; returns compact cluster ids [num_nodes].

    Nodes without edges get cluster -1. Small clusters (< min_cluster_size)
    are merged into -1.
    """
    n = graph.shape[0]
    rng = np.random.default_rng(seed)
    labels = np.arange(n)
    degrees = np.asarray(graph.sum(axis=1)).ravel()
    active = np.where(degrees > 0)[0]
    indptr, indices, data = graph.indptr, graph.indices, graph.data
    for _ in range(max_iter):
        order = rng.permutation(active)
        changed = 0
        for node in order:
            lo, hi = indptr[node], indptr[node + 1]
            if lo == hi:
                continue
            neigh_labels = labels[indices[lo:hi]]
            weights = data[lo:hi]
            best = Counter()
            for lab, w in zip(neigh_labels, weights):
                best[lab] += w
            new_label = max(best.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if new_label != labels[node]:
                labels[node] = new_label
                changed += 1
        if changed == 0:
            break
    # compact ids; isolated/small clusters → -1
    out = np.full(n, -1, dtype=np.int64)
    counts = Counter(labels[active].tolist())
    keep = sorted(
        (lab for lab, cnt in counts.items() if cnt >= min_cluster_size),
        key=lambda lab: -counts[lab],
    )
    remap = {lab: i for i, lab in enumerate(keep)}
    for node in active:
        out[node] = remap.get(labels[node], -1)
    return out


def build_item_cluster_dict(
    data, window: int = 5, min_count: int = 2, max_clusters: int = 32,
    tag_version: str = "v1", seed: int = 0,
) -> Dict:
    """Cluster items; returns (prior-dict JSON payload, per-item cluster ids)."""
    seqs = [data.seq_of(u) for u in range(1, data.user_num)]
    graph = cooccurrence_graph(seqs, data.item_num, window, min_count)
    clusters = label_propagation(graph, seed=seed)
    clusters = np.where(clusters >= max_clusters, -1, clusters)
    counts = Counter(int(c) for c in clusters if c >= 0)
    payload = {
        tag_version: {
            "category_counts": {f"cluster_{c}": n for c, n in sorted(counts.items())},
            "tag_to_category": {
                str(c): [f"cluster_{c}"] for c in sorted(counts.keys())
            },
        }
    }
    return payload, clusters


def build_user_cluster_dict(
    data, min_count: int = 2, max_clusters: int = 32,
    tag_version: str = "v1", seed: int = 0,
) -> Dict:
    seqs = [data.seq_of(u) for u in range(1, data.user_num)]
    graph = co_interaction_graph(seqs, data.user_num - 1, data.item_num, min_count)
    clusters = label_propagation(graph, seed=seed)
    clusters = np.where(clusters >= max_clusters, -1, clusters)
    counts = Counter(int(c) for c in clusters if c >= 0)
    payload = {
        tag_version: {
            "category_counts": {f"cluster_{c}": n for c, n in sorted(counts.items())},
            "tag_to_category": {
                str(c): [f"cluster_{c}"] for c in sorted(counts.keys())
            },
        }
    }
    # user_cluster column is indexed by uid (0 = pad)
    user_clusters = np.concatenate([[-1], clusters])
    return payload, user_clusters


def write_prior_dict(payload: Dict, data_path: str, dataset: str, kind: str):
    path = os.path.join(data_path, f"{dataset}_{kind}.json")
    with open(path, "w") as fh:
        json.dump(payload, fh)
    return path
