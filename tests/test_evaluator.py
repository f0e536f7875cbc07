"""Evaluator: fusion parity, unique-positive counts, metric math vs naive
implementations (reference collector.py / metrics.py semantics)."""

import numpy as np
import pytest

from mhrec_tpu.config import Config
from mhrec_tpu.evaluator import Collector, Evaluator
from mhrec_tpu.evaluator.fusion import (
    fuse_topk_combine,
    fuse_topk_combine_reference,
    unique_positive_counts,
)


def _cfg(**over):
    base = dict(
        topk=[5, 10],
        metrics=["Recall", "NDCG"],
        shared_metrics=["Entropy"],
        eval_pred_len=4,
        metrics_pred_len_list=[0, 3],
        eval_num_cats=1,
        num_segment_head=1,
        num_prior_head=1,
        head_interaction="multiplicative",
        split_mode="combine",
        outlier_user_metrics=None,
        int_to_category={},
        metric_decimal_place=7,
    )
    base.update(over)
    return Config(config_dict=base)


def test_fusion_parity_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        B, H, I, K = 8, 4, 100, 12
        scores = rng.normal(size=(B, H, I)).astype(np.float32)
        idx = np.argsort(-scores, axis=-1)[..., :K]
        vals = np.take_along_axis(scores, idx, axis=-1)
        a = fuse_topk_combine(vals, idx, K)
        b = fuse_topk_combine_reference(vals, idx, K)
        for x, y in zip(a, b):
            assert (x == y).all()


def test_unique_positive_counts():
    pos = np.array([[3, 3, 5, 1], [2, 2, 2, 2]])
    # sorted: [1,3,3,5] → cumulative distinct [1,2,2,3]; [2,2,2,2] → [1,1,1,1]
    got = unique_positive_counts(pos)
    assert (got == np.array([[1, 2, 2, 3], [1, 1, 1, 1]])).all()


def test_collector_hits_and_recall_ndcg():
    cfg = _cfg()
    col = Collector(cfg)
    # 2 users, single head, 20 items; known targets
    scores = np.zeros((2, 1, 20), np.float32)
    # user 0: top items 1..10 in order; targets hit at ranks 1 and 3
    scores[0, 0] = -np.arange(20)
    scores[1, 0] = -np.arange(20)
    positive = np.array([[0, 2, 0, 2], [15, 16, 17, 18]])
    col.eval_batch_collect(scores=scores, positive_i=positive)
    struct = col.get_data_struct(3)
    ev = Evaluator(cfg)
    res = ev.evaluate(struct, pred_len=3)
    # user0: unique pos {0,2} both in top5 → recall@5 = 1; user1: none in top10
    assert res["recall@5"] == pytest.approx(1.0)  # sums: u0=1.0 + u1=0.0
    assert res["recall@10"] == pytest.approx(1.0)
    # ndcg user0 @5: hits at rank1,rank3 → (1 + 1/log2(4)) / (1 + 1/log2(3))
    dcg = 1 + 1 / np.log2(4)
    idcg = 1 + 1 / np.log2(3)
    assert res["ndcg@5"] == pytest.approx(dcg / idcg, rel=1e-5)


def test_collector_multihead_combine_and_entropy():
    cfg = _cfg(num_prior_head=2, eval_num_cats=2, int_to_category={0: "a", 1: "b"})
    col = Collector(cfg)
    rng = np.random.default_rng(1)
    B, H, I = 4, 2, 50
    scores = rng.normal(size=(B, H, I)).astype(np.float32)
    tags = np.zeros((I, 2), bool)
    tags[:25, 0] = True
    tags[25:, 1] = True
    col.set_all_tags(tags)
    positive = rng.integers(1, I, size=(B, 4))
    tag_cat = rng.integers(0, 2, size=(B, 4, 2))
    col.eval_batch_collect(scores=scores, positive_i=positive, tag_category=tag_cat)
    shared = col.get_data_struct(-1)
    ev = Evaluator(cfg)
    res = ev.evaluate(shared, pred_len=-1)
    assert "Entropy@10" in res and np.isfinite(res["Entropy@10"])
    struct = col.get_data_struct(3)
    res2 = ev.evaluate(struct, pred_len=3)
    assert "a-recall@10" in res2 and isinstance(res2["a-recall@10"], tuple)


def test_hit_mrr_precision_map_math():
    cfg = _cfg(metrics=["Hit", "MRR", "Precision", "MAP"], shared_metrics=[])
    col = Collector(cfg)
    scores = np.zeros((1, 1, 20), np.float32)
    scores[0, 0] = -np.arange(20)
    positive = np.array([[1, 1, 3, 9]])  # unique {1,3,9}, ranks 2,4,10
    col.eval_batch_collect(scores=scores, positive_i=positive)
    struct = col.get_data_struct(3)
    res = Evaluator(cfg).evaluate(struct, pred_len=3)
    assert res["hit@5"] == 1
    assert res["mrr@5"] == pytest.approx(1 / 2)
    assert res["precision@5"] == pytest.approx(2 / 5)


def test_gauc_path():
    cfg = _cfg(metrics=["GAUC"], shared_metrics=[], topk=[5])
    col = Collector(cfg)
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(3, 1, 30)).astype(np.float32)
    positive = rng.integers(0, 30, size=(3, 4))
    col.eval_batch_collect(scores=scores, positive_i=positive)
    struct = col.get_data_struct(3)
    res = Evaluator(cfg).evaluate(struct, pred_len=3)
    # tuple (weighted sum, weight) form — exact under cross-host SUM-reduce
    val, weight = res["gauc"]
    assert weight > 0 and 0.0 <= val / weight <= 1.0


def test_gauc_tuple_split_invariance():
    """Splitting users across two collectors and SUM-reducing the tuples
    must reproduce the single-collector GAUC exactly (the multi-process
    reduction semantics, reference trainer.py:1059-1075)."""
    cfg = _cfg(metrics=["GAUC"], shared_metrics=[], topk=[5])
    rng = np.random.default_rng(5)
    scores = rng.normal(size=(8, 1, 50)).astype(np.float32)
    positive = rng.integers(1, 50, size=(8, 4))

    col = Collector(cfg)
    col.eval_batch_collect(scores=scores, positive_i=positive)
    val, n = Evaluator(cfg).evaluate(col.get_data_struct(3), pred_len=3)["gauc"]

    parts = []
    for sl in (slice(0, 3), slice(3, 8)):
        c = Collector(cfg)
        c.eval_batch_collect(scores=scores[sl], positive_i=positive[sl])
        parts.append(Evaluator(cfg).evaluate(c.get_data_struct(3), pred_len=3)["gauc"])
    val2 = sum(p[0] for p in parts)
    n2 = sum(p[1] for p in parts)
    assert n2 == n
    assert val2 / n2 == pytest.approx(val / n, abs=1e-12)


def test_average_split_mode():
    cfg = _cfg(split_mode="average", num_prior_head=3)
    col = Collector(cfg)
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(2, 3, 40)).astype(np.float32)
    scores[0, 1, :] = -np.inf  # one head fully masked → finite-mean ignores it
    positive = rng.integers(0, 40, size=(2, 4))
    col.eval_batch_collect(scores=scores, positive_i=positive)
    struct = col.get_data_struct(3)
    res = Evaluator(cfg).evaluate(struct, pred_len=3)
    assert "recall@10" in res


def test_coverage_diversity_metrics():
    cfg = _cfg(
        metrics=["ItemCoverage", "ShannonEntropy", "GiniIndex", "TailPercentage",
                 "AveragePopularity"],
        shared_metrics=[], tail_ratio=0.2,
    )
    col = Collector(cfg)

    class DS:
        item_num = 50
        user_num = 10
        item_counter = {i: 50 - i for i in range(50)}
        user_counter = {}

    col.data_collect(DS())
    rng = np.random.default_rng(4)
    scores = rng.normal(size=(4, 1, 50)).astype(np.float32)
    positive = rng.integers(0, 50, size=(4, 4))
    col.eval_batch_collect(scores=scores, positive_i=positive)
    struct = col.get_data_struct(3)
    res = Evaluator(cfg).evaluate(struct, pred_len=3)
    for key in ("itemcoverage@10", "shannonentropy@10", "giniindex@10",
                "tailpercentage@10", "averagepopularity@10"):
        assert key in res


def test_value_metrics_match_numpy():
    """MAE / RMSE / LogLoss (the reference's EvaluatorType.VALUE path,
    metrics.py:347-420) against direct numpy formulas."""
    from mhrec_tpu.evaluator.metrics import MAE, RMSE, LogLoss

    class _Struct(dict):
        def get(self, k):
            return self[k]

    rng = np.random.default_rng(11)
    preds = rng.uniform(0.01, 0.99, size=(64, 1)).astype(np.float32)
    trues = (rng.random((64, 1)) > 0.5).astype(np.float32)
    struct = _Struct({"rec.score": preds, "data.label": trues})

    cfg = Config(config_file_list=["overall/ID.yaml"]).finalize()
    p, t = preds.squeeze(-1), trues.squeeze(-1)
    got = MAE(cfg).calculate_metric(struct)["mae"]
    np.testing.assert_allclose(got, np.abs(p - t).mean(), atol=1e-4)
    got = RMSE(cfg).calculate_metric(struct)["rmse"]
    np.testing.assert_allclose(got, np.sqrt(((p - t) ** 2).mean()), atol=1e-4)
    got = LogLoss(cfg).calculate_metric(struct)["logloss"]
    ref = np.mean(-t * np.log(p) - (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(got, ref, atol=1e-4)
