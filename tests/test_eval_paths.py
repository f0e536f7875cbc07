"""Eval-path variants: GAUC full-score path, eval_each_head, average split
mode, streamed-vs-full score parity."""

import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.trainer import Trainer
from tests.conftest import make_config


def test_gauc_streamed_matches_full_score_path(synth_dir, tmp_path_factory):
    """Single-head GAUC streams (count-above-target per chunk, VERDICT r3 #5)
    and must match the full-[B,H,I]-tensor path on the same trained params."""
    cfg = make_config(
        synth_dir,
        metrics=["Recall", "NDCG", "GAUC", "AUC", "MAE", "RMSE", "LogLoss"],
        total_iters=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("g")),
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res_stream = t.evaluate(test, load_best_model=False)
    last = res_stream[f"pred_{cfg['eval_pred_len'] - 1}"]
    assert "gauc" in last and 0.0 <= last["gauc"] <= 1.0
    assert "recall@10" in last

    # force the legacy full-score path by pretending rec.score is needed
    orig_need = t.collector.register.need
    t.collector.register.need = (
        lambda k: True if k == "rec.score" else orig_need(k)
    )
    try:
        res_full = t.evaluate(test, load_best_model=False)
    finally:
        t.collector.register.need = orig_need
    for section in res_stream:
        for k, v in res_stream[section].items():
            # gauc: the full path's one [I]-wide matmul and the streamed
            # chunk matmuls round differently at the ulp level, so the
            # self-item tie can resolve either way → per-target rank noise
            # of ±1, which bounds the gauc gap at ~P/(neg·pos) per user.
            # All other metrics ride the unchanged chunked top-k path.
            tol = 5e-4 if k in ("gauc", "auc") else 2e-6
            assert res_full[section][k] == pytest.approx(v, abs=tol), (
                section, k, v, res_full[section][k]
            )


def test_average_split_mode_end_to_end(synth_dir, tmp_path_factory):
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        medusa_num_layers=1, pred_len=4, split_mode="average", total_iters=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("a")),
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res = t.evaluate(test, load_best_model=False)
    assert "recall@10" in res[f"pred_{cfg['eval_pred_len'] - 1}"]


def test_streamed_chunk_merge_matches_single_chunk(synth_dir, tmp_path_factory):
    """Top-k via many small item chunks == top-k via one chunk."""
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        medusa_num_layers=1, pred_len=4, total_iters=1,
        checkpoint_dir=str(tmp_path_factory.mktemp("s")),
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    import jax.numpy as jnp

    item_feats = t.compute_item_feature()
    item_tags = jnp.asarray(data.item_tag_matrix)
    batch = next(iter(test.batches()))
    pe = t.model.apply(
        {"params": t.state.params, **t.extra_vars},
        jnp.asarray(batch["item_seq"]), jnp.asarray(batch["target_tags"]),
        method="predict_embeddings",
    )
    dev = t._eval_device_batch(batch)
    big_v, big_i = t._stream_score_topk(pe, item_feats, item_tags, dev, 10)
    t2 = Trainer(cfg, data)
    t2.state = t.state
    t2.extra_vars = t.extra_vars
    t2.item_chunk_size = 64  # force 5 chunks over 300 items
    small_v, small_i = t2._stream_score_topk(pe, item_feats, item_tags, dev, 10)
    np.testing.assert_allclose(np.asarray(big_v), np.asarray(small_v), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(big_i), np.asarray(small_i))


def test_log_detailed_results(synth_dir, tmp_path_factory):
    import glob
    import os

    ckpt = str(tmp_path_factory.mktemp("det"))
    cfg = make_config(
        synth_dir, total_iters=1, log_detailed_results=True, checkpoint_dir=ckpt,
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.evaluate(test, load_best_model=False)
    dumps = glob.glob(os.path.join(t.saved_model_dir, "detailed", "*.npz"))
    assert dumps
    from mhrec_tpu.utils.observability import load_log_dict

    back = load_log_dict(dumps[0][:-4])
    assert "values" in back and "recommend_items" in back
    assert len(back["recommend_items"][0]) > 0


def test_save_for_eval_export(synth_dir, tmp_path_factory):
    import glob
    import os

    ckpt = str(tmp_path_factory.mktemp("sfe"))
    cfg = make_config(synth_dir, total_iters=1, save_for_eval=True, checkpoint_dir=ckpt)
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.evaluate(test, load_best_model=False)
    chunks = glob.glob(os.path.join(t.saved_model_dir, "saved_eval", "*.npz"))
    assert chunks
    with np.load(chunks[0]) as z:
        assert "topk_indices" in z and "user_embs" in z


@pytest.mark.slow  # heavy e2e (r2 VERDICT: keep the default suite fast)
def test_host_item_table_matches_device_path(synth_dir, tmp_path_factory):
    """Corpus-scale eval mode (host-resident item table, chunk-outer
    streaming) must produce identical metrics to the device-table path."""
    import copy

    from mhrec_tpu.config import Config
    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.trainer import Trainer

    base = dict(
        data_path=synth_dir["data_path"],
        dataset=synth_dir["name"],
        text_path=synth_dir["text_path"],
        model="HLLM",
        dummy_llm=True,
        dummy_vocab_size=128,
        dummy_hidden_size=32,
        MAX_ITEM_LIST_LENGTH=6,
        MAX_TEXT_LENGTH=12,
        train_batch_size=8,
        eval_batch_size=16,
        num_negatives=16,
        tag_version="v1",
        eval_pred_len=2, pred_len=2,
        topk=[5, 10],
        # GAUC and the VALUE metrics stream in host mode too (r4 #5)
        metrics=["Recall", "NDCG", "GAUC", "AUC", "MAE", "LogLoss"],
        total_iters=2, eval_interval=100,
        eval_item_chunk_size=64,  # force several chunks over the 300-item corpus
        checkpoint_dir=str(tmp_path_factory.mktemp("host_tbl")),
    )

    def run(**over):
        cfg = Config(
            config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
            config_dict={**base, **over},
        ).finalize()
        data = InteractionData(cfg).build()
        train, valid, test = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        t.fit(train, None)
        return t.evaluate(test, load_best_model=False)

    res_dev = run(host_item_table=False)
    res_host = run(host_item_table=True)
    # batch-group tiling (group=1 → one table pass per eval batch) bounds
    # device state at corpus scale; must stay metric-identical
    res_tiled = run(host_item_table=True, host_eval_group_size=1)
    assert res_dev.keys() == res_host.keys() == res_tiled.keys()
    for section in res_dev:
        for k, v in res_dev[section].items():
            # gauc tolerance: host-side np normalization vs device jnp
            # normalization produce ulp-different item TABLES, and the
            # barely-trained dummy model's scores are near-degenerate, so
            # rank counts are tie-sensitive across the two roundings (see
            # test_gauc_streamed_matches_full_score_path)
            tol = 2e-3 if k in ("gauc", "auc") else 1e-6
            assert abs(v - res_host[section][k]) < tol, (section, k, v, res_host[section][k])
            assert abs(v - res_tiled[section][k]) < tol, (section, k, v, res_tiled[section][k])


@pytest.mark.parametrize("split_mode", ["combine", "average"])
def test_multihead_gauc_value_streamed_matches_full(
    synth_dir, tmp_path_factory, split_mode
):
    """Multi-head (prior) GAUC/AUC and VALUE metrics stream too (r5: head-0
    target scores routed through score_items carry the per-head prior
    masks), and must match the full-[B,H,I]-tensor path on the same params.
    'average' additionally checks the counter uses RAW head-0 scores, not
    the fused mean the top-k ranking uses."""
    cfg = make_config(
        synth_dir, loss="prior", eval_num_cats=4, num_prior_head=4,
        medusa_num_layers=1, pred_len=4, split_mode=split_mode,
        metrics=["Recall", "NDCG", "GAUC", "AUC", "MAE", "RMSE", "LogLoss"],
        total_iters=2,
        checkpoint_dir=str(tmp_path_factory.mktemp("mhg")),
    )
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    t.fit(train, None)
    res_stream = t.evaluate(test, load_best_model=False)
    last = res_stream[f"pred_{cfg['eval_pred_len'] - 1}"]
    # head-0 semantics can rank category-masked (-inf) targets below
    # user_len, so multi-head GAUC may go negative — in the full-tensor
    # path too; the contract under test is stream == full
    assert "gauc" in last and last["gauc"] <= 1.0

    # force the legacy full-score path by pretending rec.score is needed
    orig_need = t.collector.register.need
    t.collector.register.need = (
        lambda k: True if k == "rec.score" else orig_need(k)
    )
    try:
        res_full = t.evaluate(test, load_best_model=False)
    finally:
        t.collector.register.need = orig_need
    for section in res_stream:
        for k, v in res_stream[section].items():
            # rank-count metrics tolerate the chunk-vs-full matmul ulp ties
            # (see test_gauc_streamed_matches_full_score_path)
            tol = 5e-4 if k in ("gauc", "auc") else 2e-6
            assert res_full[section][k] == pytest.approx(v, abs=tol), (
                section, k, v, res_full[section][k]
            )


@pytest.mark.slow  # heavy e2e, like the single-head host-table parity test
def test_host_table_multihead_gauc_matches_device(synth_dir, tmp_path_factory):
    """Host-resident item table with a MULTI-HEAD model (the
    HLLM-EBNerd-prior shape): streamed GAUC/AUC + VALUE metrics must match
    the device-table path (r5: target tags flow into the streamed
    target-score fn in host mode too)."""
    from mhrec_tpu.config import Config

    base = dict(
        data_path=synth_dir["data_path"],
        dataset=synth_dir["name"],
        text_path=synth_dir["text_path"],
        model="HLLM", dummy_llm=True,
        dummy_vocab_size=128, dummy_hidden_size=32,
        MAX_ITEM_LIST_LENGTH=6, MAX_TEXT_LENGTH=12,
        train_batch_size=8, eval_batch_size=16, num_negatives=16,
        tag_version="v1",
        loss="prior", eval_num_cats=4, num_prior_head=4,
        medusa_num_layers=1,
        eval_pred_len=2, pred_len=2, topk=[5, 10],
        metrics=["Recall", "NDCG", "GAUC", "AUC", "MAE", "LogLoss"],
        total_iters=2, eval_interval=100,
        eval_item_chunk_size=64,
        checkpoint_dir=str(tmp_path_factory.mktemp("host_mh")),
    )

    def run(**over):
        cfg = Config(
            config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
            config_dict={**base, **over},
        ).finalize()
        data = InteractionData(cfg).build()
        train, _, test = build_dataloader(cfg, data)
        t = Trainer(cfg, data)
        t.setup_model()
        t.fit(train, None)
        return t.evaluate(test, load_best_model=False)

    res_dev = run(host_item_table=False)
    res_host = run(host_item_table=True)
    assert res_dev.keys() == res_host.keys()
    keys = set().union(*(set(v) for v in res_dev.values()))
    assert {"gauc", "auc", "mae", "logloss"} <= keys, keys
    for section in res_dev:
        for k, v in res_dev[section].items():
            tol = 2e-3 if k in ("gauc", "auc") else 1e-6
            assert abs(v - res_host[section][k]) < tol, (
                section, k, v, res_host[section][k]
            )
