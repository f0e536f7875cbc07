"""End-to-end trajectory parity against the ACTUAL reference implementation.

The reference data layer needs polars (absent here), so the comparison
drives BOTH implementations with identical batches from OUR batcher — a
stronger oracle than separately-sampled runs: with weights copied at init
and the same AdamW hyperparameters, per-step losses and the resulting
retrieval metrics must track each other for the whole run.

Covered (VERDICT r1 next-step #8, reference ``run.py:41-167`` semantics):
  * full HSTU model forward/loss (``hstu.py:631-872``) — not just layers;
  * ~120 optimizer steps in both frameworks (torch AdamW vs optax.adamw);
  * the retrieval eval protocol: corpus embeddings → full-corpus cosine
    scores via the reference ``predict`` (hstu.py:875-1016) → pad-item +
    history suppression → top-k → Recall/NDCG, compared against
    ``Trainer.evaluate`` on the JAX side.

Norm affines: the reference's layer norms are non-learnable ``F.layer_norm``
(hstu.py:221-238); ours are learnable initialized to identity. They are
frozen here via ``freeze_prefix`` so both sides train the same parameter
set and the trajectories are comparable to float tolerance.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

import jax

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.trainer import Trainer

from test_reference_parity import _import_reference_hstu, REF  # noqa: F401


class RefConfig(dict):
    """Reference Config semantics: missing keys read as None."""

    def __getitem__(self, key):
        return self.get(key)


N_LAYERS = 2
STEPS = 120
LR = 1e-3


def _make_setup(synth_dir, tmp_path_factory):
    cfg = Config(
        config_file_list=[
            "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        ],
        config_dict=dict(
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            MAX_ITEM_LIST_LENGTH=12, train_batch_size=16, eval_batch_size=64,
            num_negatives=128, tag_version="v1", n_layers=N_LAYERS, n_heads=2,
            item_embedding_size=32, hstu_embedding_size=32,
            eval_pred_len=2, pred_len=2, topk=[5, 10],
            hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
            total_iters=STEPS, eval_interval=10_000, update_interval=1,
            optim_args={"learning_rate": LR, "weight_decay": 0.0},
            scheduler_args={"type": "constant", "warmup": 0.0},
            # freeze the (reference-non-learnable) norm affines — see module
            # docstring
            freeze_prefix=[
                f"stu_{i}.{n}" for i in range(N_LAYERS)
                for n in ("input_norm", "attn_norm")
            ],
            show_progress=False,
            shard_optimizer_state=False,
            checkpoint_dir=str(tmp_path_factory.mktemp("e2e")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    return cfg, data


def _build_reference_model(ref_hstu, cfg, data):
    refcfg = RefConfig(
        item_embedding_size=cfg["item_embedding_size"],
        hstu_embedding_size=cfg["hstu_embedding_size"],
        MAX_ITEM_LIST_LENGTH=cfg["MAX_ITEM_LIST_LENGTH"],
        pred_len=cfg["pred_len"],
        medusa_lambda=cfg["medusa_lambda"],
        num_segment_head=1, num_prior_head=1,
        head_interaction="multiplicative", medusa_num_layers=0,
        category_by=cfg["category_by"],
        n_layers=cfg["n_layers"], n_heads=cfg["n_heads"],
        hidden_act="silu",
        hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
        loss="nce", neg_sample_by_cat=False, pos_sample_mix_ratio=0.0,
        fix_temp=None, nce_thres=cfg["nce_thres"],
        use_prior_switch_test=False,
        eval_pred_len=cfg["eval_pred_len"],
    )

    class DL:
        item_num = data.item_num

    torch.manual_seed(0)
    return ref_hstu.HSTU(refcfg, DL()).float()


def _copy_params_to_torch(params, ref):
    """Our flax init → the reference model, so both start identically."""
    with torch.no_grad():
        ref.item_embedding.weight.copy_(
            torch.tensor(np.asarray(params["item_embedding"]["embedding"]))
        )
        ref.position_embedding.weight.zero_()
        pos = torch.tensor(np.asarray(params["position_embedding"]["embedding"]))
        ref.position_embedding.weight[: pos.shape[0]].copy_(pos)
        ref.logit_scale.copy_(torch.tensor(float(np.asarray(params["logit_scale"]))))
        for i, layer in enumerate(ref._hstu._attention_layers):
            p = params[f"stu_{i}"]
            layer._uvqk.copy_(torch.tensor(np.asarray(p["uvqk"])))
            layer._o.weight.copy_(torch.tensor(np.asarray(p["o_proj"]["kernel"]).T))
            layer._o.bias.copy_(torch.tensor(np.asarray(p["o_proj"]["bias"])))


@pytest.mark.slow
def test_training_and_eval_trajectory_matches_reference(synth_dir, tmp_path_factory):
    # the reference's all_gather asks torch.distributed for the world size
    # unconditionally (basemodel.py:15) — give it the world-1 gloo group a
    # single-GPU torchrun launch would have created
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29734", world_size=1, rank=0
        )
    ref_hstu = _import_reference_hstu()
    cfg, data = _make_setup(synth_dir, tmp_path_factory)
    train, _, test = build_dataloader(cfg, data)

    trainer = Trainer(cfg, data)
    trainer.setup_model()

    ref = _build_reference_model(ref_hstu, cfg, data)
    _copy_params_to_torch(trainer.state.params, ref)
    ref_opt = torch.optim.AdamW(
        [p for p in ref.parameters() if p.requires_grad],
        lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
    )

    from mhrec_tpu.parallel.mesh import shard_batch

    ours, theirs = [], []
    stream = train.infinite_batches(prefetch=0)
    for step in range(STEPS):
        b = next(stream)

        # --- JAX step
        batch = shard_batch(trainer.mesh, b)
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        ours.append(float(out["loss"]))

        # --- reference step on the SAME batch
        interaction = (
            torch.tensor(b["items"], dtype=torch.long),
            torch.tensor(b["neg_items"], dtype=torch.long),
            torch.tensor(b["masked_index"], dtype=torch.long),
            torch.tensor(np.zeros((len(b["items"]), 0), np.float32)),
        )
        ref_opt.zero_grad()
        model_out = ref(interaction)
        loss = model_out["loss"]
        loss.backward()
        ref_opt.step()
        theirs.append(float(loss))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    # early steps: float-tolerance agreement; late steps: small drift from
    # accumulated reduction-order differences is expected but must stay tiny
    np.testing.assert_allclose(ours[:10], theirs[:10], rtol=2e-3)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2)
    assert ours[-1] < ours[0] and theirs[-1] < theirs[0]  # both learned

    # ---- retrieval eval parity on the trained models -------------------
    result = trainer.evaluate(test, load_best_model=False)
    p_last = f"pred_{cfg['eval_pred_len'] - 1}"

    # reference side: corpus embeddings + predict + the eval protocol
    ref.eval()
    with torch.no_grad():
        all_feat = ref.compute_item_all()
    recall_sum = {k: 0.0 for k in (5, 10)}
    ndcg_sum = {k: 0.0 for k in (5, 10)}
    n_users = 0
    P = cfg["eval_pred_len"]
    with torch.no_grad():
        for batch in test.batches():
            n_real = int(batch["sample_weight"].sum())
            if n_real == 0:
                continue
            seq = torch.tensor(batch["item_seq"][:n_real], dtype=torch.long)
            scores, _, _, _ = ref.predict(seq, None, all_feat, None, None)
            scores = scores.squeeze(1).numpy()  # [B, I] (single head)
            scores[:, 0] = -np.inf
            hr = batch["history_row"]
            hc = batch["history_col"]
            keep = (hc >= 0) & (hr < n_real)
            scores[hr[keep], hc[keep]] = -np.inf
            order = np.argsort(-scores, axis=1)
            # horizon pred_{P-1}: all P target items count (reference
            # collector builds cumulative per-horizon hit rows,
            # collector.py:300-316; Recall = hits/unique-pos,
            # metrics.py:145-238)
            for u in range(n_real):
                tgts = [t for t in batch["item_target"][u, :P] if t != 0]
                npos = len(set(tgts))
                if npos == 0:
                    continue
                for k in (5, 10):
                    topk = order[u, :k]
                    hits = [i for i, it in enumerate(topk) if it in tgts]
                    recall_sum[k] += len(hits) / npos
                    dcg = sum(1.0 / np.log2(i + 2) for i in hits)
                    idcg = sum(1.0 / np.log2(i + 2) for i in range(min(npos, k)))
                    ndcg_sum[k] += dcg / idcg
            n_users += n_real

    for k in (5, 10):
        ref_recall = recall_sum[k] / n_users
        ref_ndcg = ndcg_sum[k] / n_users
        assert result[p_last][f"recall@{k}"] == pytest.approx(ref_recall, abs=0.02), (
            k, result[p_last][f"recall@{k}"], ref_recall
        )
        assert result[p_last][f"ndcg@{k}"] == pytest.approx(ref_ndcg, abs=0.02), (
            k, result[p_last][f"ndcg@{k}"], ref_ndcg
        )


def _build_reference_prior_model(ref_hstu, cfg, data, interaction_mode):
    """Reference HSTU in the PAPER's prior configuration (hstu.py:725-871):
    medusa heads, per-category negatives, prior loss + switch aux heads."""
    C = cfg["eval_num_cats"]
    refcfg = RefConfig(
        item_embedding_size=cfg["item_embedding_size"],
        hstu_embedding_size=cfg["hstu_embedding_size"],
        MAX_ITEM_LIST_LENGTH=cfg["MAX_ITEM_LIST_LENGTH"],
        pred_len=cfg["pred_len"],
        medusa_lambda=cfg["medusa_lambda"],
        num_segment_head=cfg["num_segment_head"],
        num_prior_head=C,
        head_interaction=interaction_mode,
        medusa_num_layers=1,
        category_by="item",
        n_layers=cfg["n_layers"], n_heads=cfg["n_heads"],
        hidden_act="silu",
        hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
        loss="prior", neg_sample_by_cat=True, pos_sample_mix_ratio=0.0,
        fix_temp=None, nce_thres=cfg["nce_thres"],
        prior_switch=cfg["prior_switch"],
        prior_switch_loss_weight=cfg["prior_switch_loss_weight"],
        split_mode="combine",
        # both frameworks default this ON (reference IDNet/hstu.yaml:25,
        # ours overall/ID.yaml) — category-frequency loss weights
        weighted_prior_loss=True,
        int_to_category=[str(i) for i in range(C)],
        use_prior_switch_test=False,
        eval_pred_len=cfg["eval_pred_len"],
    )

    class DL:
        item_num = data.item_num
        category_counts = data.category_counts
        category_to_int = data.category_to_int

    torch.manual_seed(0)
    return ref_hstu.HSTU(refcfg, DL()).float()


def _copy_head_params_to_torch(params, ref, cfg, interaction_mode):
    """Medusa + aux-head weights: our flax init → the reference model."""
    C = cfg["eval_num_cats"]
    S = cfg["num_segment_head"]

    def copy_linear(dst, kernel, bias):
        dst.weight.copy_(torch.tensor(np.asarray(kernel).T))
        dst.bias.copy_(torch.tensor(np.asarray(bias)))

    with torch.no_grad():
        if interaction_mode == "hierarchical":
            for c in range(C):
                blk = params[f"cat_head_{c}"]["res_0"]["Dense_0"]
                copy_linear(ref.medusa_cat_head[c][0].linear,
                            blk["kernel"], blk["bias"])
                for s in range(S):
                    blk = params[f"seg_head_{c}_{s}"]["res_0"]["Dense_0"]
                    copy_linear(ref.medusa_seg_head[c][s][0].linear,
                                blk["kernel"], blk["bias"])
        else:
            for h in range(S * C):
                blk = params[f"medusa_head_{h}"]["res_0"]["Dense_0"]
                copy_linear(ref.medusa_head[h][0].linear,
                            blk["kernel"], blk["bias"])
        if cfg["prior_switch"]:
            for c in range(C):
                aux = params[f"aux_cat_head_{c}"]
                copy_linear(ref.aux_cat_head[c], aux["kernel"], aux["bias"])


@pytest.mark.slow
@pytest.mark.parametrize("interaction_mode", ["multiplicative", "hierarchical"])
def test_prior_protocol_trajectory_matches_reference(
    synth_dir, tmp_path_factory, interaction_mode
):
    """The PAPER's core contribution end-to-end vs the real torch reference
    (VERDICT r2 #3): medusa heads (multiplicative AND hierarchical),
    per-category negatives, prior loss, switch aux heads — ~100 steps of
    identical batches, then the per-category/outlier retrieval metrics
    through an identical collector pipeline fed by the reference's own
    ``predict`` (hstu.py:725-871, 935-1015; collector.py:241-316)."""
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29735", world_size=1, rank=0
        )
    ref_hstu = _import_reference_hstu()
    STEPS_P = 100
    cfg = Config(
        config_file_list=[
            "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        ],
        config_dict=dict(
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            MAX_ITEM_LIST_LENGTH=12, train_batch_size=32, eval_batch_size=64,
            num_negatives=256, tag_version="v1", n_layers=N_LAYERS, n_heads=2,
            item_embedding_size=32, hstu_embedding_size=32,
            eval_pred_len=2, pred_len=2, topk=[5, 10],
            hidden_dropout_prob=0.0, attn_dropout_prob=0.0,
            loss="prior", neg_sample_by_cat=True, eval_num_cats=4,
            num_prior_head=4, num_segment_head=2,
            head_interaction=interaction_mode, medusa_num_layers=1,
            prior_switch="in", prior_switch_loss_weight=0.1,
            outlier_user_metrics=True,
            total_iters=STEPS_P, eval_interval=10_000, update_interval=1,
            optim_args={"learning_rate": LR, "weight_decay": 0.0},
            scheduler_args={"type": "constant", "warmup": 0.0},
            freeze_prefix=[
                f"stu_{i}.{n}" for i in range(N_LAYERS)
                for n in ("input_norm", "attn_norm")
            ],
            show_progress=False,
            shard_optimizer_state=False,
            checkpoint_dir=str(tmp_path_factory.mktemp("e2e_prior")),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, _, test = build_dataloader(cfg, data)

    trainer = Trainer(cfg, data)
    trainer.setup_model()

    ref = _build_reference_prior_model(ref_hstu, cfg, data, interaction_mode)
    _copy_params_to_torch(trainer.state.params, ref)
    _copy_head_params_to_torch(trainer.state.params, ref, cfg, interaction_mode)
    ref_opt = torch.optim.AdamW(
        [p for p in ref.parameters() if p.requires_grad],
        lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
    )

    from mhrec_tpu.parallel.mesh import shard_batch

    ours, theirs = [], []
    stream = train.infinite_batches(prefetch=0)
    for step in range(STEPS_P):
        b = next(stream)

        batch = shard_batch(trainer.mesh, b)
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        ours.append(float(out["loss"]))

        interaction = (
            torch.tensor(b["items"], dtype=torch.long),
            torch.tensor(b["neg_items"], dtype=torch.long),
            torch.tensor(b["masked_index"], dtype=torch.long),
            # bool: the reference masks with `base_mask & prior_win`
            # (hstu.py:813) — its dataloader ships tag one-hots as ints
            torch.tensor(b["tag_categories"] != 0),
        )
        ref_opt.zero_grad()
        model_out = ref(interaction)
        loss = model_out["loss"]
        loss.backward()
        ref_opt.step()
        theirs.append(float(loss))

    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    np.testing.assert_allclose(ours[:10], theirs[:10], rtol=2e-3)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2)
    assert ours[-1] < ours[0] and theirs[-1] < theirs[0]

    # ---- per-category / outlier retrieval metrics ----------------------
    # reference predict → identical collector+evaluator pipeline → must
    # agree with Trainer.evaluate (our streamed multi-head eval) metric by
    # metric, including the per-category and outlier-user splits
    result = trainer.evaluate(test, load_best_model=False)

    from mhrec_tpu.evaluator import Collector, Evaluator

    ref.eval()
    with torch.no_grad():
        all_feat = ref.compute_item_all()
    item_tags_ci = torch.tensor(
        data.item_tag_matrix[: data.item_num].astype(np.float32)
    ).transpose(0, 1)  # [C, I] (reference trainer.py:824 transpose)
    collector = Collector(cfg)
    evaluator = Evaluator(cfg)
    with torch.no_grad():
        for batch in test.batches():
            n_real = int(batch["sample_weight"].sum())
            if n_real == 0:
                continue
            seq = torch.tensor(batch["item_seq"][:n_real], dtype=torch.long)
            tt = torch.tensor(
                batch["target_tags"][:n_real], dtype=torch.float32
            )
            scores, _, _, _ = ref.predict(seq, None, all_feat, item_tags_ci, tt)
            scores = scores.numpy()
            scores[:, :, 0] = -np.inf
            hr, hc = batch["history_row"], batch["history_col"]
            keep = (hc >= 0) & (hr < n_real)
            scores[hr[keep], :, hc[keep]] = -np.inf
            collector.eval_batch_collect(
                scores=scores,
                positive_i=batch["item_target"][:n_real],
                tag_category=batch["target_tags"][:n_real],
                outlier_users=batch["outlier_users"][:n_real],
            )
    p_last = cfg["eval_pred_len"] - 1
    struct = collector.get_data_struct(p_last)
    ref_metrics = evaluator.evaluate(struct, p_last)
    # evaluator returns SUMS + counts; normalize like the trainer does
    n_users = struct["rec.topk"].shape[0]
    compared = 0
    for key, val in ref_metrics.items():
        if isinstance(val, tuple):
            s, cnt = val
            ref_val = s / max(cnt, 1e-9)
        else:
            ref_val = val / n_users
        ours_val = result[f"pred_{p_last}"].get(key)
        if ours_val is None:
            continue
        assert ours_val == pytest.approx(ref_val, abs=0.02), (
            key, ours_val, ref_val
        )
        compared += 1
    assert compared >= 8  # overall + per-category + outlier recalls/ndcgs
