"""Baseline models: SASRec / ComiRec / REMI — math checks and train+eval
smoke through the shared Trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.models.idnet.comirec import causal_interest_state, routing_regularization
from mhrec_tpu.trainer import Trainer
from tests.conftest import make_config


def test_causal_interest_matches_naive_windows():
    """Cumsum extraction == reference's per-window masked softmax."""
    rng = np.random.default_rng(0)
    B, L, K, D = 3, 12, 4, 8
    logits = rng.normal(size=(B, L, K)).astype(np.float32)
    out = rng.normal(size=(B, L, D)).astype(np.float32)
    mask = rng.random((B, L)) > 0.3

    interests, S1, S2, cnt = causal_interest_state(
        jnp.asarray(logits), jnp.asarray(out), jnp.asarray(mask)
    )
    interests = np.asarray(interests)

    for b in range(B):
        for l in range(L):
            idx = [j for j in range(l + 1) if mask[b, j]]
            for k in range(K):
                if not idx:
                    expected = np.zeros(D)
                else:
                    w = logits[b, idx, k]
                    w = np.exp(w - w.max())
                    w = w / w.sum()
                    expected = (w[:, None] * out[b, idx]).sum(0)
                np.testing.assert_allclose(
                    interests[b, l, k], expected, rtol=1e-4, atol=1e-5
                )


def test_routing_regularization_matches_naive():
    rng = np.random.default_rng(1)
    B, L, K, D = 2, 10, 4, 16
    logits = rng.normal(size=(B, L, K)).astype(np.float32)
    out = rng.normal(size=(B, L, D)).astype(np.float32)
    mask = rng.random((B, L)) > 0.25
    _, S1, S2, cnt = causal_interest_state(
        jnp.asarray(logits), jnp.asarray(out), jnp.asarray(mask)
    )
    rr = np.asarray(routing_regularization(S1, S2, cnt, D))
    for b in range(B):
        for l in range(L):
            idx = [j for j in range(l + 1) if mask[b, j]]
            if not idx:
                expected = 0.0
            else:
                variances = []
                for k in range(K):
                    w = logits[b, idx, k]
                    w = np.exp(w - w.max())
                    A = w / w.sum()
                    dev = A - A.mean()
                    variances.append((dev @ dev) / D)
                expected = float(np.sum(np.square(variances)))
            np.testing.assert_allclose(rr[b, l], expected, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize(
    "files,overrides",
    [
        (["IDNet/sasrec.yaml"], dict(model="SASRec", embedding_size=32, pred_len=1)),
        (["IDNet/comirec.yaml"], dict(model="ComiRec", pred_len=1, eval_pred_len=4)),
        (["IDNet/remi.yaml"], dict(model="REMI", pred_len=1, eval_pred_len=4)),
    ],
)
def test_baseline_train_eval_smoke(synth_dir, tmp_path_factory, files, overrides):
    from mhrec_tpu.config import Config

    base = dict(
        data_path=synth_dir["data_path"],
        dataset=synth_dir["name"],
        text_path=synth_dir["text_path"],
        MAX_ITEM_LIST_LENGTH=20,
        train_batch_size=8,
        eval_batch_size=32,
        num_negatives=64,
        tag_version="v1",
        n_layers=2,
        n_heads=2,
        item_embedding_size=32,
        hstu_embedding_size=32,
        eval_pred_len=4,
        topk=[5, 10],
        total_iters=3,
        eval_interval=100,
        checkpoint_dir=str(tmp_path_factory.mktemp("b")),
    )
    base.update(overrides)
    cfg = Config(
        config_file_list=files + ["overall/ID.yaml"] ,
        config_dict=base,
    ).finalize()
    data = InteractionData(cfg).build()
    train, valid, test = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t.setup_model()
    stats = t.fit(train, None)
    assert stats["iters"] == 3
    res = t.evaluate(test, load_best_model=False)
    last = f"pred_{cfg['eval_pred_len'] - 1}"
    assert "recall@10" in res[last]
