"""True multi-process (multi-controller) execution tests.

Spawns 2 separate Python processes, each owning 2 virtual CPU devices,
connected with ``jax.distributed`` — the CPU stand-in for a 2-host TPU pod
(TPU equivalent of the reference's torchrun/NCCL multi-rank launch,
``/root/reference/code/run.py:170-207``). Each process builds HALF the
global batch (host-strided locations, ``train_batch_size`` is GLOBAL) and
the jit train step runs as one SPMD program over the 4-device mesh.

Parity oracle: a single-process run that COMPOSES the identical per-host
batch halves (same per-host batchers, rows concatenated in process order)
must produce the same losses, parameters, and eval metrics — any
divergence means the multi-process data/negative/optimizer semantics broke.
Covers the prior loss (per-category negatives + switch heads) and the
row-sparse item Adam with cross-host duplicate-row dedup
(sparse_adam.dedup_touched_rows).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData
from mhrec_tpu.data.evalset import SeqEvalBatcher
from mhrec_tpu.data.trainset import SEQTrainBatcher, _prefetch_iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
DEV_PER_PROC = 2
PORT = 12931

BASE_OVERRIDES = dict(
    MAX_ITEM_LIST_LENGTH=12,
    train_batch_size=16,
    eval_batch_size=16,
    num_negatives=64,
    tag_version="v1",
    n_layers=2,
    n_heads=2,
    item_embedding_size=32,
    hstu_embedding_size=32,
    eval_pred_len=2,
    pred_len=2,
    topk=[5, 10],
    total_iters=6,
    eval_interval=100,           # no mid-fit eval; one test eval at the end
    update_interval=1,           # final_loss in the dump = the last step's
    loss="prior",
    eval_num_cats=4,
    num_prior_head=4,
    num_segment_head=1,
    medusa_num_layers=1,
    prior_switch="in",
    prior_switch_loss_weight=0.1,
    use_prior_switch_test=True,
    sparse_item_adam=True,
    show_progress=False,
)


def _cli_args(meta, ckpt_dir, result_path, extra=()):
    args = [
        "--config_file", "IDNet/hstu-size1.yaml", "overall/ID.yaml",
        "IDNet/hstu.yaml", "--",
        "--data_path", meta["data_path"], "--dataset", meta["name"],
        "--text_path", meta["text_path"],
        "--checkpoint_dir", ckpt_dir,
        "--result_json_path", result_path,
    ]
    kv = dict(BASE_OVERRIDES)
    kv.update(extra)
    for k, v in kv.items():
        args += [f"--{k}", json.dumps(v) if isinstance(v, (list, bool)) else str(v)]
    return args


def _spawn_workers(meta, tmp, extra=()):
    result_path = os.path.join(tmp, "mp_result")
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        cmd = [
            sys.executable, "-m", "mhrec_tpu.run",
            "--multihost",
            "--coordinator_address", f"localhost:{PORT}",
            "--num_processes", str(N_PROC),
            "--process_id", str(pid),
        ] + _cli_args(meta, os.path.join(tmp, "ckpt"), result_path, extra)
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(N_PROC):
        with open(f"{result_path}.{pid}.json") as f:
            results.append(json.load(f))
    return results


class ComposedBatcher:
    """Single-process oracle: concatenates the per-host batch halves the two
    worker processes would build, in process order — exactly the global
    batch the multi-process SPMD step consumes."""

    def __init__(self, config, dataload, num_hosts=N_PROC):
        self.parts = [
            SEQTrainBatcher(config, dataload, host_id=h, num_hosts=num_hosts)
            for h in range(num_hosts)
        ]

    def infinite_batches(self, prefetch: int = 2):
        def gen():
            streams = [p.infinite_batches(prefetch=0) for p in self.parts]
            while True:
                parts = [next(s) for s in streams]
                yield {
                    k: np.concatenate([b[k] for b in parts], axis=0)
                    for k in parts[0]
                }

        return _prefetch_iterator(gen(), prefetch)


@pytest.mark.slow
def test_two_process_train_matches_composed_single_process(synth_dir, tmp_path):
    from mhrec_tpu.trainer import Trainer

    mp_results = _spawn_workers(synth_dir, str(tmp_path))
    # both processes must report the same replicated state
    assert mp_results[0]["final_loss"] == pytest.approx(
        mp_results[1]["final_loss"], rel=1e-6
    )
    assert mp_results[0]["param_checksum"] == pytest.approx(
        mp_results[1]["param_checksum"], rel=1e-6
    )

    # single-process oracle with composed per-host batches + forced dedup
    cfg = Config(
        config_file_list=[
            "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        ],
        config_dict=dict(
            BASE_OVERRIDES,
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            checkpoint_dir=str(tmp_path / "ref_ckpt"),
            sparse_adam_global_dedup=True,
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    trainer = Trainer(cfg, data)
    # same device partitioning as the 2×2 workers (4-way data sharding) so
    # reduction orders — and therefore near-tie top-k picks — line up
    import jax

    from mhrec_tpu.parallel.mesh import make_mesh

    trainer.mesh = make_mesh(jax.devices()[: N_PROC * DEV_PER_PROC])
    trainer.setup_model()
    composed = ComposedBatcher(cfg, data)
    stats = trainer.fit(composed, None)

    assert stats["loss"] == pytest.approx(mp_results[0]["final_loss"], rel=2e-4)

    import jax.numpy as jnp

    checksum = float(jax.jit(
        lambda p: sum(jnp.abs(x).astype(jnp.float32).sum()
                      for x in jax.tree.leaves(p))
    )(trainer.state.params))
    assert checksum == pytest.approx(mp_results[0]["param_checksum"], rel=1e-5)

    # eval parity: same trained params → identical reduced metrics, however
    # the users are striped over hosts
    test_batcher = SeqEvalBatcher(cfg, data, phase="test")
    result = trainer.evaluate(test_batcher, load_best_model=False)
    mp_metrics = mp_results[0]["result"]
    for section, metrics in result.items():
        for k, v in metrics.items():
            # entropy is tie-sensitive (a near-tie at rank k swaps the
            # recommended item's tags); ranking metrics must match tightly
            tol = 2e-3 if k.startswith("Entropy") else 3e-5
            assert mp_metrics[section][k] == pytest.approx(v, abs=tol), (
                section, k, v, mp_metrics[section][k]
            )


@pytest.mark.slow
def test_two_process_gauc_matches_composed(synth_dir, tmp_path):
    """Streamed single-head GAUC under 2 true processes must equal the
    composed single-process value (VERDICT r3 #5: the reference raises
    here; the tuple-form metric + per-chunk rank counting make the
    reduction exact on any process count)."""
    from mhrec_tpu.trainer import Trainer

    extra = dict(loss="nce", metrics=[
        "Recall", "NDCG", "GAUC", "AUC", "MAE", "RMSE", "LogLoss"])
    mp_results = _spawn_workers(synth_dir, str(tmp_path), extra=extra)

    cfg = Config(
        config_file_list=[
            "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        ],
        config_dict=dict(
            BASE_OVERRIDES,
            **extra,
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            checkpoint_dir=str(tmp_path / "ref_ckpt_gauc"),
            sparse_adam_global_dedup=True,
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    trainer = Trainer(cfg, data)
    import jax

    from mhrec_tpu.parallel.mesh import make_mesh

    trainer.mesh = make_mesh(jax.devices()[: N_PROC * DEV_PER_PROC])
    trainer.setup_model()
    trainer.fit(ComposedBatcher(cfg, data), None)

    result = trainer.evaluate(
        SeqEvalBatcher(cfg, data, phase="test"), load_best_model=False
    )
    mp_metrics = mp_results[0]["result"]
    for section, metrics in result.items():
        for k, v in metrics.items():
            # gauc is tie-sensitive at the score ulp level (self-item
            # equality count); everything else matches tightly
            tol = 2e-3 if k.startswith("Entropy") else (
                5e-4 if k in ("gauc", "auc") else 3e-5
            )
            assert mp_metrics[section][k] == pytest.approx(v, abs=tol), (
                section, k, v, mp_metrics[section][k]
            )
    keys = set().union(*(set(v) for v in result.values()))
    assert {"gauc", "auc", "mae", "rmse", "logloss"} <= keys, (
        "GAUC/VALUE metrics missing from eval sections", keys)


@pytest.mark.slow
def test_two_process_multihead_gauc_matches_composed(synth_dir, tmp_path):
    """Multi-head (prior) streamed GAUC/AUC + VALUE metrics under 2 true
    processes must equal the composed single-process values (r5: head-0
    target scores routed through score_items removed the multi-head
    single-process restriction). BASE_OVERRIDES is already the prior
    config (4 prior heads + switch), so no loss override here."""
    from mhrec_tpu.trainer import Trainer

    extra = dict(metrics=[
        "Recall", "NDCG", "GAUC", "AUC", "MAE", "RMSE", "LogLoss"])
    mp_results = _spawn_workers(synth_dir, str(tmp_path), extra=extra)

    cfg = Config(
        config_file_list=[
            "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        ],
        config_dict=dict(
            BASE_OVERRIDES,
            **extra,
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            checkpoint_dir=str(tmp_path / "ref_ckpt_mh_gauc"),
            sparse_adam_global_dedup=True,
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    trainer = Trainer(cfg, data)
    import jax

    from mhrec_tpu.parallel.mesh import make_mesh

    trainer.mesh = make_mesh(jax.devices()[: N_PROC * DEV_PER_PROC])
    trainer.setup_model()
    trainer.fit(ComposedBatcher(cfg, data), None)

    result = trainer.evaluate(
        SeqEvalBatcher(cfg, data, phase="test"), load_best_model=False
    )
    mp_metrics = mp_results[0]["result"]
    for section, metrics in result.items():
        for k, v in metrics.items():
            tol = 2e-3 if k.startswith("Entropy") else (
                5e-4 if k in ("gauc", "auc") else 3e-5
            )
            assert mp_metrics[section][k] == pytest.approx(v, abs=tol), (
                section, k, v, mp_metrics[section][k]
            )
    keys = set().union(*(set(v) for v in result.values()))
    assert {"gauc", "auc", "mae", "rmse", "logloss"} <= keys, (
        "GAUC/VALUE metrics missing from eval sections", keys)


HLLM_OVERRIDES = dict(
    model="HLLM",
    dummy_llm=True,
    dummy_vocab_size=128,
    dummy_hidden_size=32,
    MAX_ITEM_LIST_LENGTH=6,
    MAX_TEXT_LENGTH=12,
    train_batch_size=16,
    eval_batch_size=16,
    num_negatives=16,
    tag_version="v1",
    eval_pred_len=2,
    pred_len=2,
    topk=[5],
    total_iters=4,
    eval_interval=100,
    update_interval=1,
    show_progress=False,
)


def _hllm_cli_args(meta, ckpt_dir, result_path):
    args = [
        "--config_file", "overall/LLM.yaml", "HLLM/HLLM.yaml", "--",
        "--data_path", meta["data_path"], "--dataset", meta["name"],
        "--text_path", meta["text_path"],
        "--checkpoint_dir", ckpt_dir,
        "--result_json_path", result_path,
    ]
    for k, v in HLLM_OVERRIDES.items():
        args += [f"--{k}", json.dumps(v) if isinstance(v, (list, bool)) else str(v)]
    return args


@pytest.mark.slow
def test_two_process_hllm_dense_matches_composed(synth_dir, tmp_path):
    """HLLM (dense dummy towers) across 2 processes: exercises the
    multi-host text batcher, the sharded corpus-embedding pass
    (shard_identical + host allgather), and HLLM eval — against the
    composed single-process oracle."""
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.data.textset import TextSEQTrainBatcher
    from mhrec_tpu.trainer import Trainer

    result_path = os.path.join(str(tmp_path), "mp_hllm")
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        cmd = [
            sys.executable, "-m", "mhrec_tpu.run",
            "--multihost",
            "--coordinator_address", f"localhost:{PORT + 4}",
            "--num_processes", str(N_PROC),
            "--process_id", str(pid),
        ] + _hllm_cli_args(synth_dir, os.path.join(str(tmp_path), "ck"), result_path)
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(N_PROC):
        with open(f"{result_path}.{pid}.json") as f:
            results.append(json.load(f))
    assert results[0]["final_loss"] == pytest.approx(results[1]["final_loss"], rel=1e-6)
    assert results[0]["result"] == results[1]["result"]

    # composed single-process oracle
    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            HLLM_OVERRIDES,
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            checkpoint_dir=str(tmp_path / "ref_ck"),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    trainer = Trainer(cfg, data)

    from mhrec_tpu.parallel.mesh import make_mesh

    trainer.mesh = make_mesh(jax.devices()[: N_PROC * DEV_PER_PROC])
    trainer.setup_model()

    class ComposedText(ComposedBatcher):
        def __init__(self, config, dataload):
            self.parts = [
                TextSEQTrainBatcher(config, dataload, host_id=h, num_hosts=N_PROC)
                for h in range(N_PROC)
            ]

    stats = trainer.fit(ComposedText(cfg, data), None)
    assert stats["loss"] == pytest.approx(results[0]["final_loss"], rel=5e-4)

    test_batcher = SeqEvalBatcher(cfg, data, phase="test")
    result = trainer.evaluate(test_batcher, load_best_model=False)
    for section, metrics in result.items():
        for k, v in metrics.items():
            tol = 2e-3 if k.startswith("Entropy") else 5e-5
            assert results[0]["result"][section][k] == pytest.approx(v, abs=tol), (
                section, k, v, results[0]["result"][section][k]
            )


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["packed", "image"])
def test_two_process_hllm_packed_and_image_match_composed(
    synth_dir, tmp_path, variant
):
    """VERDICT r2 #8: the chunked first-fit packer and the vision capacity
    arrays under true multi-controller striding. packed: per-host [C, chunk]
    blocks must be lockstep-shaped and the pre-split pos/neg emb slots must
    reassemble the global gather order; image: per-item pixel-patch arrays
    ride the same host-blocked concat as the token rows. Oracle = composed
    single-process run on the identical per-host batch halves."""
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.data.textset import TextSEQTrainBatcher
    from mhrec_tpu.trainer import Trainer

    extra = dict(HLLM_OVERRIDES)
    port_off = 8
    if variant == "packed":
        extra.update(packed_item_tower=True, pack_chunk=64, total_iters=4)
    else:
        from PIL import Image

        from tests.test_vision import _write_tiny_qwen2vl_ckpt

        port_off = 12
        ckpt = str(tmp_path / "qwen2vl")
        _write_tiny_qwen2vl_ckpt(ckpt)
        image_dir = tmp_path / "images"
        ds_dir = image_dir / synth_dir["name"]
        ds_dir.mkdir(parents=True)
        rng = np.random.default_rng(5)
        for i in range(0, 16):
            Image.fromarray(
                rng.integers(0, 255, (20, 20, 3), np.uint8), "RGB"
            ).save(ds_dir / f"i{i}.jpg")
        extra.update(
            dummy_llm=False, item_pretrain_dir=ckpt, user_pretrain_dir=ckpt,
            use_image=True, image_dir=str(image_dir),
            img_height=16, img_width=16, MAX_TEXT_LENGTH=16,
            MAX_ITEM_LIST_LENGTH=4, train_batch_size=8, eval_batch_size=8,
            num_negatives=8, total_iters=2,
        )

    result_path = os.path.join(str(tmp_path), f"mp_{variant}")
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        args = [
            "--config_file", "overall/LLM.yaml", "HLLM/HLLM.yaml", "--",
            "--data_path", synth_dir["data_path"], "--dataset", synth_dir["name"],
            "--text_path", synth_dir["text_path"],
            "--checkpoint_dir", os.path.join(str(tmp_path), "ck"),
            "--result_json_path", result_path,
        ]
        for k, v in extra.items():
            args += [f"--{k}", json.dumps(v) if isinstance(v, (list, bool)) else str(v)]
        cmd = [
            sys.executable, "-m", "mhrec_tpu.run",
            "--multihost",
            "--coordinator_address", f"localhost:{PORT + port_off}",
            "--num_processes", str(N_PROC),
            "--process_id", str(pid),
        ] + args
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for pid in range(N_PROC):
        with open(f"{result_path}.{pid}.json") as f:
            results.append(json.load(f))
    assert results[0]["final_loss"] == pytest.approx(results[1]["final_loss"], rel=1e-6)
    assert results[0]["result"] == results[1]["result"]

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            extra,
            data_path=synth_dir["data_path"], dataset=synth_dir["name"],
            text_path=synth_dir["text_path"],
            checkpoint_dir=str(tmp_path / "ref_ck"),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    trainer = Trainer(cfg, data)

    from mhrec_tpu.parallel.mesh import make_mesh

    trainer.mesh = make_mesh(jax.devices()[: N_PROC * DEV_PER_PROC])
    trainer.setup_model()

    class ComposedText(ComposedBatcher):
        def __init__(self, config, dataload):
            self.parts = [
                TextSEQTrainBatcher(config, dataload, host_id=h, num_hosts=N_PROC)
                for h in range(N_PROC)
            ]

    stats = trainer.fit(ComposedText(cfg, data), None)
    assert stats["loss"] == pytest.approx(results[0]["final_loss"], rel=5e-4)

    test_batcher = SeqEvalBatcher(cfg, data, phase="test")
    result = trainer.evaluate(test_batcher, load_best_model=False)
    for section, metrics in result.items():
        for k, v in metrics.items():
            tol = 2e-3 if k.startswith("Entropy") else 5e-5
            assert results[0]["result"][section][k] == pytest.approx(v, abs=tol), (
                section, k, v, results[0]["result"][section][k]
            )
