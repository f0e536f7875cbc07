"""Benchmark: training throughput (examples/s/chip) on real hardware.

Primary metric (unchanged key across rounds): the reference HSTU/Pixel8M
protocol shape (reproduce/HSTU-Pixel8M-base.slurm: size4 = 1024d/16L/16h,
seq 50, batch 64/chip, 8192 sampled negatives, pred_len 8) on a synthetic
corpus sized to one chip's HBM.

Suite (VERDICT r2 #1: record every shape the round's work lands on, not
just size4): merrec protocol shape (L=400 — where the fused STU kernel
wins) and the HLLM ``freeze_item_llm`` protocol train step. Suite rows ride
in the same single JSON line under "suite"; set BENCH_SUITE=0 to skip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N,
   "suite": {...}}

Baseline: the reference repo publishes no throughput numbers (BASELINE.md),
so vs_baseline compares against the previous round's BENCH_r*.json when
present, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def _measure_hstu(overrides, n_short=10, n_long=60):
    """Train-step throughput for an HSTU shape; honest timing (checksum sync:
    block_until_ready on remote-tunneled (axon) arrays can return before
    execution completes, so force a data dependency on every parameter and
    report the MARGINAL cost between a short and a long run, cancelling
    warmup + fetch latency)."""
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.config import Config
    from mhrec_tpu.data.synthetic import InMemoryInteractionData
    from mhrec_tpu.data.trainset import SEQTrainBatcher
    from mhrec_tpu.parallel.mesh import shard_batch
    from mhrec_tpu.trainer import Trainer

    config = Config(
        config_file_list=["overall/ID.yaml", "IDNet/hstu.yaml"],
        config_dict=overrides,
    ).finalize()
    seq_len = config["MAX_ITEM_LIST_LENGTH"]
    data = InMemoryInteractionData(
        num_users=max(4096, 4 * config["train_batch_size"]),
        num_items=overrides["_num_items"],
        seq_len=seq_len * 2 + 2 * config["eval_pred_len"],
        eval_pred_len=config["eval_pred_len"],
        max_item_list_length=seq_len,
        seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    stream = batcher.infinite_batches(prefetch=2)
    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p))
    )

    def run(n):
        t0 = time.time()
        for _ in range(n):
            batch = shard_batch(trainer.mesh, next(stream))
            trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        float(checksum(trainer.state.params))
        return time.time() - t0

    for _ in range(3):  # compile + warm
        batch = shard_batch(trainer.mesh, next(stream))
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
    float(checksum(trainer.state.params))

    t_short = run(n_short)
    t_long = run(n_long)
    step_time = (t_long - t_short) / (n_long - n_short)
    return config["train_batch_size"] / step_time, step_time * 1000.0


def main():
    import jax

    n_devices = jax.local_device_count()
    num_items = int(os.environ.get("BENCH_NUM_ITEMS", 200_000))
    size4 = dict(
        MAX_ITEM_LIST_LENGTH=50,
        pred_len=8,
        eval_pred_len=8,
        train_batch_size=64 * n_devices,
        num_negatives=8192,
        n_layers=16,
        n_heads=16,
        item_embedding_size=1024,
        hstu_embedding_size=1024,
        hidden_dropout_prob=0.2,
        loss="nce",
        total_iters=100,
        seed=2020,
        # row-sparse AdamW on the item table (trainer/sparse_adam.py):
        # dense moments traffic over the corpus-scale table would
        # otherwise dominate the step
        sparse_item_adam=os.environ.get("BENCH_DENSE_ADAM") is None,
        _num_items=num_items,
        # one-off experiments: BENCH_EXTRA_JSON='{"adam_mu_dtype": "bfloat16"}'
        **json.loads(os.environ.get("BENCH_EXTRA_JSON", "{}")),
    )
    if os.environ.get("BENCH_SMALL"):
        size4.update(n_layers=4, n_heads=4, item_embedding_size=128,
                     hstu_embedding_size=128, _num_items=20_000)

    n_short = int(os.environ.get("BENCH_STEPS_SHORT", 10))
    n_long = int(os.environ.get("BENCH_STEPS", 60))
    per_chip, _ = _measure_hstu(size4, n_short, n_long)
    per_chip /= n_devices

    vs_baseline = 1.0
    prior = sorted(glob.glob("BENCH_r*.json"))
    if prior:
        try:
            with open(prior[-1]) as fh:
                prev = json.load(fh)
            if prev.get("value"):
                vs_baseline = per_chip / float(prev["value"])
        except Exception:
            pass

    result = {
        "metric": "hstu_size4_seq50_bs64_neg8192_train_throughput",
        "value": round(per_chip, 2),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs_baseline, 4),
    }

    if os.environ.get("BENCH_SUITE", "1") != "0" and not os.environ.get("BENCH_SMALL"):
        suite = {}
        try:
            # merrec protocol shape (reproduce/HSTU-merrec-prior.slurm:25-60
            # minus the prior machinery): L=400, 8L/512d/8h, bs 32 — the
            # long-L shape where attn_impl auto selects the fused STU kernel
            merrec = dict(
                MAX_ITEM_LIST_LENGTH=400, pred_len=1, eval_pred_len=1,
                train_batch_size=32 * n_devices, num_negatives=4096,
                n_layers=8, n_heads=8, item_embedding_size=512,
                hstu_embedding_size=512, hidden_dropout_prob=0.2,
                loss="nce", total_iters=100, seed=2020,
                sparse_item_adam=True, _num_items=100_000,
            )
            ex_s, ms = _measure_hstu(merrec, 5, 30)
            suite["hstu_merrec_seq400_bs32_neg4096"] = {
                "value": round(ex_s / n_devices, 2),
                "unit": "examples/s/chip", "step_ms": round(ms, 2),
            }
        except Exception as e:  # never fail the primary metric
            suite["hstu_merrec_seq400_bs32_neg4096"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            from bench_hllm_protocol import bench_freeze

            row = bench_freeze(22)
            suite[row.pop("metric")] = row
        except Exception as e:
            suite["hllm_train_freeze_item"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        result["suite"] = suite

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
