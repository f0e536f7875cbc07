"""Benchmark: HSTU training throughput (examples/s/chip) on real hardware.

Run shape mirrors the reference HSTU/Pixel8M protocol
(reproduce/HSTU-Pixel8M-base.slurm: size4 = 1024d/16L/16h, seq 50, batch
64/chip, 8192 sampled negatives, pred_len 8) on a synthetic corpus sized to
one chip's HBM. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

Baseline: the reference repo publishes no throughput numbers
(BASELINE.md), so vs_baseline compares against the previous round's
BENCH_r*.json when present, else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.config import Config
    from mhrec_tpu.data.synthetic import InMemoryInteractionData
    from mhrec_tpu.data.trainset import SEQTrainBatcher
    from mhrec_tpu.trainer import Trainer

    n_devices = jax.local_device_count()
    seq_len, pred_len = 50, 8
    batch_size = 64 * n_devices
    num_items = int(os.environ.get("BENCH_NUM_ITEMS", 200_000))
    n_layers, n_heads, dim = 16, 16, 1024
    if os.environ.get("BENCH_SMALL"):
        n_layers, n_heads, dim, num_items = 4, 4, 128, 20_000

    config = Config(
        config_file_list=["overall/ID.yaml", "IDNet/hstu.yaml"],
        config_dict=dict(
            MAX_ITEM_LIST_LENGTH=seq_len,
            pred_len=pred_len,
            eval_pred_len=8,
            train_batch_size=batch_size,
            num_negatives=8192,
            n_layers=n_layers,
            n_heads=n_heads,
            item_embedding_size=dim,
            hstu_embedding_size=dim,
            hidden_dropout_prob=0.2,
            loss="nce",
            total_iters=100,
            seed=2020,
            # row-sparse AdamW on the item table (trainer/sparse_adam.py):
            # dense moments traffic over the corpus-scale table would
            # otherwise dominate the step
            sparse_item_adam=os.environ.get("BENCH_DENSE_ADAM") is None,
            # one-off experiments: BENCH_EXTRA_JSON='{"adam_mu_dtype": "bfloat16"}'
            **json.loads(os.environ.get("BENCH_EXTRA_JSON", "{}")),
        ),
    ).finalize()

    data = InMemoryInteractionData(
        num_users=max(4096, 4 * batch_size),
        num_items=num_items,
        seq_len=seq_len * 2 + 2 * 8,
        eval_pred_len=8,
        max_item_list_length=seq_len,
        seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()

    stream = batcher.infinite_batches(prefetch=2)
    from mhrec_tpu.parallel.mesh import shard_batch

    # NOTE: block_until_ready on remote-tunneled (axon) arrays can return
    # before execution completes, so the benchmark forces a data dependency
    # on every parameter via a checksum fetch and reports the MARGINAL cost
    # between a short and a long run (cancels warmup + fetch latency).
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

    n_short = int(os.environ.get("BENCH_STEPS_SHORT", 10))
    n_long = int(os.environ.get("BENCH_STEPS", 60))
    t_short = run(n_short)
    t_long = run(n_long)
    step_time = (t_long - t_short) / (n_long - n_short)

    examples_per_s = batch_size / step_time
    per_chip = examples_per_s / n_devices

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

    print(
        json.dumps(
            {
                "metric": "hstu_size4_seq50_bs64_neg8192_train_throughput",
                "value": round(per_chip, 2),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
