"""Training-trajectory coincidence harness (the banded-NCE validation
methodology, BASELINE r1): run the SAME data/seed/shape under two config
variants for N real steps and print the loss at checkpoints — used to show
that a storage/kernel change (e.g. ``item_table_dtype: bfloat16``,
VERDICT r3 #4) is a representation change, not a training change.

Usage:
    python tools/traj_compare.py --b '{"item_table_dtype": "bfloat16"}' \
        [--a '{}'] [--steps 400] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(overrides, steps, checkpoints):
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
        num_categories=0,
        seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    stream = batcher.infinite_batches(prefetch=2)
    losses = {}
    t0 = time.time()
    for it in range(1, steps + 1):
        batch = shard_batch(trainer.mesh, next(stream))
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        if it in checkpoints:
            losses[it] = float(out["loss"])
    wall = time.time() - t0
    return losses, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="{}")
    ap.add_argument("--b", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    from mhrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    base = dict(
        MAX_ITEM_LIST_LENGTH=50, pred_len=8, eval_pred_len=8,
        train_batch_size=64, num_negatives=8192, n_layers=16, n_heads=16,
        item_embedding_size=1024, hstu_embedding_size=1024,
        hidden_dropout_prob=0.2, loss="nce", total_iters=args.steps,
        seed=2020, sparse_item_adam=True, _num_items=200_000,
    )
    if args.small:
        base.update(n_layers=2, n_heads=2, item_embedding_size=64,
                    hstu_embedding_size=64, num_negatives=256,
                    train_batch_size=16, _num_items=5_000)
    ckpts = sorted({args.steps // 4, args.steps // 2,
                    3 * args.steps // 4, args.steps})
    out = {}
    for name, ov in (("a", json.loads(args.a)), ("b", json.loads(args.b))):
        losses, wall = run({**base, **ov}, args.steps, ckpts)
        out[name] = {"overrides": ov, "loss": losses,
                     "wall_s": round(wall, 1)}
        print(f"[{name}] {json.dumps(out[name])}", flush=True)
    max_gap = max(
        abs(out["a"]["loss"][s] - out["b"]["loss"][s]) for s in ckpts
    )
    scale = max(abs(v) for v in out["a"]["loss"].values())
    print(json.dumps({
        "steps": args.steps, "checkpoints": ckpts,
        "max_abs_gap": round(max_gap, 4), "loss_scale": round(scale, 2),
        "coincide": max_gap < 0.02 * max(1.0, scale),
    }))


if __name__ == "__main__":
    main()
