"""One-off: ablation timing of the HSTU size4 train step on the real chip.

Varies one knob at a time to attribute step time: negatives, layers,
horizons, optimizer. Honest timing via checksum-forced sync (bench.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mhrec_tpu.config import Config
from mhrec_tpu.data.synthetic import InMemoryInteractionData
from mhrec_tpu.data.trainset import SEQTrainBatcher
from mhrec_tpu.parallel.mesh import shard_batch
from mhrec_tpu.trainer import Trainer


def time_step(overrides, steps=30):
    base = dict(
        MAX_ITEM_LIST_LENGTH=50, pred_len=8, eval_pred_len=8,
        train_batch_size=64, num_negatives=8192, n_layers=16, n_heads=16,
        item_embedding_size=1024, hstu_embedding_size=1024,
        hidden_dropout_prob=0.2, loss="nce", total_iters=100, seed=2020,
        sparse_item_adam=True,
    )
    base.update(overrides)
    config = Config(
        config_file_list=["overall/ID.yaml", "IDNet/hstu.yaml"],
        config_dict=base,
    ).finalize()
    data = InMemoryInteractionData(
        num_users=4096, num_items=200_000, seq_len=50 * 2 + 16,
        eval_pred_len=8, max_item_list_length=50, seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    stream = batcher.infinite_batches(prefetch=2)
    checksum = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)))

    def run(n):
        t0 = time.time()
        for _ in range(n):
            batch = shard_batch(trainer.mesh, next(stream))
            trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        float(checksum(trainer.state.params))
        return time.time() - t0

    for _ in range(3):
        batch = shard_batch(trainer.mesh, next(stream))
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
    float(checksum(trainer.state.params))
    t_short = run(5)
    t_long = run(steps)
    return (t_long - t_short) / (steps - 5) * 1000.0


if __name__ == "__main__":
    cases = {
        "baseline": {},
        "neg1024": {"num_negatives": 1024},
        "layers4": {"n_layers": 4},
        "pred1": {"pred_len": 1, "eval_pred_len": 8},
        "dense_adam": {"sparse_item_adam": False},
        "no_dropout": {"hidden_dropout_prob": 0.0},
    }
    out = {}
    for name, ov in cases.items():
        try:
            out[name] = round(time_step(ov), 2)
        except Exception as e:  # keep going
            out[name] = f"ERR {type(e).__name__}: {e}"[:120]
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
