"""One-off: end-to-end train-step timing of the fused STU kernel (v3)
vs the XLA path, at the two shapes that matter (BASELINE.md):

* size4 / Pixel8M protocol: L=50, 16L/1024d/16h, bs 64, 8192 negs
* merrec protocol shape:    L=400, 8L/512d/8h,  bs 32, 4096 negs

Honest timing via checksum-forced sync.
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
    L = config["MAX_ITEM_LIST_LENGTH"]
    data = InMemoryInteractionData(
        num_users=4096, num_items=int(overrides.get("_items", 200_000)),
        seq_len=L * 2 + 16, eval_pred_len=config["eval_pred_len"],
        max_item_list_length=L, seed=0,
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


MERREC = dict(
    MAX_ITEM_LIST_LENGTH=400, pred_len=1, eval_pred_len=1,
    train_batch_size=32, num_negatives=4096, n_layers=8, n_heads=8,
    item_embedding_size=512, hstu_embedding_size=512, _items=100_000,
)

if __name__ == "__main__":
    cases = {
        "size4_xla": {"attn_impl": "xla"},
        "size4_fused": {"attn_impl": "fused"},
        "merrec_xla": {**MERREC, "attn_impl": "xla"},
        "merrec_pallas_v2": {**MERREC, "attn_impl": "pallas"},
        "merrec_fused": {**MERREC, "attn_impl": "fused"},
    }
    out = {}
    for name, ov in cases.items():
        try:
            out[name] = round(time_step(ov), 2)
        except Exception as e:
            out[name] = f"ERR {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
