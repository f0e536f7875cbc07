"""HLLM two-tower train-step benchmark on the real chip.

Shape = the BASELINE.md HLLM row: random-init TinyLlama-ish towers
(12L/1024d/16h, GQA 4 kv heads, vocab 32k), seq 10, text 64 tokens/item,
batch 16, 512 negatives, remat on — the reference HLLM/Pixel8M protocol
(reproduce/HLLM-Pixel8M-base.slurm) with local towers. Random init = a
checkpoint dir holding only config.json (load_pretrained_towers keeps the
random weights when no state dict exists).

Usage: python tools/bench_hllm.py [--dense] [--steps N]
Run from the repo root (sys.path[0] must stay the script dir's parent via
cwd; we insert the repo root explicitly so `python tools/bench_hllm.py`
works without touching PYTHONPATH — the axon plugin rides the ambient one).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tower_dir(n_layers=12, hidden=1024, heads=16, kv_heads=4,
                   vocab=32000, intermediate=2816):
    d = tempfile.mkdtemp(prefix="mhrec_bench_tower_")
    cfg = dict(
        model_type="llama", vocab_size=vocab, hidden_size=hidden,
        intermediate_size=intermediate, num_hidden_layers=n_layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        max_position_embeddings=2048, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    with open(os.path.join(d, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    return d


def main():
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.config import Config
    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset
    from mhrec_tpu.parallel.mesh import shard_batch
    from mhrec_tpu.trainer import Trainer

    packed = "--dense" not in sys.argv
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 20
    steps = max(steps, 10)  # timing is marginal over a 5-step baseline
    remat = sys.argv[sys.argv.index("--remat") + 1] if "--remat" in sys.argv else "full"

    tmp = tempfile.mkdtemp(prefix="mhrec_bench_hllm_")
    meta = generate_synthetic_dataset(tmp, num_users=2048, num_items=5000, seed=0)
    tower = make_tower_dir()

    config = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=tmp, dataset=meta["name"], text_path=meta["text_path"],
            item_pretrain_dir=tower, user_pretrain_dir=tower,
            MAX_ITEM_LIST_LENGTH=10, MAX_TEXT_LENGTH=64,
            train_batch_size=16, num_negatives=512,
            gradient_checkpointing=remat != "off",
            remat_policy=remat if remat != "off" else "full",
            packed_item_tower=packed,
            tag_version="v1", eval_pred_len=1, pred_len=1, topk=[5, 10],
            total_iters=100, seed=2020,
        ),
    ).finalize()

    data = InteractionData(config).build()
    train, _, _ = build_dataloader(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()

    # device-compute timing: reuse one host batch (host batching is
    # measured separately; the training loop overlaps it via prefetch)
    b0 = next(iter(train.epoch_batches(0)))
    one = {k: jnp.asarray(v) for k, v in b0.items()}

    def stream():
        while True:
            yield dict(one)

    it = stream()
    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p))
    )

    def run(n):
        t0 = time.time()
        for _ in range(n):
            batch = shard_batch(trainer.mesh, next(it))
            trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        float(checksum(trainer.state.params))
        return time.time() - t0

    for _ in range(3):
        batch = shard_batch(trainer.mesh, next(it))
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
    float(checksum(trainer.state.params))

    t_short = run(5)
    t_long = run(steps)
    step_ms = (t_long - t_short) / (steps - 5) * 1000.0
    print(json.dumps({
        "metric": f"hllm_12L1024d_seq10_txt64_bs16_neg512_{'packed' if packed else 'dense'}_remat-{remat}",
        "step_ms": round(step_ms, 1),
        "value": round(16 / (step_ms / 1000.0), 2),
        "unit": "examples/s/chip",
    }))


if __name__ == "__main__":
    main()
