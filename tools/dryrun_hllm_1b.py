"""FSDP dryrun at the reference HLLM protocol SCALE: TinyLlama-1.1B-topology
item+user towers (22L / 2048d / 32h / GQA-4, vocab 32k — random init, no
checkpoint needed) sharded ZeRO-3 style over an 8-virtual-device CPU mesh.

Validates VERDICT r1 next-step #2: the ~2.2B-param two-tower stack
initializes with every large parameter (and its Adam state) sharded over the
data axis, executes one train step, and reports the per-device parameter +
optimizer bytes (≈ 1/8 of total — the stage-3 memory claim).

Token shapes are tiny (CPU FLOPs, not memory, are the constraint here); the
parameter/optimizer memory math is shape-independent. Run:

    python tools/dryrun_hllm_1b.py
"""

import json
import os
import sys
import tempfile
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


TINYLLAMA_1B = {
    "model_type": "llama",
    "vocab_size": 32000,
    "hidden_size": 2048,
    "intermediate_size": 5632,
    "num_hidden_layers": 22,
    "num_attention_heads": 32,
    "num_key_value_heads": 4,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "max_position_embeddings": 2048,
}


def main():
    from mhrec_tpu.config import Config
    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset
    from mhrec_tpu.parallel.mesh import shard_batch
    from mhrec_tpu.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="hllm1b_")
    meta = generate_synthetic_dataset(tmp, num_users=48, num_items=160, seed=0)
    ckpt = os.path.join(tmp, "tinyllama_1b_cfg")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "config.json"), "w") as fh:
        json.dump(TINYLLAMA_1B, fh)

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=tmp, dataset=meta["name"], text_path=meta["text_path"],
            model="HLLM", dummy_llm=False,
            item_pretrain_dir=ckpt, user_pretrain_dir=ckpt,
            # config-only checkpoint: random init at the real 1.1B topology
            item_llm_init=False, user_llm_init=False,
            fsdp=True,
            gradient_checkpointing=True,
            adam_mu_dtype="bfloat16",
            MAX_ITEM_LIST_LENGTH=4, MAX_TEXT_LENGTH=8,
            train_batch_size=8, eval_batch_size=8, num_negatives=8,
            tag_version="v1", eval_pred_len=2, pred_len=2, topk=[5],
            total_iters=1, eval_interval=100, nce_thres=1.1,
            show_progress=False,
            checkpoint_dir=os.path.join(tmp, "out"),
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    train, _, _ = build_dataloader(cfg, data)
    t = Trainer(cfg, data)
    t0 = time.time()
    t.setup_model()
    n_params = sum(x.size for x in jax.tree.leaves(t.state.params))
    print(f"params: {n_params/1e9:.3f}B  (setup {time.time()-t0:.0f}s)")
    assert n_params > 2.0e9, "expected ~2.2B params for the 1.1B tower pair"

    qk = t.state.params["item_llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "data" in str(qk.sharding.spec), qk.sharding.spec

    def device0_bytes(tree):
        total = 0
        for x in jax.tree.leaves(tree):
            if hasattr(x, "addressable_shards"):
                for s in x.addressable_shards:
                    if s.device == jax.devices()[0]:
                        total += s.data.size * s.data.dtype.itemsize
        return total

    p_total = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(t.state.params)
    )
    p_dev0 = device0_bytes(t.state.params)
    o_total = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(t.state.opt_state)
    )
    o_dev0 = device0_bytes(t.state.opt_state)
    print(f"param bytes: total {p_total/2**30:.2f} GiB, device0 "
          f"{p_dev0/2**30:.2f} GiB ({p_dev0/p_total:.1%})")
    print(f"opt   bytes: total {o_total/2**30:.2f} GiB, device0 "
          f"{o_dev0/2**30:.2f} GiB ({o_dev0/o_total:.1%})")
    assert p_dev0 < 0.2 * p_total, "stage-3 param sharding did not engage"
    assert o_dev0 < 0.2 * o_total, "stage-3 optimizer sharding did not engage"

    b = next(iter(train.epoch_batches(0)))
    batch = shard_batch(t.mesh, b)
    t1 = time.time()
    state, out = t._jit_train_step(t.state, batch)
    loss = float(out["loss"])
    print(f"train step OK: loss={loss:.4f} (compile+step {time.time()-t1:.0f}s)")
    assert np.isfinite(loss), loss
    print("dryrun_hllm_1b OK")


if __name__ == "__main__":
    main()
