"""Protocol-SCALE HLLM measurements on the real chip (VERDICT r1 next-step #7).

The reference protocol (reproduce/HLLM-Pixel8M-base.slurm:29-72) trains
~1-2B-param towers at MAX_TEXT_LENGTH=256, seq 10, bs 16/device under
DeepSpeed stage 2/3 across many 80 GB GPUs. A single v5e chip (16 GB) cannot
hold the full two-tower pair's fp32 Adam state (2.2B params -> 8.8 GB params
+ 13.2 GB opt), so this tool measures the protocol components that DO run on
one chip and records the memory math for the multi-chip FSDP path (validated
by tools/dryrun_hllm_1b.py / dryrun_multichip):

  corpus    - item-tower corpus-embedding pass, TinyLlama-1.1B topology,
              256 tokens/item, bf16 fwd (the eval-side hot loop) -> items/s.
  freeze    - train step with ``freeze_item_llm`` (a first-class reference
              mode, hllm.py:485-488): 1.1B user tower trains over the
              precomputed item table, seq 10, bs 16 -> ex/s/chip.
  pair      - full two-tower packed train step at 256 tokens at the largest
              per-tower size that fits one chip (default 12L/2048d ~ 0.66B
              per tower; --layers N to push). OOM is caught and reported.

Usage: python tools/bench_hllm_protocol.py [corpus|freeze|pair|remat|freeze_bs|freeze_nu|all] [--layers N]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tower_dir(n_layers=22, hidden=2048, heads=32, kv_heads=4,
              vocab=32000, intermediate=5632):
    """TinyLlama-1.1B topology by default (22L/2048d/32h/GQA-4)."""
    d = tempfile.mkdtemp(prefix="mhrec_tower_")
    cfg = dict(
        model_type="llama", vocab_size=vocab, hidden_size=hidden,
        intermediate_size=intermediate, num_hidden_layers=n_layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        max_position_embeddings=4096, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    with open(os.path.join(d, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    return d


def build(config_dict, num_items=2000, data_dir=None):
    from mhrec_tpu.config import Config
    from mhrec_tpu.data import InteractionData, build_dataloader
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset
    from mhrec_tpu.trainer import Trainer

    tmp = data_dir or tempfile.mkdtemp(prefix="mhrec_proto_")
    if data_dir and os.path.exists(os.path.join(tmp, "SynthRec.parquet")):
        meta = {"name": "SynthRec",
                "text_path": os.path.join(tmp, "SynthRec-info.parquet")}
    else:
        meta = generate_synthetic_dataset(
            tmp, num_users=1024, num_items=num_items, seed=0, text_words=256
        )
    base = dict(
        data_path=tmp, dataset=meta["name"], text_path=meta["text_path"],
        MAX_ITEM_LIST_LENGTH=10, MAX_TEXT_LENGTH=256,
        train_batch_size=16, num_negatives=512,
        gradient_checkpointing=True,
        tag_version="v1", eval_pred_len=1, pred_len=1, topk=[5, 10],
        total_iters=100, seed=2020, nce_thres=0.99,
    )
    base.update(config_dict)
    config = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=base,
    ).finalize()
    data = InteractionData(config).build()
    train, _, _ = build_dataloader(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    return config, data, train, trainer


def n_params(tree):
    import jax
    return sum(x.size for x in jax.tree.leaves(tree))


def bench_corpus(layers):
    """Item-tower corpus pass at 1.1B/256tok: items/s + model FLOPs/s."""
    import jax

    t_dir = tower_dir(n_layers=layers)
    num_items = 2000
    # corpus pass is fwd-only: freeze both towers so no Adam moments are
    # allocated (the eval-side protocol never needs them), tiny user tower
    u_dir = tower_dir(n_layers=2, hidden=2048, heads=32, kv_heads=4)
    config, data, train, trainer = build(
        dict(item_pretrain_dir=t_dir, user_pretrain_dir=u_dir,
             item_llm_init=False, user_llm_init=False, dummy_llm=False,
             freeze_prefix=["item_llm", "user_llm", "item_emb_tokens"]),
        num_items=num_items,
    )
    p_item = n_params(trainer.state.params["item_llm"])
    t0 = time.time()
    table = trainer.compute_item_feature()          # cold: tokenize+compile
    jax.block_until_ready(table)
    cold = time.time() - t0
    t0 = time.time()
    table = trainer.compute_item_feature()
    jax.block_until_ready(table)
    warm = time.time() - t0
    items_s = (num_items + 1) / warm
    flops = 2.0 * p_item * 256 * items_s            # fwd-only 2*P per token
    return {
        "metric": f"hllm_corpus_pass_{layers}L2048d_{p_item/1e9:.2f}B_txt256",
        "value": round(items_s, 1), "unit": "items/s/chip",
        "cold_s": round(cold, 1), "warm_s": round(warm, 1),
        "model_tflops_s": round(flops / 1e12, 1),
    }


def _time_train(trainer, train, steps=12):
    """Median-of-reps marginal step time in ms, plus the min→max spread in
    percent (VERDICT r4 #8). BENCH_REPS=1 for quick dev runs."""
    import jax
    import jax.numpy as jnp
    from mhrec_tpu.parallel.mesh import shard_batch

    b0 = next(iter(train.epoch_batches(0)))
    one = {k: jnp.asarray(v) for k, v in b0.items()}
    checksum = jax.jit(lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)))

    def run(n):
        t0 = time.time()
        for _ in range(n):
            batch = shard_batch(trainer.mesh, dict(one))
            trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        float(checksum(trainer.state.params))
        return time.time() - t0

    for _ in range(3):
        batch = shard_batch(trainer.mesh, dict(one))
        trainer.state, out = trainer._jit_train_step(trainer.state, batch)
    float(checksum(trainer.state.params))
    reps = max(int(os.environ.get("BENCH_REPS", 3)), 1)
    times = []
    for _ in range(reps):
        t_short = run(4)
        t_long = run(steps)
        times.append((t_long - t_short) / (steps - 4) * 1000.0)
    times.sort()
    med = times[len(times) // 2] if reps % 2 else (
        0.5 * (times[len(times) // 2 - 1] + times[len(times) // 2])
    )
    spread = 100.0 * (times[-1] - times[0]) / med if reps > 1 else 0.0
    return med, spread


def bench_freeze(layers, bs=16, extra=None, tag=""):
    """freeze_item_llm train step: 1.1B user tower over the item table."""
    import numpy as np

    t_dir = tower_dir(n_layers=layers)
    num_items = 2000
    # precomputed table: the frozen-mode contract (hllm.py:344-346)
    tmp_table = os.path.join(tempfile.mkdtemp(), "table.npy")
    np.save(tmp_table, np.random.default_rng(0)
            .normal(size=(num_items + 1, 2048)).astype(np.float32))
    over = dict(item_pretrain_dir=t_dir, user_pretrain_dir=t_dir,
                item_llm_init=False, user_llm_init=False, dummy_llm=False,
                freeze_item_llm=True, all_item_embeds_path=tmp_table,
                adam_mu_dtype="bfloat16", train_batch_size=bs)
    over.update(extra or {})
    config, data, train, trainer = build(over, num_items=num_items)
    p_user = n_params(trainer.state.params["user_llm"])
    step_ms, spread = _time_train(trainer, train)
    # fwd+bwd ~ 6*P FLOPs per token over bs*(seq 10 + 1) user-tower tokens
    tflops_s = 6.0 * p_user * bs * 11 / (step_ms / 1e3) / 1e12
    return {
        "metric": f"hllm_train_freeze_item_{layers}L2048d_{p_user/1e9:.2f}B-user_seq10_bs{bs}_neg512{tag}",
        "step_ms": round(step_ms, 1), "spread_pct": round(spread, 2),
        "value": round(bs / (step_ms / 1000.0), 2), "unit": "examples/s/chip",
        "model_tflops_s": round(tflops_s, 1),
    }


def bench_freeze_bs(layers):
    """Batch-size saturation sweep for the freeze-mode step (VERDICT r3
    weak #5: at the protocol bs 16 the 43 ms step feeds the 0.97B tower
    only 160 user-sequence tokens — is it latency- or compute-bound, and
    where does the chip saturate?)."""
    layers = layers or 22
    rows = []
    for bs in (16, 64, 256, 1024):
        try:
            rows.append(bench_freeze(layers, bs=bs))
        except Exception as e:  # OOM at some bs is a result, not a crash
            rows.append({"metric": f"hllm_train_freeze_item_{layers}L_bs{bs}",
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_freeze_nu(layers):
    """Freeze-mode sweep with ``adam_nu_dtype: bfloat16`` (the lever the
    round-5 saturation sweep named: the fp32 ν buffer is both the largest
    per-step HBM traffic term — read+write ≈ 8 GB of the ~20 GB — and
    ~3.9 GB of capacity, which is what caps the batch below 32)."""
    layers = layers or 22
    rows = []
    for bs in (16, 24, 32, 48, 64):
        try:
            rows.append(bench_freeze(layers, bs=bs,
                                     extra={"adam_nu_dtype": "bfloat16"},
                                     tag="_nu-bf16"))
        except Exception as e:  # OOM at some bs is a result, not a crash
            rows.append({"metric": f"hllm_train_freeze_item_{layers}L_bs{bs}_nu-bf16",
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_pair(layers, hidden=2048, heads=32, kv=4, intermediate=None,
               extra=None, tag="", data_dir=None):
    """Full two-tower packed train step at 256 tokens.

    The protocol 2×1.1B pair cannot fit one 16 GB v5e chip: beyond the fp32
    params + bf16 moments, full remat still saves each layer's residual
    input over the ~177k-token packed stream (~178·hidden KB/layer). The
    ladder walks tower sizes down until one fits; the FSDP dryrun
    (tools/dryrun_hllm_1b.py) covers the protocol scale across ≥2 chips.
    """
    intermediate = intermediate or int(hidden * 11 // 4)
    t_dir = tower_dir(n_layers=layers, hidden=hidden, heads=heads,
                      kv_heads=kv, intermediate=intermediate)
    over = dict(item_pretrain_dir=t_dir, user_pretrain_dir=t_dir,
                item_llm_init=False, user_llm_init=False, dummy_llm=False,
                packed_item_tower=True, adam_mu_dtype="bfloat16",
                adam_nu_dtype="bfloat16")
    over.update(extra or {})
    config, data, train, trainer = build(over, data_dir=data_dir)
    p_all = n_params(trainer.state.params)
    # packed-chunk occupancy: real (non-pad) tokens over chunk capacity
    occupancy = None
    b0 = next(iter(train.epoch_batches(0)))
    for k, v in b0.items():
        if k.endswith("packed_segment_ids"):
            occupancy = round(float((v != 0).mean()), 3)
            break
    step_ms, spread = _time_train(trainer, train, steps=8)
    # model flops: 6*P per packed item-tower token + 6*P_user per user token
    p_item = (n_params(trainer.state.params.get("item_llm", {})) or 0)
    p_user = n_params(trainer.state.params["user_llm"])
    n_packed = 0
    for k, v in b0.items():
        if k.endswith("packed_segment_ids"):
            n_packed += int((v != 0).sum())
    flops = 6.0 * (p_item * n_packed + p_user * 16 * 11)
    return {
        "metric": f"hllm_train_pair_{layers}L{hidden}d_{p_all/1e9:.2f}B-total"
                  f"_seq10_txt256_bs16_neg512_packed{tag}",
        "step_ms": round(step_ms, 1), "spread_pct": round(spread, 2),
        "value": round(16 / (step_ms / 1000.0), 2), "unit": "examples/s/chip",
        "packed_occupancy": occupancy,
        "model_tflops_s": round(flops / (step_ms / 1e3) / 1e12, 1),
    }


def bench_remat(layers=None, hidden=1024):
    """remat-policy sweep at the largest one-chip pair shape (VERDICT r3
    #7): full per-layer remat vs ``dots`` (save matmul outputs, recompute
    elementwise) vs remat off — each measured end-to-end at the text-256
    packed protocol shape."""
    layers = layers or 8
    rows = []
    ds = tempfile.mkdtemp(prefix="mhrec_remat_ds_")  # shared token cache
    for tag, extra in [
        ("_remat-full", dict(gradient_checkpointing=True, remat_policy="full")),
        ("_remat-dots", dict(gradient_checkpointing=True, remat_policy="dots")),
        ("_remat-off", dict(gradient_checkpointing=False)),
    ]:
        try:
            rows.append(bench_pair(layers, hidden=hidden, heads=16, kv=4,
                                   extra=extra, tag=tag, data_dir=ds))
        except Exception as e:  # OOM at this shape is a result, not a crash
            rows.append({"metric": f"hllm_train_pair_{layers}L{hidden}d{tag}",
                         "error": f"{type(e).__name__}: {str(e)[:200]}"})
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    from mhrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "all"
    layers = int(sys.argv[sys.argv.index("--layers") + 1]) if "--layers" in sys.argv else None
    jobs = {
        "corpus": (bench_corpus, [22]),
        "freeze": (bench_freeze, [22, 14, 8]),
        "pair": (bench_pair, [12, 8, 5]),
        "remat": (bench_remat, [8]),
        "freeze_bs": (bench_freeze_bs, [22]),
        "freeze_nu": (bench_freeze_nu, [22]),
    }
    if which == "all":
        jobs.pop("freeze_bs")  # sweeps are opt-in (long; run explicitly)
        jobs.pop("freeze_nu")
    for name, (fn, fallbacks) in jobs.items():
        if which not in ("all", name):
            continue
        for n_layers in ([layers] if layers else fallbacks):
            try:
                out = fn(n_layers)
                # sweep jobs (remat/freeze_bs) print each row themselves;
                # re-printing the returned list would duplicate every row
                if not isinstance(out, list):
                    print(json.dumps(out), flush=True)
                break
            except Exception as e:
                print(json.dumps(
                    {"metric": f"{name}_{n_layers}L",
                     "error": f"{type(e).__name__}: {e}"[:240]}), flush=True)
