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


# peak dense bf16 matmul throughput per chip, for the MFU column
# (VERDICT r3 #2). Keyed on jax device_kind.
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v6 lite": 918.0,   # v6e (Trillium)
}


def _device_peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_TFLOPS.items():
        if kind.startswith(k):
            return v
    return None


def _measure_hstu(overrides, n_short=10, n_long=60):
    """Train-step throughput for an HSTU shape; honest timing (checksum sync:
    block_until_ready on remote-tunneled (axon) arrays can return before
    execution completes, so force a data dependency on every parameter and
    report the MARGINAL cost between a short and a long run, cancelling
    warmup + fetch latency). Returns (examples/s, step_ms, model_tflops,
    mfu) — flops from XLA cost analysis of the ONE compiled step."""
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
        num_categories=(config["eval_num_cats"] or 0)
        if config["loss"] == "prior" else 0,
        seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    stream = batcher.infinite_batches(prefetch=2)
    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p))
    )

    # step flops from the executable XLA actually runs (cost analysis on
    # the same compiled object the loop then executes — one compile total)
    step_flops = None
    try:
        batch0 = shard_batch(trainer.mesh, next(stream))
        lowered = trainer._jitted_train_step.lower(
            trainer.state, batch0, trainer.extra_vars)
        compiled = lowered.compile()
        an = compiled.cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        step_flops = float(an.get("flops", 0.0)) or None

        def do_step(state, batch):
            return compiled(state, batch, trainer.extra_vars)
    except Exception:
        def do_step(state, batch):
            return trainer._jit_train_step(state, batch)

    def run(n):
        t0 = time.time()
        for _ in range(n):
            batch = shard_batch(trainer.mesh, next(stream))
            trainer.state, out = do_step(trainer.state, batch)
        float(checksum(trainer.state.params))
        return time.time() - t0

    for _ in range(3):  # compile + warm
        batch = shard_batch(trainer.mesh, next(stream))
        trainer.state, out = do_step(trainer.state, batch)
    float(checksum(trainer.state.params))

    # N independent marginal measurements (VERDICT r4 #8): the flat-vs-floor
    # conclusions rest on single numbers with a known ±1.5% variance — the
    # median ± spread makes regressions (and their absence) defensible
    reps = int(os.environ.get("BENCH_REPS", 3))
    times = []
    for _ in range(max(reps, 1)):
        t_short = run(n_short)
        t_long = run(n_long)
        times.append((t_long - t_short) / (n_long - n_short))
    times.sort()
    step_time = times[len(times) // 2] if reps % 2 else (
        0.5 * (times[len(times) // 2 - 1] + times[len(times) // 2])
    )
    spread_pct = (
        100.0 * (times[-1] - times[0]) / step_time if len(times) > 1 else 0.0
    )
    tflops = mfu = None
    if step_flops:
        tflops = step_flops / 1e12
        peak = _device_peak_tflops()
        if peak:
            mfu = (step_flops / step_time) / (peak * 1e12)
    return (config["train_batch_size"] / step_time, step_time * 1000.0,
            tflops, mfu, spread_pct)


def main():
    import jax

    from mhrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()  # steady-state timing is unaffected; reruns skip compiles
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
    per_chip, step_ms, tflops, mfu, spread = _measure_hstu(
        size4, n_short, n_long)
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
        "step_ms": round(step_ms, 2),
        "spread_pct": round(spread, 2),
    }
    if tflops:
        result["model_tflops"] = round(tflops, 3)
    if mfu:
        result["mfu"] = round(mfu, 4)

    if os.environ.get("BENCH_SUITE", "1") != "0" and not os.environ.get("BENCH_SMALL"):
        suite = {}

        def _release():
            # the 1B-tower rows need ~14 GB: drop every buffer the earlier
            # rows' trainers / jit caches still pin before allocating
            import gc

            gc.collect()
            jax.clear_caches()
            gc.collect()

        def _row(name, overrides, n_s, n_l):
            try:
                ex_s, ms, tf, mf, sp = _measure_hstu(overrides, n_s, n_l)
                row = {"value": round(ex_s / n_devices, 2),
                       "unit": "examples/s/chip", "step_ms": round(ms, 2),
                       "spread_pct": round(sp, 2)}
                if tf:
                    row["model_tflops"] = round(tf, 3)
                if mf:
                    row["mfu"] = round(mf, 4)
                suite[name] = row
            except Exception as e:  # never fail the primary metric
                suite[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

        # the paper's HEADLINE config (reproduce/HSTU-Pixel8M-prior.slurm:
        # 29-70): size4 + 8 per-category NCE passes + prior switch + 4
        # segment heads, additive interaction (VERDICT r3 #2)
        _row("hstu_size4_prior_8cat_switch", dict(
            size4,
            loss="prior", eval_num_cats=8, num_prior_head=8,
            num_segment_head=4, head_interaction="additive",
            split_mode="combine", medusa_num_layers=1, medusa_lambda=0.99,
            neg_sample_by_cat=True, weighted_prior_loss=True,
            segment_embed=True, prior_switch="in",
            prior_switch_loss_weight=1.0, tag_version="v2",
        ), 5, 30)

        # bf16 item-table storage (opt-in lever, VERDICT r3 #4): halves the
        # step's dominant HBM object; trajectory coincidence vs the fp32
        # table is proven by tools/traj_compare.py (BASELINE r4)
        _row("hstu_size4_bf16_item_table", dict(
            size4, item_table_dtype="bfloat16",
        ), 5, 30)

        # merrec protocol shape (reproduce/HSTU-merrec-prior.slurm:25-60
        # minus the prior machinery): L=400, 8L/512d/8h, bs 32 — the
        # long-L shape where attn_impl auto selects the fused STU kernel
        _row("hstu_merrec_seq400_bs32_neg4096", dict(
            MAX_ITEM_LIST_LENGTH=400, pred_len=1, eval_pred_len=1,
            train_batch_size=32 * n_devices, num_negatives=4096,
            n_layers=8, n_heads=8, item_embedding_size=512,
            hstu_embedding_size=512, hidden_dropout_prob=0.2,
            loss="nce", total_iters=100, seed=2020,
            sparse_item_adam=True, _num_items=100_000,
        ), 5, 30)
        _release()
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
        # tuned freeze-mode config (BASELINE r5 ν-bf16 sweep): bf16 ν Adam
        # halves the dominant per-step state-traffic term AND frees the
        # capacity that capped the batch at 24 — bs 128 measures ~4.3× the
        # protocol-default row on one v5e
        _release()
        try:
            from bench_hllm_protocol import bench_freeze

            row = bench_freeze(22, bs=128,
                               extra={"adam_nu_dtype": "bfloat16"},
                               tag="_nu-bf16_tuned")
            suite[row.pop("metric")] = row
        except Exception as e:
            suite["hllm_train_freeze_item_tuned"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        # the hardest HLLM shape (VERDICT r4 #7): full two-tower packed pair
        # at text 256 — the largest pair that fits one chip (8L/1024d
        # towers; remat 'full' is the only policy that compiles here,
        # BASELINE r5). Fixed dataset dir so reruns hit the disk token cache.
        _release()
        try:
            from bench_hllm_protocol import bench_pair

            pair_ds = os.environ.get(
                "BENCH_PAIR_DS", "/tmp/mhrec_bench_pair_ds")
            os.makedirs(pair_ds, exist_ok=True)
            row = bench_pair(8, hidden=1024, heads=16, kv=4, data_dir=pair_ds)
            suite[row.pop("metric")] = row
        except Exception as e:
            suite["hllm_train_pair_8L1024d_txt256_packed"] = {
                "error": f"{type(e).__name__}: {e}"[:200]
            }
        result["suite"] = suite

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
