"""Corpus-scale retrieval-eval proof on the real chip (VERDICT r2 #6).

Runs the host-table + group-tiled eval pipeline (trainer.py
``_host_table_topk_results``) over a synthetic **8M-item** corpus — the
north-star Pixel8M scale the reference cannot reach on one device (its eval
replicates the full item table per GPU and materializes [B, H, I] scores,
trainer.py:731-824, hstu.py:979). Here the 8M×1024 fp32 table (32 GB) stays
in HOST RAM; phase A runs the user tower over host-gathered sequence
embeddings, phase B streams each normalized item chunk to the device ONCE
per batch group and advances device-resident running top-k.

Reports: wall time (cold incl. compile + warm), streamed GB, items/s
through the scorer, device HBM high-water, and METRIC IDENTITY between the
host-table path and the all-on-device streamed path on a subsample corpus.

The item features are synthetic (random normalized) — the subject is the
eval machinery, not the model; the user tower is the dummy LLM at the
north-star width so head embeddings have the real D=1024.

Usage: python tools/bench_corpus_eval.py [--items N] [--dim D]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(num_items, dim, host_mode, seed=0):
    from mhrec_tpu.config import Config
    from mhrec_tpu.data import build_dataloader
    from mhrec_tpu.data.synthetic import InMemoryInteractionData
    from mhrec_tpu.trainer import Trainer

    config = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            model="HLLM", dummy_llm=True, dummy_vocab_size=256,
            dummy_hidden_size=dim,
            MAX_ITEM_LIST_LENGTH=12, MAX_TEXT_LENGTH=8,
            train_batch_size=8, eval_batch_size=256, num_negatives=64,
            eval_pred_len=4, pred_len=2, topk=[5, 10, 50, 200],
            loss="prior", eval_num_cats=4, num_prior_head=4,
            int_to_category={i: f"cat_{i}" for i in range(4)},
            num_segment_head=1, medusa_num_layers=1,
            total_iters=1, seed=2020,
            host_item_table=host_mode,
            # metric decimals high enough that identity checks are strict
            metric_decimal_place=7,
        ),
    ).finalize()
    data = InMemoryInteractionData(
        num_users=1024, num_items=num_items, seq_len=40, num_categories=4,
        eval_pred_len=4, max_item_list_length=12, seed=seed,
    )
    _, _, test = build_dataloader(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    return config, data, test, trainer


def synth_table(num_items, dim, seed=0):
    """Normalized random item features, generated in chunks."""
    rng = np.random.default_rng(seed)
    out = np.empty((num_items, dim), np.float32)
    step = 1 << 20
    for off in range(0, num_items, step):
        n = min(step, num_items - off)
        block = rng.standard_normal((n, dim), dtype=np.float32)
        block /= np.clip(np.linalg.norm(block, axis=-1, keepdims=True), 1e-12, None)
        out[off:off + n] = block
    return out


def run_eval(trainer, test, table):
    trainer.compute_item_feature = (
        lambda return_host=False: table if return_host else __import__(
            "jax.numpy", fromlist=["asarray"]).asarray(table)
    )
    t0 = time.time()
    res = trainer.evaluate(test, load_best_model=False)
    return res, time.time() - t0


def main():
    import jax

    items = int(os.environ.get("BENCH_CORPUS_ITEMS", 8_000_000))
    dim = int(os.environ.get("BENCH_CORPUS_DIM", 1024))
    if "--items" in sys.argv:
        items = int(sys.argv[sys.argv.index("--items") + 1])
    if "--dim" in sys.argv:
        dim = int(sys.argv[sys.argv.index("--dim") + 1])

    skip_identity = "--skip-identity" in sys.argv
    # ---- metric identity: host-table vs device-streamed on a subsample ----
    sub = min(262_144, items)
    if skip_identity:
        sub = 0
    if sub:
        run_identity(sub, dim)

    # ---- the 8M-scale run -------------------------------------------------
    t0 = time.time()
    table = synth_table(items, dim)
    gen_s = time.time() - t0
    # measure the tunnel/interconnect H2D rate once — on the axon dev
    # tunnel it is ~0.04 GB/s, which DOMINATES the wall time below; on
    # directly-attached hardware the same pass rides PCIe/DMA at tens of
    # GB/s and the eval is scoring-bound
    probe = table[: 1 << 17]
    d = jax.device_put(probe); d.block_until_ready()
    t0 = time.time()
    d = jax.device_put(probe); float(d[0, 0])
    h2d_gbs = probe.nbytes / (1 << 30) / (time.time() - t0)
    cfg, data, test, trainer = build(items, dim, host_mode=True)
    res_cold, cold_s = run_eval(trainer, test, table)
    dev = jax.local_devices()[0]
    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats["hbm_peak_gb"] = round(ms.get("peak_bytes_in_use", 0) / (1 << 30), 3)
    except Exception:
        pass
    p_last = f"pred_{cfg['eval_pred_len'] - 1}"
    print(json.dumps({
        "metric": f"host_table_eval_{items // 1_000_000}M_items_dim{dim}",
        "value": round(items / cold_s, 1),
        "unit": "items_scored/s (eval wall incl. compile)",
        "eval_s": round(cold_s, 1),
        "table_gen_s": round(gen_s, 1),
        "host_table_gb": round(table.nbytes / (1 << 30), 2),
        "h2d_tunnel_gb_s": round(h2d_gbs, 3),
        "h2d_bound_s": round(table.nbytes / (1 << 30) / max(h2d_gbs, 1e-9), 1),
        "recall@200": res_cold.get(p_last, {}).get("recall@200"),
        **stats,
    }), flush=True)


def run_identity(sub, dim):
    table_sub = synth_table(sub, dim)
    cfgH, dataH, testH, trH = build(sub, dim, host_mode=True)
    resH, _ = run_eval(trH, testH, table_sub)
    cfgD, dataD, testD, trD = build(sub, dim, host_mode=False)
    resD, _ = run_eval(trD, testD, table_sub)
    mismatches = []
    for sec in resH:
        for k, v in resH[sec].items():
            vd = resD.get(sec, {}).get(k)
            # Recall/NDCG agree bit-exactly; Entropy accumulates f32
            # p·log p over chunk-order-dependent groupings → ~1e-6 noise
            if vd is None or abs(float(v) - float(vd)) > 1e-5:
                mismatches.append((sec, k, float(v), vd))
    print(json.dumps({
        "check": f"host_table vs device-streamed metric identity @ {sub} items",
        "metrics_compared": sum(len(v) for v in resH.values()),
        "mismatches": mismatches[:8],
        "ok": not mismatches,
    }), flush=True)


if __name__ == "__main__":
    main()
