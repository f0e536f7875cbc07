"""HLLM protocol-length convergence proof (VERDICT r4 #2).

Runs the reference HLLM/Pixel8M protocol loop (reproduce/
HLLM-Pixel8M-base.slurm:29-75: 3000 iterations, eval every 600, seq 10,
bs 16, lr 1e-4, pred_len 1 / eval_pred_len 8, nce loss, 8 categories tag
v2, min_seq_len 20) end-to-end through the CLI on one chip, in the
reference's first-class ``freeze_item_llm`` mode (hllm.py:485-488): a
TinyLlama-1.1B-topology user tower (random init — no checkpics ship in
this environment) trained over a precomputed item-embedding table, with
live periodic eval, best-checkpoint cycling, a final test from the best
checkpoint, and a ``--val_only True`` rerun asserting the test metrics
reproduce bit-for-bit.

The frozen table is built CATEGORY-CLUSTERED (centroid + noise per item)
— the synthetic analog of the reference's table-from-a-pretrained-item-
tower, so the user tower has real structure to learn and the trajectory
shows an actual learn curve rather than noise around random.

Usage (real chip):   python tools/run_convergence_hllm.py
Smoke (CPU, tiny):   python tools/run_convergence_hllm.py --quick
Optional two-tower:  python tools/run_convergence_hllm.py --pair
(small 4L/512d towers at text 64 — the largest pair affordable in-round;
the freeze run above is the protocol-topology proof)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_convergence import _run_and_tee, _trajectory  # noqa: E402


def _ensure_dataset(data_path, users, items, quick):
    marker = os.path.join(data_path, "SynthRec.parquet")
    if os.path.exists(marker):
        print(f"[hllm-convergence] dataset exists: {marker}")
        return
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset_fast

    t0 = time.time()
    meta = generate_synthetic_dataset_fast(
        data_path,
        num_users=users,
        num_items=items,
        num_categories=8,
        mean_seq_len=24 if quick else 48,
        min_seq_len=20,
        max_seq_len=60 if quick else 200,
        seed=11,
    )
    print(f"[hllm-convergence] generated {meta} in {time.time() - t0:.1f}s")


def _ensure_table(data_path, out_dir, items, hidden, quick):
    """Category-clustered frozen item table [item_num, hidden]."""
    table_path = os.path.join(out_dir, "item_table.npy")
    if os.path.exists(table_path):
        return table_path
    import numpy as np

    from mhrec_tpu.config import Config
    from mhrec_tpu.data import InteractionData

    cfg = Config(
        config_file_list=["overall/LLM.yaml", "HLLM/HLLM.yaml"],
        config_dict=dict(
            data_path=data_path, dataset="SynthRec",
            text_path=os.path.join(data_path, "SynthRec-info.parquet"),
            MAX_ITEM_LIST_LENGTH=10, eval_pred_len=8, pred_len=1,
            tag_version="v2", min_seq_len=20, eval_num_cats=8,
        ),
    ).finalize()
    data = InteractionData(cfg).build()
    rng = np.random.default_rng(5)
    C = max(len(cfg["int_to_category"] or {}), 1)
    centroids = rng.normal(size=(C, hidden)).astype(np.float32)
    table = 0.35 * rng.normal(size=(data.item_num, hidden)).astype(np.float32)
    tags = data.item_tag_matrix  # [item_num, C] multi-hot
    if tags is not None:
        w = np.asarray(tags, np.float32)
        norm = np.clip(w.sum(1, keepdims=True), 1, None)
        table += (w / norm) @ centroids
    np.save(table_path, table)
    print(f"[hllm-convergence] wrote clustered table {table.shape} "
          f"({C} centroids) to {table_path}")
    return table_path


def _tower_dir(out_dir, quick, layers=22, hidden=2048, heads=32, kv=4,
               inter=5632, name="user_tower"):
    if quick:
        layers, hidden, heads, kv, inter = 2, 64, 4, 2, 128
    d = os.path.join(out_dir, f"{name}_{layers}L{hidden}d")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as fh:
        json.dump(dict(
            model_type="llama", vocab_size=32000, hidden_size=hidden,
            intermediate_size=inter, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=kv,
            rms_norm_eps=1e-5, rope_theta=10000.0,
        ), fh)
    return d


def _cli(data_path, out_dir, iters, eval_interval, tower, table_path, quick,
         val_only=False, resume=False, pair=False, item_tower=None,
         batch_size=16):
    tag = ("val" if val_only else "train") + ("_pair" if pair else "")
    cmd = [
        sys.executable, "-m", "mhrec_tpu.run",
        "--config_file", "overall/LLM.yaml", "HLLM/HLLM.yaml", "--",
        "--data_path", data_path,
        "--dataset", "SynthRec",
        "--text_path", os.path.join(data_path, "SynthRec-info.parquet"),
        # the reference protocol override set (HLLM-Pixel8M-base.slurm)
        "--MAX_ITEM_LIST_LENGTH", "10",
        "--optim_args.learning_rate", "1e-4",
        "--loss", "nce",
        "--accumulate_grad", "1",
        "--MAX_TEXT_LENGTH", "16" if quick else ("64" if pair else "256"),
        "--train_batch_size", str(batch_size),
        "--eval_batch_size", "64" if quick else "128",
        "--gradient_checkpointing", "True",
        "--medusa_num_layers", "0",
        "--num_segment_head", "1",
        "--num_prior_head", "1",
        "--head_interaction", "multiplicative",
        "--split_mode", "combine",
        "--use_image", "False",
        "--pred_len", "1",
        "--eval_pred_len", "8",
        "--medusa_lambda", "0.99",
        "--total_iters", str(iters),
        "--eval_interval", str(eval_interval),
        "--eval_num_cats", "8",
        "--tag_version", "v2",
        "--min_seq_len", "20",
        "--outlier_user_metrics", "category",
        "--dummy_llm", "False",
        "--user_pretrain_dir", tower,
        "--user_llm_init", "False",
        "--item_llm_init", "False",
        "--num_negatives", "64" if quick else "512",
        "--adam_mu_dtype", "bfloat16",
        "--checkpoint_dir", os.path.join(out_dir, "ckpt" + ("_pair" if pair else "")),
        "--result_json_path", os.path.join(out_dir, f"result_{tag}"),
    ]
    if pair:
        cmd += ["--item_pretrain_dir", item_tower,
                "--packed_item_tower", "True",
                "--adam_nu_dtype", "bfloat16"]
    else:
        cmd += ["--item_pretrain_dir", tower,
                "--freeze_item_llm", "True",
                "--all_item_embeds_path", table_path]
    if val_only:
        cmd += ["--val_only", "True"]
    if resume:
        cmd += ["--resume", "True"]
    return cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--eval_interval", type=int, default=600)
    ap.add_argument("--users", type=int, default=8000)
    ap.add_argument("--items", type=int, default=20000)
    ap.add_argument("--batch_size", type=int, default=16,
                    help="16 = protocol; 24 = the measured single-chip "
                         "sweet spot (BASELINE r5 freeze_bs sweep)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--pair", action="store_true",
                    help="small two-tower pair instead of freeze mode")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.quick:
        args.users, args.items = 300, 2000
        args.iters = min(args.iters, 40)
        args.eval_interval = min(args.eval_interval, 20)

    suffix = ("_quick" if args.quick else "") + ("_pair" if args.pair else "")
    out_dir = args.out or os.path.join(REPO, "saved", "convergence_hllm" + suffix)
    data_path = os.path.join(out_dir, "ds")
    os.makedirs(out_dir, exist_ok=True)
    _ensure_dataset(data_path, args.users, args.items, args.quick)

    env = dict(os.environ)
    if args.quick:
        env.setdefault("JAX_PLATFORMS", "cpu")

    if args.pair:
        tower = _tower_dir(out_dir, args.quick, layers=4, hidden=512,
                           heads=8, kv=4, inter=1408, name="pair_tower")
        item_tower = tower
        table_path = None
    else:
        tower = _tower_dir(out_dir, args.quick)
        item_tower = None
        hidden = 64 if args.quick else 2048
        table_path = _ensure_table(data_path, out_dir, args.items, hidden,
                                   args.quick)

    log_path = os.path.join(out_dir, "train.log")
    train_wall = _run_and_tee(
        _cli(data_path, out_dir, args.iters, args.eval_interval, tower,
             table_path, args.quick, resume=args.resume, pair=args.pair,
             item_tower=item_tower, batch_size=args.batch_size),
        log_path, env=env)
    losses, valids = _trajectory(log_path)

    val_log = os.path.join(out_dir, "val_only.log")
    val_wall = _run_and_tee(
        _cli(data_path, out_dir, args.iters, args.eval_interval, tower,
             table_path, args.quick, val_only=True, pair=args.pair,
             item_tower=item_tower, batch_size=args.batch_size),
        val_log, env=env)

    tag = "train" + ("_pair" if args.pair else "")
    vtag = "val" + ("_pair" if args.pair else "")
    with open(os.path.join(out_dir, f"result_{tag}.0.json")) as fh:
        train_res = json.load(fh)["result"]
    with open(os.path.join(out_dir, f"result_{vtag}.0.json")) as fh:
        val_res = json.load(fh)["result"]

    mismatches = []
    for section, metrics in train_res.items():
        for k, v in metrics.items():
            v2 = val_res.get(section, {}).get(k)
            if v2 is None or abs(v2 - v) > 1e-9 * max(1.0, abs(v)):
                mismatches.append((f"{section}/{k}", v, v2))
    status = "REPRODUCED" if not mismatches else "MISMATCH"
    print(f"[hllm-convergence] val_only reproduction: {status} "
          f"({sum(len(m) for m in train_res.values())} metrics compared)")
    for k, v, v2 in mismatches[:10]:
        print(f"  MISMATCH {k}: train-run {v} vs val_only {v2}")

    summary = {
        "mode": "pair" if args.pair else "freeze_item_llm",
        "iters": args.iters,
        "eval_interval": args.eval_interval,
        "users": args.users,
        "items": args.items,
        "batch_size": args.batch_size,
        "train_wall_s": round(train_wall, 1),
        "val_only_wall_s": round(val_wall, 1),
        "loss_head": losses[:3],
        "loss_tail": losses[-3:],
        "valid_trajectory": valids,
        "val_only_reproduces": not mismatches,
        "mismatches": mismatches[:20],
        "final_test_metrics": {k: train_res[k] for k in sorted(train_res)},
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({k: summary[k] for k in (
        "mode", "iters", "train_wall_s", "valid_trajectory",
        "val_only_reproduces")}, indent=2))
    if mismatches:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
