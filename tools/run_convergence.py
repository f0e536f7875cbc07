"""Protocol-length convergence proof (VERDICT r3 #1).

Runs the HSTU/Pixel8M PRIOR protocol shape (reference
reproduce/HSTU-Pixel8M-prior.slurm:29-70: size4 = 1024d/16L/16h, seq 50,
lr 1e-4, 8192 per-category negatives, 8 categories tag v2, 4 segment heads,
additive interaction, eval_pred_len 8, eval every 3k — plus the prior
switch, `in`) end-to-end through the CLI for the full 30k iterations on a
protocol-scale synthetic corpus (200k items; the largest that fits one v5e
chip replicated), with live periodic eval, early stopping and
best-checkpoint cycling — then re-runs `--val_only True` from the saved
checkpoint and asserts the recorded test metrics reproduce.

Usage (real chip; ~2 h wall):
    python tools/run_convergence.py [--iters 30000] [--quick]

`--quick` shrinks everything for a CPU smoke run of the harness itself.
Artifacts land under saved/convergence/ (git-ignored): run log, per-eval
trajectory table, summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_dataset(data_path, users, items, quick):
    marker = os.path.join(data_path, "SynthRec.parquet")
    if os.path.exists(marker):
        print(f"[convergence] dataset exists: {marker}")
        return
    sys.path.insert(0, REPO)
    from mhrec_tpu.data.synthetic import generate_synthetic_dataset_fast

    t0 = time.time()
    meta = generate_synthetic_dataset_fast(
        data_path,
        num_users=users,
        num_items=items,
        num_categories=8,
        mean_seq_len=40 if quick else 160,
        min_seq_len=20 if quick else 60,
        max_seq_len=80 if quick else 400,
        seed=7,
    )
    print(f"[convergence] generated {meta} in {time.time() - t0:.1f}s")


def _cli(data_path, out_dir, iters, eval_interval, quick, val_only=False,
         resume=False):
    """The faithful prior-protocol override set (reproduce/
    HSTU-Pixel8M-prior.sh) at per-chip batch 64, + prior_switch in."""
    size = [] if not quick else [
        "--n_layers", "2", "--n_heads", "2",
        "--item_embedding_size", "64", "--hstu_embedding_size", "64",
    ]
    tag = "val" if val_only else "train"
    cmd = [
        sys.executable, "-m", "mhrec_tpu.run",
        "--config_file", "IDNet/hstu-size4.yaml", "overall/ID.yaml",
        "IDNet/hstu.yaml", "--",
        "--data_path", data_path,
        "--dataset", "SynthRec",
        "--text_path", os.path.join(data_path, "SynthRec-info.parquet"),
        "--MAX_ITEM_LIST_LENGTH", "50",
        "--optim_args.learning_rate", "1e-4",
        "--loss", "prior",
        "--num_negatives", "256" if quick else "8192",
        "--accumulate_grad", "1",
        "--train_batch_size", "16" if quick else "64",
        "--eval_batch_size", "64" if quick else "256",
        "--medusa_num_layers", "1",
        "--num_segment_head", "4",
        "--num_prior_head", "8",
        "--head_interaction", "additive",
        "--split_mode", "combine",
        "--use_image", "False",
        "--pred_len", "8",
        "--eval_pred_len", "8",
        "--medusa_lambda", "0.99",
        "--total_iters", str(iters),
        "--eval_interval", str(eval_interval),
        "--eval_num_cats", "8",
        "--neg_sample_by_cat", "True",
        "--weighted_prior_loss", "True",
        "--tag_version", "v2",
        "--min_seq_len", "20" if quick else "50",
        "--prior_given_at_test", "False",
        "--given_prior_len", "8",
        "--outlier_user_metrics", "category",
        "--segment_embed", "True",
        "--prior_switch", "in",
        "--prior_switch_loss_weight", "1.0",
        "--sparse_item_adam", "True",
        "--checkpoint_dir", os.path.join(out_dir, "ckpt"),
        "--result_json_path", os.path.join(out_dir, f"result_{tag}"),
        *size,
    ]
    if val_only:
        cmd += ["--val_only", "True"]
    if resume:
        cmd += ["--resume", "True"]
    return cmd


_VALID_RE = re.compile(
    r"valid @ opt_step (\d+): (\S+)=([-\d.eE]+) \(best ([-\d.eE]+)\)"
)
_ITER_RE = re.compile(r"iter (\d+)/(\d+) loss=([-\d.naef]+) lr=([\d.e+-]+)")


def _run_and_tee(cmd, log_path, env=None):
    print(f"[convergence] exec: {' '.join(cmd)}")
    t0 = time.time()
    with open(log_path, "ab") as log:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env,
        )
        tail = []
        for line in proc.stdout:
            log.write(line)
            log.flush()
            text = line.decode("utf-8", "replace").rstrip()
            tail.append(text)
            if len(tail) > 40:
                tail.pop(0)
            if _VALID_RE.search(text) or "early stopping" in text \
                    or "fit done" in text or "NaN" in text:
                print(f"  | {text}")
        proc.wait()
    wall = time.time() - t0
    if proc.returncode != 0:
        print("\n".join(tail[-30:]))
        raise SystemExit(
            f"run failed with code {proc.returncode} after {wall:.0f}s "
            f"(full log: {log_path})"
        )
    return wall


def _trajectory(log_path):
    """Extract (loss@iter) and (valid score@opt_step) series from the log."""
    losses, valids = [], []
    with open(log_path, "rb") as fh:
        for raw in fh:
            line = raw.decode("utf-8", "replace")
            m = _ITER_RE.search(line)
            if m:
                losses.append((int(m.group(1)), float(m.group(3))))
            m = _VALID_RE.search(line)
            if m:
                valids.append((int(m.group(1)), m.group(2), float(m.group(3)),
                               float(m.group(4))))
    return losses, valids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--eval_interval", type=int, default=3000)
    ap.add_argument("--users", type=int, default=12000)
    ap.add_argument("--items", type=int, default=200000)
    ap.add_argument("--quick", action="store_true",
                    help="tiny CPU smoke run of the harness itself")
    ap.add_argument("--resume", action="store_true",
                    help="continue a partially-run training from its latest "
                         "checkpoint (e.g. after an environment drop)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.quick:
        args.users, args.items = 300, 2000
        args.iters = min(args.iters, 40)
        args.eval_interval = min(args.eval_interval, 20)

    out_dir = args.out or os.path.join(
        REPO, "saved", "convergence" + ("_quick" if args.quick else ""))
    data_path = os.path.join(out_dir, "ds")
    os.makedirs(out_dir, exist_ok=True)
    _ensure_dataset(data_path, args.users, args.items, args.quick)

    env = dict(os.environ)
    if args.quick:
        env.setdefault("JAX_PLATFORMS", "cpu")

    log_path = os.path.join(out_dir, "train.log")
    train_wall = _run_and_tee(
        _cli(data_path, out_dir, args.iters, args.eval_interval, args.quick,
             resume=args.resume),
        log_path, env=env)
    losses, valids = _trajectory(log_path)

    val_log = os.path.join(out_dir, "val_only.log")
    val_wall = _run_and_tee(
        _cli(data_path, out_dir, args.iters, args.eval_interval, args.quick,
             val_only=True), val_log, env=env)

    with open(os.path.join(out_dir, "result_train.0.json")) as fh:
        train_res = json.load(fh)["result"]
    with open(os.path.join(out_dir, "result_val.0.json")) as fh:
        val_res = json.load(fh)["result"]

    mismatches = []
    for section, metrics in train_res.items():
        for k, v in metrics.items():
            v2 = val_res.get(section, {}).get(k)
            if v2 is None or abs(v2 - v) > 1e-9 * max(1.0, abs(v)):
                mismatches.append((f"{section}/{k}", v, v2))
    status = "REPRODUCED" if not mismatches else "MISMATCH"
    print(f"[convergence] val_only reproduction: {status} "
          f"({sum(len(m) for m in train_res.values())} metrics compared)")
    for k, v, v2 in mismatches[:10]:
        print(f"  MISMATCH {k}: train-run {v} vs val_only {v2}")

    summary = {
        "iters": args.iters,
        "eval_interval": args.eval_interval,
        "users": args.users,
        "items": args.items,
        "train_wall_s": round(train_wall, 1),
        "val_only_wall_s": round(val_wall, 1),
        "loss_head": losses[:3],
        "loss_tail": losses[-3:],
        "valid_trajectory": valids,
        "val_only_reproduces": not mismatches,
        "mismatches": mismatches[:20],
        "final_test_metrics": {
            k: train_res[k] for k in sorted(train_res)
        },
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps({k: summary[k] for k in (
        "iters", "train_wall_s", "valid_trajectory", "val_only_reproduces")},
        indent=2))
    if mismatches:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
