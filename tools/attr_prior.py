"""Prior-protocol step attribution + stacked-vs-loop A/B (VERDICT r4 #3).

The paper's headline config (size4 + 8 per-category NCE passes + prior
switch + 4 segment heads additive, 8192 per-category negatives) measured
86.9 ms/step in r4 — ~57 ms more than the base-NCE step — but was never
per-op attributed. This tool:

  ab       A/B the end-to-end step: prior_loss_impl loop vs stacked
           (losses.multi_horizon_nce_stacked), plus the base-NCE anchor.
  xprof    jax.profiler-trace ~12 steps of each impl, aggregate HLO op
           self-times by program region (trunk / attention / prior-NCE
           matmuls / scatters / other) via tensorboard_plugin_profile's
           hlo_stats conversion, print the attribution table.

Usage: python tools/attr_prior.py [ab|xprof|all]
"""

import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRIOR = dict(
    MAX_ITEM_LIST_LENGTH=50, pred_len=8, eval_pred_len=8,
    train_batch_size=64, num_negatives=8192, n_layers=16, n_heads=16,
    item_embedding_size=1024, hstu_embedding_size=1024,
    hidden_dropout_prob=0.2, total_iters=100, seed=2020,
    sparse_item_adam=True,
    loss="prior", eval_num_cats=8, num_prior_head=8, num_segment_head=4,
    head_interaction="additive", split_mode="combine", medusa_num_layers=1,
    medusa_lambda=0.99, neg_sample_by_cat=True, weighted_prior_loss=True,
    segment_embed=True, prior_switch="in", prior_switch_loss_weight=1.0,
    tag_version="v2",
)


def build(overrides):
    from mhrec_tpu.config import Config
    from mhrec_tpu.data.synthetic import InMemoryInteractionData
    from mhrec_tpu.data.trainset import SEQTrainBatcher
    from mhrec_tpu.trainer import Trainer

    base = dict(PRIOR)
    base.update(overrides)
    config = Config(
        config_file_list=["overall/ID.yaml", "IDNet/hstu.yaml"],
        config_dict=base,
    ).finalize()
    data = InMemoryInteractionData(
        num_users=4096, num_items=200_000, seq_len=50 * 2 + 16,
        eval_pred_len=8, max_item_list_length=50,
        num_categories=8, seed=0,
    )
    batcher = SEQTrainBatcher(config, data)
    trainer = Trainer(config, data)
    trainer.setup_model()
    return trainer, batcher.infinite_batches(prefetch=2)


def time_step(overrides, n_short=5, n_long=30, reps=3):
    import jax
    import jax.numpy as jnp

    from mhrec_tpu.parallel.mesh import shard_batch

    trainer, stream = build(overrides)
    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)))

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
    times = []
    for _ in range(reps):
        t_s, t_l = run(n_short), run(n_long)
        times.append((t_l - t_s) / (n_long - n_short) * 1000.0)
    times.sort()
    med = times[len(times) // 2]
    return med, 100.0 * (times[-1] - times[0]) / med


def ab():
    rows = {}
    for name, ov in (
        ("prior_loop", {"prior_loss_impl": "loop"}),
        ("prior_stacked", {"prior_loss_impl": "stacked"}),
        ("base_nce_anchor", {"loss": "nce", "num_prior_head": 1,
                             "num_segment_head": 1, "prior_switch": None,
                             "neg_sample_by_cat": False,
                             "head_interaction": "multiplicative",
                             "medusa_num_layers": 0}),
    ):
        try:
            ms, spread = time_step(ov)
            rows[name] = {"step_ms": round(ms, 2),
                          "spread_pct": round(spread, 2),
                          "ex_s": round(64 / ms * 1000.0, 1)}
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({name: rows[name]}), flush=True)
    return rows


# grouped by result SHAPE (the trace's op names are raw HLO expressions;
# shapes identify the program region at the default PRIOR config: 200k-item
# table, 77824-row unique-id block, [64, heads, 50, 8192] NCE tables)
GROUPS = [
    ("full-table [200k,1024] ops (sparse-Adam scatters)",
     re.compile(r"\[200000,1024\]")),
    ("touched-row [77824,1024] ops (gathers + Adam row math)",
     re.compile(r"\[77824,")),
    ("NCE tables [.,.,50,8192] (raw/exp/kept)",
     re.compile(r",50,8192\]")),
    ("false-neg tables [.,57,8192]", re.compile(r",57,8192\]")),
    ("trunk/head [.,50,1024]-ish matmul fusions",
     re.compile(r"convolution|50,1024\]")),
    ("scatter/gather (other)", re.compile(r"scatter|gather", re.I)),
]


def _aggregate_hlo_stats(logdir, top_n=30):
    """Parse the xplane dump directly via TF's tsl xplane proto (the
    tensorboard-plugin-profile conversion API is broken against this TF
    build) → per-op totals on the TPU 'XLA Ops' line, grouped + top list.

    Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python in the
    environment (the compiled protobuf rejects TF's older generated code).
    """
    import sys as _sys
    from collections import defaultdict

    tf_root = None
    for p in _sys.path:
        cand = os.path.join(p, "tensorflow")
        if os.path.isdir(os.path.join(cand, "tsl")):
            tf_root = cand
            break
    if tf_root and tf_root not in _sys.path:
        _sys.path.insert(0, tf_root)
    from tsl.profiler.protobuf import xplane_pb2

    xplanes = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb"))
    if not xplanes:
        raise FileNotFoundError(f"no xplane under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(xplanes[0], "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise ValueError("no TPU plane in trace")
    plane = planes[0]
    md = plane.event_metadata
    lines = [l for l in plane.lines if l.name == "XLA Ops"]
    line = lines[0] if lines else max(plane.lines, key=lambda l: len(l.events))
    agg = defaultdict(float)
    for e in line.events:
        agg[md[e.metadata_id].name] += e.duration_ps / 1e9  # ms
    grouped = defaultdict(float)
    total = 0.0
    for name, ms in agg.items():
        total += ms
        for label, pat in GROUPS:
            if pat.search(name):
                grouped[label] += ms
                break
        else:
            grouped["other"] += ms
    grouped["TOTAL"] = total
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]
    return (
        {k: round(v, 2) for k, v in grouped.items()},
        [(round(ms, 2), name[:120]) for name, ms in top],
    )


def xprof():
    import jax

    from mhrec_tpu.parallel.mesh import shard_batch
    from mhrec_tpu.utils.observability import profile_trace

    results = {}
    for name, ov in (("loop", {"prior_loss_impl": "loop"}),
                     ("stacked", {"prior_loss_impl": "stacked"})):
        trainer, stream = build(ov)
        for _ in range(4):
            batch = shard_batch(trainer.mesh, next(stream))
            trainer.state, out = trainer._jit_train_step(trainer.state, batch)
        jax.block_until_ready(out["loss"])
        logdir = tempfile.mkdtemp(prefix=f"mhrec_prior_prof_{name}_")
        with profile_trace(logdir):
            for _ in range(12):
                batch = shard_batch(trainer.mesh, next(stream))
                trainer.state, out = trainer._jit_train_step(
                    trainer.state, batch)
            jax.block_until_ready(out["loss"])
        try:
            grouped, top = _aggregate_hlo_stats(logdir)
            results[name] = {"per_12_steps_ms_grouped": grouped,
                             "top_ops_ms": top[:12], "logdir": logdir}
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}",
                             "logdir": logdir}
        print(json.dumps({name: results[name]}, indent=2), flush=True)
    return results


if __name__ == "__main__":
    from mhrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ab", "all"):
        ab()
    if which in ("xprof", "all"):
        xprof()
