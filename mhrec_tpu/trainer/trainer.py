"""Training / evaluation engine.

TPU-native counterpart of the reference ``REC/trainer/trainer.py``:

* iteration-based fit loop: ``total_iters × accumulate_grad`` micro-steps,
  epoch restarts via an endless batch stream, NaN loss check
  (trainer.py:371-373, 494-536);
* one jit-compiled, buffer-donated train step on a ``Mesh(('data',))``; the
  DDP/ZeRO machinery collapses into sharding annotations (grad psum is
  implicit; optimizer state is ZeRO-sharded over the data axis when
  ``shard_optimizer_state``);
* periodic eval → ``early_stopping`` on the configured valid metric →
  best-checkpoint save (trainer.py:574-687);
* evaluation pipeline (trainer.py:698-1152): corpus item embeddings →
  per-user-batch head embeddings → **streamed** full-corpus cosine scoring
  with pad-item masking and history suppression, per-head top-k merged over
  item chunks on device (the reference materializes the full ``[B, H, I]``
  score tensor — impossible for an 8M-item corpus on one chip) → host
  collector → metrics → cross-host SUM reduction / sample-count
  normalization (trainer.py:1046-1123);
* orbax checkpointing of params/optimizer/step/RNG (trainer.py:319-369).
"""

from __future__ import annotations

import logging
import math
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mhrec_tpu.evaluator import Collector, Evaluator
from mhrec_tpu.models.factory import build_model
from mhrec_tpu.parallel.mesh import (
    local_shard, make_mesh, put_replicated, replicate, shard_batch,
    zero_sharded_opt_state,
)
from mhrec_tpu.trainer.lr_schedule import build_schedule
from mhrec_tpu.utils.misc import calculate_valid_score, early_stopping
from mhrec_tpu.utils.observability import get_tensorboard, save_eval_chunk
from mhrec_tpu.utils.wandblogger import WandbLogger

logger = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray
    # dense Adam moments of the item-embedding table, present only under
    # sparse_item_adam (rows touched per step; see trainer/sparse_adam.py)
    table_m: Any = None
    table_v: Any = None
    # gradient-accumulation buffers for the sparse row update
    # (accumulate_grad > 1): per-micro-step (ids, mask, grad rows); the row
    # update applies once per boundary on the deduped union
    acc_ids: Any = None
    acc_mask: Any = None
    acc_g: Any = None
    # first micro-step whose loss was NaN, or -1 (reference checks every
    # step on host, trainer.py:371-373; here the check lives INSIDE the jit
    # so no per-step host sync is needed — the offending step's update is
    # suppressed in-device and the host raises at the next metrics fetch)
    nan_step: Any = None


def _find_item_table_path(params) -> tuple:
    """Locate the item-embedding table leaf (``…/item_embedding/embedding``)
    anywhere in the params tree — top-level for HSTU/SASRec/DualVAE/LLMIDRec,
    nested under ``trunk`` for ComiRec/REMI."""
    hits = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if k == "item_embedding" and isinstance(v, dict) and "embedding" in v:
                hits.append(path + (k, "embedding"))
            else:
                walk(v, path + (k,))

    walk(params, ())
    if len(hits) != 1:
        raise ValueError(
            f"sparse_item_adam needs exactly one item_embedding table in the "
            f"params tree; found {hits or 'none'}"
        )
    return hits[0]


def _get_path(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree, path, value):
    """Functionally set a leaf, shallow-copying dicts along the path
    (missing intermediate nodes are created)."""
    if not path:
        return value
    tree = dict(tree) if isinstance(tree, dict) else {}
    tree[path[0]] = _set_path(tree.get(path[0], {}), path[1:], value)
    return tree


class Trainer:
    def __init__(self, config, dataload):
        self.config = config
        self.dataload = dataload
        if config.get("prng_impl"):
            # library entry (bench/tests build Trainer without run_loop):
            # select the PRNG impl before any key is created in setup_model
            jax.config.update("jax_default_prng_impl", config["prng_impl"])
        self.model = build_model(config, dataload)
        self.collector = Collector(config)
        self.evaluator = Evaluator(config)
        self.mesh = make_mesh(tp_size=int(config.get("tp_size", 1) or 1))
        self.num_processes = jax.process_count()
        self.process_index = jax.process_index()

        optim_args = dict(config["optim_args"] or {})
        self.learning_rate = float(optim_args.get("learning_rate", 1e-3))
        self.weight_decay = float(optim_args.get("weight_decay", 0.0))
        self.total_iters = int(config["total_iters"] or 1000)
        self.accumulate_grad = int(config["accumulate_grad"] or 1)
        self.eval_interval = int(config["eval_interval"] or self.total_iters)
        self.stopping_step = int(config["stopping_step"] or 10)
        self.eval_pred_len = config["eval_pred_len"]
        self.metrics_pred_len_list = config["metrics_pred_len_list"]
        self.valid_metric = config["valid_metric"]
        self.valid_metric_bigger = bool(config["valid_metric_bigger"])
        self.debug = bool(config.get("debug", False))
        self.sparse_item_adam = bool(config.get("sparse_item_adam", False))
        if self.sparse_item_adam:
            if str(config["model"]) == "HLLM":
                raise ValueError(
                    "sparse_item_adam applies to ID-embedding models — the "
                    "HLLM item tower is an LLM, not an embedding table"
                )
        td = str(config.get("item_table_dtype") or "float32").lower()
        if td not in ("float32", "bfloat16"):
            raise ValueError(f"item_table_dtype must be float32|bfloat16, got {td}")
        self._item_table_dtype = jnp.bfloat16 if td == "bfloat16" else jnp.float32
        if self._item_table_dtype == jnp.bfloat16 and not self.sparse_item_adam:
            raise ValueError(
                "item_table_dtype=bfloat16 requires sparse_item_adam (the "
                "dense optax path would accumulate updates in bf16 and stall "
                "below ulp/2)"
            )
        # stochastic rounding on the bf16 row write-back (default on)
        self._table_sr = bool(config.get("item_table_stochastic_round", True))
        # multi-host: per-host unique-id blocks can overlap — dedup + sum
        # gradients inside the jit before the nonlinear Adam row update
        # (sparse_adam.dedup_touched_rows). 'auto' = on iff multi-process;
        # force-enable for single-process tests of the multi-host math.
        sd = config.get("sparse_adam_global_dedup")
        self.sparse_dedup = (
            jax.process_count() > 1 if sd in (None, "auto") else bool(sd)
        )
        self.suppress_history = config.get("suppress_history", True)
        self.item_chunk_size = int(config.get("eval_item_chunk_size", 131072))

        self.schedule = build_schedule(
            config["scheduler_args"], self.learning_rate, self.total_iters
        )
        from mhrec_tpu.trainer.optim import build_optimizer

        self._make_tx = build_optimizer(
            config,
            lambda lr: build_schedule(config["scheduler_args"], lr, self.total_iters),
            self.total_iters,
        )
        self.tx = None  # finalized in setup_model once params exist

        self.state: Optional[TrainState] = None
        self.best_valid_score: Optional[float] = None
        self.best_valid_result = None
        ckpt_dir = config["checkpoint_dir"] or "./saved"
        # run naming mirrors the reference's
        # "{model}-{dataset}-{save_model_note}.pth" (trainer.py:110)
        run_name = str(config["model"])
        if config.get("dataset"):
            run_name += f"-{config['dataset']}"
        if config.get("save_model_note"):
            run_name += f"-{config['save_model_note']}"
        self.run_name = run_name
        self.saved_model_dir = os.path.abspath(
            os.path.join(ckpt_dir, run_name, "ckpt")
        )
        self._ckpt_mgr = None
        self._async_ckpt = bool(config.get("async_checkpoint", True))
        self._jit_train_step = None
        self._chunk_scorer = None
        self.extra_vars: Dict[str, Any] = {}
        self.wandblogger = WandbLogger(config)
        self._tb = None
        self.save_for_eval = bool(config.get("save_for_eval", False))
        # progress-logging cadence + loss precision (reference
        # trainer.py:153-154,376: update_interval default 20,
        # loss_decimal_place default 4)
        self.update_interval = int(config.get("update_interval") or 20)
        # show_progress gates the per-iter progress line (the reference's
        # tqdm bar, trainer.py:539); scalar sinks + NaN check stay on
        sp = config.get("show_progress")
        self.show_progress = True if sp is None else bool(sp)
        self.loss_decimal_place = int(config.get("loss_decimal_place") or 4)
        self.results_rows: list = []

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def setup_model(self, seed: Optional[int] = None):
        seed = int(seed if seed is not None else (self.config["seed"] or 0))
        base = jax.random.PRNGKey(seed)
        k_param, k_drop, k_mix, k_neg, k_state = jax.random.split(base, 5)
        example = self._example_batch(minimal=True)
        import flax.linen as nn

        variables = self.model.init(
            {"params": k_param, "dropout": k_drop, "mix": k_mix, "neg": k_neg},
            example,
            deterministic=False,
        )
        # partition specs from flax metadata (e.g. the row-sharded item table)
        pspecs = nn.get_partition_spec(variables)
        variables = dict(nn.meta.unbox(variables))
        params = variables.pop("params")
        self._param_pspecs = dict(pspecs).get("params", {})
        if str(self.config["model"]) == "HLLM" and not self.config.get("dummy_llm", False):
            from mhrec_tpu.models.hllm.hllm import load_pretrained_towers

            params = load_pretrained_towers(dict(params), self.config)
        # non-trainable collections (e.g. the frozen item-embedding table) —
        # explicitly replicated onto the (possibly multi-host) mesh so they
        # compose with global params inside the jit train step
        self.extra_vars = variables
        if "frozen" in self.extra_vars and self.config.get("all_item_embeds_path"):
            table = np.load(self.config["all_item_embeds_path"])
            self.extra_vars["frozen"]["all_item_embeds"] = table
        self.extra_vars = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), replicate(self.mesh)),
            self.extra_vars,
        )
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logger.info("Trainable parameters: %d", n_params)

        from jax.sharding import NamedSharding, PartitionSpec
        import jax.tree_util as jtu

        rep = replicate(self.mesh)

        def spec_for_path(path):
            node = self._param_pspecs
            for entry in path:
                key = getattr(entry, "key", getattr(entry, "idx", None))
                if isinstance(node, dict) and key in node:
                    node = node[key]
                else:
                    return None
            return node if isinstance(node, PartitionSpec) else None

        def divisible(param, spec):
            for i, ax in enumerate(spec):
                if ax is None:
                    continue
                axes = ax if isinstance(ax, tuple) else (ax,)
                k = 1
                for a in axes:
                    k *= self.mesh.shape[a]
                if i >= param.ndim or param.shape[i] % k:
                    return False
            return True

        # ZeRO-3 / FSDP: shard every large parameter over the 'data' axis
        # (reference DeepSpeed stage 3, trainer.py:439-446). GSPMD inserts
        # the per-layer weight all-gathers and gradient reduce-scatters;
        # optimizer state inherits the sharding below — so a billion-param
        # tower pair stores params+Adam moments at 1/N per chip. Composes
        # with TP: the 'data' axis takes a dim the TP spec left free.
        use_fsdp = bool(self.config.get("fsdp", False)) or (
            int(self.config.get("zero_stage") or 2) >= 3
        )
        fsdp_min = int(self.config.get("fsdp_min_size", 1 << 20) or (1 << 20))
        dp = self.mesh.shape.get("data", 1)

        def fsdp_spec(param, spec):
            base = list(spec) if spec is not None else []
            base += [None] * (param.ndim - len(base))
            for i in sorted(range(param.ndim), key=lambda i: -param.shape[i]):
                if base[i] is None and param.shape[i] % dp == 0 \
                        and param.shape[i] >= dp:
                    base[i] = "data"
                    return PartitionSpec(*base)
            return spec

        def spec_ok(param, spec):
            return (
                spec is not None
                and any(s is not None for s in spec)
                # GQA kv heads (or other small dims) may not divide the mesh
                # axis — replicate those rather than failing
                and all(a in self.mesh.shape for ax in spec if ax is not None
                        for a in (ax if isinstance(ax, tuple) else (ax,)))
                and divisible(param, spec)
            )

        def place(path, param):
            if self.num_processes > 1:
                # host-values → global placement needs plain host data
                param = np.asarray(param)
            spec = spec_for_path(path)
            if not spec_ok(param, spec):
                spec = None
            if use_fsdp and dp > 1 and param.size >= fsdp_min:
                cand = fsdp_spec(param, spec)
                if spec_ok(param, cand):
                    spec = cand
            if spec is not None:
                return jax.device_put(param, NamedSharding(self.mesh, spec))
            return jax.device_put(param, rep)

        params = jtu.tree_map_with_path(place, params)
        tx = self._make_tx(params)
        if self.accumulate_grad > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.accumulate_grad)
        self.tx = tx
        # optimizer-state leaves inherit their parameter's sharding (zeros_like
        # on a sharded array keeps the sharding); ZeRO sharding applies only to
        # still-replicated leaves
        opt_state = self.tx.init(params)
        if self.config.get("shard_optimizer_state", True) and self.mesh.devices.size > 1:
            opt_shardings = zero_sharded_opt_state(self.mesh, opt_state)

            def keep_or_zero(leaf, sh):
                spec = getattr(getattr(leaf, "sharding", None), "spec", None)
                if spec is not None and any(s is not None for s in spec):
                    return leaf
                return jax.device_put(leaf, sh)

            opt_state = jax.tree.map(keep_or_zero, opt_state, opt_shardings)
        table_m = table_v = None
        acc_ids = acc_mask = acc_g = None
        if self.sparse_item_adam:
            self._table_path = _find_item_table_path(params)
            table = _get_path(params, self._table_path)
            if self._item_table_dtype == jnp.bfloat16:
                # halve the dominant HBM object's row bytes (gathers,
                # scatters, lookups); Adam math stays f32 on upcast rows
                # with stochastic-rounded write-back (sparse_adam.py)
                table = table.astype(jnp.bfloat16)
                params = _set_path(params, self._table_path, table)
            table_m = jnp.zeros_like(table, dtype=jnp.float32)
            table_v = jnp.zeros_like(table, dtype=jnp.float32)
            if self.accumulate_grad > 1:
                # per-micro-step row-grad buffers; the row update applies on
                # the deduped union at each accumulation boundary
                from mhrec_tpu.data.trainset import unique_id_cap

                k = self.accumulate_grad
                # the jit sees the assembled global batch: one [cap] block
                # per host (trainset.py make_batch multi-host offsets)
                U = unique_id_cap(
                    self.config, num_hosts=self.num_processes
                ) * self.num_processes
                D = table.shape[-1]
                acc_ids = jnp.zeros((k, U), jnp.int32)
                acc_mask = jnp.zeros((k, U), jnp.float32)
                acc_g = jnp.zeros((k, U, D), jnp.float32)
        step0 = jnp.asarray(0, jnp.int32)
        nan0 = jnp.asarray(-1, jnp.int32)
        if self.num_processes > 1:
            step0 = jax.device_put(np.asarray(0, np.int32), rep)
            nan0 = jax.device_put(np.asarray(-1, np.int32), rep)
            k_state = jax.device_put(np.asarray(k_state), rep)
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            step=step0,
            rng=k_state,
            table_m=table_m,
            table_v=table_v,
            acc_ids=acc_ids,
            acc_mask=acc_mask,
            acc_g=acc_g,
            nan_step=nan0,
        )
        self._build_train_step()
        # resume (reference trainer.py:342-369): load_checkpoint_name points
        # at a checkpoint dir; `resume: true` reloads this run's latest
        if self.config["load_checkpoint_name"]:
            self.saved_model_dir = os.path.abspath(self.config["load_checkpoint_name"])
            self._ckpt_mgr = None
            if self.load_checkpoint():
                logger.info("resumed from %s at step %d",
                            self.saved_model_dir, int(self.state.step))
        elif self.config.get("resume", False):
            if self.load_checkpoint():
                logger.info("resumed at step %d", int(self.state.step))
        return self.state

    def _example_batch(self, minimal: bool = False) -> Dict[str, jnp.ndarray]:
        """``minimal=True`` shrinks the batch/negative dims to 1 — parameter
        SHAPES are batch-independent, so ``model.init`` over the minimal
        batch creates identical params while tracing a forward that is
        ~B·K× cheaper in FLOPs and peak HBM (a 1B-tower HLLM init at the
        protocol batch otherwise materializes multi-GB f32 activations
        before training even starts). The real shapes compile at the first
        train step as before."""
        c = self.config
        B = 1 if minimal else c["train_batch_size"]
        L, P = c["MAX_ITEM_LIST_LENGTH"], c["pred_len"]
        C = c["eval_num_cats"]
        n_cats = (C + 1) if (c["loss"] == "prior" and c["neg_sample_by_cat"]
                             and c["category_by"] == "item") else 1
        K = max(
            1,
            1 if minimal else (
                math.ceil((c["num_negatives"] or L * B) / B)
                if c["num_negatives"]
                else L
            ),
        )
        batch = {
            "items": jnp.ones((B, L + P), jnp.int32),
            "neg_items": jnp.ones((B, n_cats, K), jnp.int32),
            "masked_index": jnp.ones((B, L + P), jnp.int32),
            "tag_categories": jnp.zeros(
                (B, L + P, C) if c["loss"] == "prior" else (B, 0, 0), jnp.int8
            ),
        }
        if str(c["model"]) == "HLLM" and not c.get("freeze_item_llm", False):
            n_emb = max(int(c.get("item_emb_token_n", 1) or 0), 1)
            T = int(c.get("MAX_TEXT_LENGTH", 64)) + n_emb
            if c.get("packed_item_tower", False):
                n_items = B * (L + P) + B * n_cats * K
                per_item = 2 + n_emb  # example rows: 2 tokens + emb slots
                chunk = int(c.get("pack_chunk", 2048) or 0)
                if chunk:
                    from mhrec_tpu.models.llm.packed import round_chunk_rows

                    per_row = max(1, chunk // per_item)
                    c0 = -(-n_items // per_row)   # ceil items/row-capacity
                    # same rounding policy as pack_items (ADVICE r2)
                    C = round_chunk_rows(c0, jax.device_count())
                    batch["packed_tokens"] = jnp.ones((C, chunk), jnp.int32)
                    batch["packed_segment_ids"] = jnp.ones((C, chunk), jnp.int32)
                    batch["packed_positions"] = jnp.zeros((C, chunk), jnp.int32)
                    idx = jnp.arange(n_items, dtype=jnp.int32)
                    batch["emb_slots"] = (
                        (idx // per_row) * chunk + (idx % per_row) * per_item + 2
                    )
                else:
                    bucket = int(c.get("pack_bucket", 2048))
                    S = ((n_items * per_item + bucket - 1) // bucket) * bucket
                    batch["packed_tokens"] = jnp.ones((S,), jnp.int32)
                    batch["packed_segment_ids"] = jnp.ones((S,), jnp.int32)
                    batch["packed_positions"] = jnp.zeros((S,), jnp.int32)
                    batch["emb_slots"] = (
                        jnp.arange(n_items, dtype=jnp.int32) * per_item + 2
                    )
                batch["n_pos_items"] = jnp.asarray(B * (L + P), jnp.int32)
            else:
                batch["pos_tokens"] = jnp.ones((B * (L + P), T), jnp.int32)
                batch["pos_token_lens"] = jnp.full((B * (L + P),), 2, jnp.int32)
                batch["neg_tokens"] = jnp.ones((B * n_cats * K, T), jnp.int32)
                batch["neg_token_lens"] = jnp.full((B * n_cats * K,), 2, jnp.int32)
                if c.get("use_video", False) and not c.get("dummy_llm", False):
                    from mhrec_tpu.data.vision import resolve_patch_geometry

                    ps, tps, _m = resolve_patch_geometry(c)
                    gt = max(int(c.get("video_nframes", 4) or 4) // tps, 1)
                    gh = int(c.get("img_height", 224)) // ps
                    gw = int(c.get("img_width", 224)) // ps
                    pd = 3 * tps * ps * ps
                    batch["pos_pixel_patches"] = jnp.zeros(
                        (B * (L + P), gt * gh * gw, pd), jnp.float32
                    )
                    batch["neg_pixel_patches"] = jnp.zeros(
                        (B * n_cats * K, gt * gh * gw, pd), jnp.float32
                    )
                elif c.get("use_image", False) and not c.get("dummy_llm", False):
                    from mhrec_tpu.data.vision import resolve_patch_geometry

                    ps, tps, _m = resolve_patch_geometry(c)
                    if c.get("dynamic_image_res", False) and tps == 1 and _m == 1:
                        from mhrec_tpu.data.vision import AnyResPreprocessor

                        S = int(c.get("img_height", 224))
                        pins = c.get("image_grid_pinpoints") or [
                            (2 * S, S), (S, 2 * S), (2 * S, 2 * S),
                            (3 * S, S), (S, 3 * S)]
                        dyn = AnyResPreprocessor(ps, S, pins)
                        for pref, n in (("pos", B * (L + P)),
                                        ("neg", B * n_cats * K)):
                            batch[f"{pref}_pixel_patches"] = jnp.zeros(
                                (n, dyn.c_cap, dyn.P, dyn.patch_dim),
                                jnp.float32)
                            batch[f"{pref}_tok_src"] = jnp.full(
                                (n, dyn.token_cap), -1, jnp.int32)
                            batch[f"{pref}_img_src"] = jnp.full(
                                (n, T), -1, jnp.int32)
                    elif c.get("dynamic_image_res", False):
                        from mhrec_tpu.data.vision import DynamicImagePreprocessor

                        dyn = DynamicImagePreprocessor(
                            patch_size=ps, temporal_patch_size=tps,
                            spatial_merge_size=_m,
                            min_pixels=int(c.get("image_min_pixels", 4 * 28 * 28)),
                            max_pixels=min(
                                int(c.get("image_max_pixels", 256 * 28 * 28)),
                                max(1, (int(c.get("MAX_TEXT_LENGTH", 64)) - 8))
                                * (ps * _m) ** 2,
                            ),
                        )
                        for pref, n in (("pos", B * (L + P)),
                                        ("neg", B * n_cats * K)):
                            batch[f"{pref}_pixel_patches"] = jnp.zeros(
                                (n, dyn.patch_cap, dyn.patch_dim), jnp.float32)
                            batch[f"{pref}_patch_valid"] = jnp.zeros(
                                (n, dyn.patch_cap), bool)
                            batch[f"{pref}_patch_hw"] = jnp.zeros(
                                (n, dyn.patch_cap, 2), jnp.int32)
                            batch[f"{pref}_img_src"] = jnp.full(
                                (n, T), -1, jnp.int32)
                            batch[f"{pref}_img_pos"] = jnp.zeros(
                                (n, 3, T), jnp.int32)
                    else:
                        gh = int(c.get("img_height", 224)) // ps
                        gw = int(c.get("img_width", 224)) // ps
                        pd = 3 * tps * ps * ps
                        batch["pos_pixel_patches"] = jnp.zeros(
                            (B * (L + P), gh * gw, pd), jnp.float32
                        )
                        batch["neg_pixel_patches"] = jnp.zeros(
                            (B * n_cats * K, gh * gw, pd), jnp.float32
                        )
        return batch

    def _build_train_step(self):
        model, tx = self.model, self.tx

        if self.sparse_item_adam:
            from mhrec_tpu.trainer.sparse_adam import (
                SparseAdamConfig, dedup_touched_rows, sparse_adamw_row_update,
            )

            if str(self.config.get("sparse_adam_impl") or "xla") == "pallas":
                # fused gather→AdamW→scatter kernel (ops/pallas/row_adam_tpu):
                # measured AT the XLA scatter formulation's per-descriptor
                # floor on v5e (BASELINE r5) — ships opt-in
                from mhrec_tpu.ops.pallas.row_adam_tpu import (
                    sparse_adamw_row_update_pallas as sparse_adamw_row_update,
                )

            sa_cfg = SparseAdamConfig(weight_decay=self.weight_decay)
            schedule = self.schedule
            use_dedup = self.sparse_dedup
            table_path = self._table_path
            k_acc = self.accumulate_grad
            use_sr = self._item_table_dtype == jnp.bfloat16 and self._table_sr

            def train_step(state: TrainState, batch, extra_vars):
                rng = jax.random.fold_in(state.rng, state.step)
                drop_rng, mix_rng, neg_rng = jax.random.split(rng, 3)
                # separate stream (fold_in, not a wider split) so enabling
                # SR never shifts the dropout/mix/neg streams of f32 runs
                sr_key = jax.random.fold_in(rng, 17) if use_sr else None
                ids = batch.pop("unique_ids")
                umask = batch.pop("unique_mask")
                batch = dict(batch, step=state.step)
                table = _get_path(state.params, table_path)
                # f32 sub-table: forward/grad math identical to an f32-stored
                # table; only the STORAGE (gather/scatter row bytes) shrinks
                sub0 = table[ids].astype(jnp.float32)

                def loss_fn(params, sub):
                    # model-agnostic sparse lookup: ItemEmbed reads the
                    # gathered sub-table from the 'sub' collection — the
                    # batch carries LOCAL indices into it (flax shape-checks
                    # params on retrieval, so the param leaf can't be
                    # substituted directly)
                    sub_col = _set_path({}, table_path[:-1] + ("table",), sub)
                    out = model.apply(
                        {"params": params, "sub": sub_col, **extra_vars},
                        batch,
                        deterministic=False,
                        rngs={"dropout": drop_rng, "mix": mix_rng, "neg": neg_rng},
                    )
                    return out["loss"], out

                # the table leaf inside arg-0 params is unused (replaced by
                # sub before apply) → its grad is a zeros array the optimizer
                # masks off and XLA dead-code-eliminates
                (loss, out), (grads, g_sub) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(state.params, sub0)
                # in-jit NaN guard (reference trainer.py:371-373 checks every
                # step on host): record the first NaN step and zero this
                # step's grads so params are never contaminated; the host
                # raises when it next fetches metrics
                bad = jnp.isnan(loss)
                nan_step = jnp.where(
                    (state.nan_step < 0) & bad, state.step, state.nan_step
                )
                grads = jax.tree.map(
                    lambda g: jnp.where(bad, jnp.zeros_like(g), g), grads
                )
                g_sub = jnp.where(bad, jnp.zeros_like(g_sub), g_sub)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)

                if k_acc > 1:
                    # accumulate this micro-step's rows; apply the deduped
                    # union once per boundary (MultiSteps-mean parity: the
                    # summed grads divide by k)
                    slot = state.step % k_acc
                    acc_ids = jax.lax.dynamic_update_slice(
                        state.acc_ids, ids[None], (slot, 0))
                    acc_mask = jax.lax.dynamic_update_slice(
                        state.acc_mask, umask[None], (slot, 0))
                    acc_g = jax.lax.dynamic_update_slice(
                        state.acc_g, g_sub.astype(jnp.float32)[None],
                        (slot, 0, 0))

                    def apply_rows(tmv):
                        tbl, m0, v0 = tmv
                        ids_u, mask_u, g_u = dedup_touched_rows(
                            acc_ids.reshape(-1), acc_mask.reshape(-1),
                            acc_g.reshape(-1, acc_g.shape[-1]) / k_acc,
                        )
                        outer = state.step // k_acc
                        return sparse_adamw_row_update(
                            tbl, m0, v0, ids_u, mask_u, g_u,
                            lr=schedule(outer), step_count=outer, cfg=sa_cfg,
                            sr_key=sr_key,
                        )

                    new_table, m, v = jax.lax.cond(
                        slot == k_acc - 1, apply_rows, lambda t: t,
                        (table, state.table_m, state.table_v),
                    )
                    params = _set_path(params, table_path, new_table)
                    new_state = state.replace(
                        params=params, opt_state=opt_state,
                        step=state.step + 1, table_m=m, table_v=v,
                        acc_ids=acc_ids, acc_mask=acc_mask, acc_g=acc_g,
                        nan_step=nan_step,
                    )
                    return new_state, out

                if use_dedup:
                    ids_u, mask_u, g_u = dedup_touched_rows(ids, umask, g_sub)
                    sub_u = None  # rep slots permuted — regather inside
                else:
                    ids_u, mask_u, g_u = ids, umask, g_sub
                    sub_u = sub0
                # row-update from the PRE-apply table: the table's optax
                # update is set_to_zero, so the values are identical, but
                # consuming state.params here lets XLA dead-code-eliminate
                # apply_updates' add-zero over the full [N, D] table (a
                # runtime-zeros add is a full read+write HBM pass otherwise)
                new_table, m, v = sparse_adamw_row_update(
                    table, state.table_m, state.table_v,
                    ids_u, mask_u, g_u,
                    lr=schedule(state.step), step_count=state.step, cfg=sa_cfg,
                    sub0=sub_u, sr_key=sr_key,
                )
                params = _set_path(params, table_path, new_table)
                new_state = state.replace(
                    params=params, opt_state=opt_state, step=state.step + 1,
                    table_m=m, table_v=v, nan_step=nan_step,
                )
                return new_state, out

        else:

            def train_step(state: TrainState, batch, extra_vars):
                rng = jax.random.fold_in(state.rng, state.step)
                drop_rng, mix_rng, neg_rng = jax.random.split(rng, 3)
                batch = dict(batch, step=state.step)  # e.g. DualVAE KL annealing

                def loss_fn(params):
                    out = model.apply(
                        {"params": params, **extra_vars},
                        batch,
                        deterministic=False,
                        rngs={"dropout": drop_rng, "mix": mix_rng, "neg": neg_rng},
                    )
                    return out["loss"], out

                (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
                # in-jit NaN guard — see the sparse path above
                bad = jnp.isnan(loss)
                nan_step = jnp.where(
                    (state.nan_step < 0) & bad, state.step, state.nan_step
                )
                grads = jax.tree.map(
                    lambda g: jnp.where(bad, jnp.zeros_like(g), g), grads
                )
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                new_state = state.replace(
                    params=params, opt_state=opt_state, step=state.step + 1,
                    nan_step=nan_step,
                )
                return new_state, out

        jitted = jax.jit(train_step, donate_argnums=(0,))
        # raw jitted step kept for AOT introspection (bench.py lowers it
        # once for XLA cost analysis and executes the same compiled object)
        self._jitted_train_step = jitted
        self._jit_train_step = lambda state, batch: jitted(
            state, batch, self.extra_vars
        )

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------
    def fit(self, train_batcher, valid_batcher=None):
        if self.state is None:
            self.setup_model()
        micro_steps = self.total_iters * self.accumulate_grad
        stream = train_batcher.infinite_batches(prefetch=2)
        stop_flag = False
        cur_step = 0
        t_data = t_step = 0.0
        t_steady = None
        it_steady = 0
        t0 = time.time()
        logs: Dict[str, float] = {}
        start_it = int(self.state.step)  # nonzero after resume
        if start_it:
            logger.info("resuming fit at micro-step %d/%d", start_it, micro_steps)
        it = start_it - 1
        for it in range(start_it, micro_steps):
            td = time.time()
            batch = next(stream)
            batch = shard_batch(self.mesh, batch)
            t_data += time.time() - td
            ts = time.time()
            self.state, out = self._jit_train_step(self.state, batch)
            # the NaN check also fires on the final step, so runs shorter
            # than update_interval can't silently train on NaN losses
            if (it + 1) % self.update_interval == 0 or self.debug \
                    or it == micro_steps - 1:
                loss = float(out["loss"])
                # nan_step is maintained INSIDE the jit (every step): it
                # carries the first offending micro-step's index, and that
                # step's update was suppressed on device, so no NaN ever
                # reached the params even between host fetches
                ns = int(self.state.nan_step) if self.state.nan_step is not None else -1
                if ns >= 0:
                    raise RuntimeError(f"NaN loss at iter {ns}")
                if math.isnan(loss):
                    raise RuntimeError(f"NaN loss at iter {it}")
                logs = {k: float(v) for k, v in out.items() if hasattr(v, "ndim")}
                t_step += time.time() - ts
                if t_steady is None:
                    # first fetch forces the jit compile + first execution —
                    # from here on the loop is steady-state
                    t_steady, it_steady = time.time(), it + 1
                self._log_scalars(logs, step=it + 1, head="train")
                if self.show_progress:
                    logger.info(
                        "iter %d/%d loss=%.*f lr=%.3e data=%.2fs step=%.2fs",
                        it + 1, micro_steps, self.loss_decimal_place, loss,
                        float(self.schedule(int(self.state.step) // self.accumulate_grad
                                            if self.accumulate_grad > 1 else int(self.state.step))),
                        t_data, t_step,
                    )
            else:
                t_step += time.time() - ts

            opt_step = (it + 1) // self.accumulate_grad
            if (
                valid_batcher is not None
                and (it + 1) % (self.eval_interval * self.accumulate_grad) == 0
            ):
                result = self.evaluate(valid_batcher, load_best_model=False)
                score = calculate_valid_score(
                    result, self.valid_metric, self.eval_pred_len
                )
                (
                    self.best_valid_score, cur_step, stop_flag, update_flag,
                ) = early_stopping(
                    score, self.best_valid_score, cur_step, self.stopping_step,
                    bigger=self.valid_metric_bigger,
                )
                logger.info(
                    "valid @ opt_step %d: %s=%.6f (best %.6f)",
                    opt_step, self.valid_metric, score, self.best_valid_score,
                )
                for section, metrics in result.items():
                    self._log_scalars(metrics, step=opt_step, head=f"valid_{section}")
                if update_flag:
                    self.best_valid_result = result
                    self.save_checkpoint()
                if stop_flag:
                    logger.info("early stopping at opt_step %d", opt_step)
                    break
            if self.debug and it >= 9:
                break
        wall = time.time() - t0
        n_done = it + 1 - start_it
        n_examples = n_done * self.config["train_batch_size"]
        rate = n_examples / max(wall, 1e-9)
        steady_rate = rate
        if t_steady is not None and it + 1 > it_steady:
            steady_rate = (
                (it + 1 - it_steady) * self.config["train_batch_size"]
                / max(time.time() - t_steady, 1e-9)
            )
        self.finalize_checkpoints()
        logger.info(
            "fit done: %d micro-steps, %.1fs, %.1f examples/s"
            " (%.1f steady-state, excluding compile/warmup)",
            n_done, wall, rate, steady_rate,
        )
        return {
            "iters": n_done, "wall_s": wall, "examples_per_s": rate,
            "steady_examples_per_s": steady_rate, **logs,
        }

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def _ckpt_manager(self):
        import orbax.checkpoint as ocp

        logging.getLogger("absl").setLevel(logging.WARNING)
        if self._ckpt_mgr is None:
            os.makedirs(self.saved_model_dir, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                self.saved_model_dir, options=ocp.CheckpointManagerOptions(max_to_keep=1)
            )
        return self._ckpt_mgr

    def save_checkpoint(self):
        import orbax.checkpoint as ocp

        mgr = self._ckpt_manager()
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "rng": self.state.rng,
            "best_valid_score": np.asarray(
                self.best_valid_score if self.best_valid_score is not None else np.nan
            ),
        }
        if self.state.table_m is not None:
            payload["table_m"] = self.state.table_m
            payload["table_v"] = self.state.table_v
        mgr.save(int(self.state.step), args=ocp.args.StandardSave(payload))
        # async by default: orbax copies device->host synchronously inside
        # save() (state consistency) but commits the DISK write on a
        # background thread, so training resumes while the bytes land
        # (reference blocks on lite.save, trainer.py:319-340). The write is
        # awaited at every consume point: next save (orbax-internal), any
        # restore, end of fit, and interpreter exit (non-daemon writer).
        if not self._async_ckpt:
            mgr.wait_until_finished()

    def finalize_checkpoints(self):
        """Block until any in-flight async checkpoint write has committed.

        Logs when it actually had to wait (ADVICE r4): with async saves on
        by default, a crash between ``save()`` returning and the background
        commit finishing silently loses the newest checkpoint — the logged
        wait duration makes those exposure windows visible in run logs."""
        if self._ckpt_mgr is not None:
            t0 = time.time()
            self._ckpt_mgr.wait_until_finished()
            waited = time.time() - t0
            if waited > 0.05:
                logger.info(
                    "waited %.2fs for an in-flight async checkpoint commit "
                    "(the run was exposed to losing that checkpoint on a "
                    "crash for at most this long)", waited,
                )

    def load_checkpoint(self) -> bool:
        import orbax.checkpoint as ocp

        mgr = self._ckpt_manager()
        self.finalize_checkpoints()
        latest = mgr.latest_step()
        if latest is None:
            return False

        # restore against an ABSTRACT template (shape/dtype/sharding only)
        # and free the live params + optimizer buffers first: restoring
        # billion-parameter states against the concrete arrays transiently
        # holds BOTH copies on device — a ~10 GB state OOMs a 16 GB chip at
        # exactly the load-best-model step the eval path always takes
        def abstract(x):
            if hasattr(x, "dtype") and hasattr(x, "shape"):
                sharding = getattr(x, "sharding", None)
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            return x

        template = {
            "params": jax.tree.map(abstract, self.state.params),
            "opt_state": jax.tree.map(abstract, self.state.opt_state),
            "step": abstract(self.state.step),
            "rng": abstract(self.state.rng),
            "best_valid_score": np.asarray(np.nan),
        }
        if self.state.table_m is not None:
            template["table_m"] = jax.tree.map(abstract, self.state.table_m)
            template["table_v"] = jax.tree.map(abstract, self.state.table_v)
        keep = dict(
            acc_ids=self.state.acc_ids, acc_mask=self.state.acc_mask,
            acc_g=self.state.acc_g, nan_step=self.state.nan_step,
        )
        for leaf in jax.tree.leaves(
            (self.state.params, self.state.opt_state,
             self.state.table_m, self.state.table_v)
        ):
            if hasattr(leaf, "delete"):
                leaf.delete()
        self.state = None
        restored = mgr.restore(latest, args=ocp.args.StandardRestore(template))
        self.state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
            rng=jnp.asarray(restored["rng"]),
            table_m=restored.get("table_m"),
            table_v=restored.get("table_v"),
            # accumulation buffers restart empty — checkpoints are written at
            # eval boundaries, which align with accumulation boundaries
            # (a checkpoint is only ever written from a clean state)
            **keep,
        )
        bvs = float(restored["best_valid_score"])
        self.best_valid_score = None if math.isnan(bvs) else bvs
        return True

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def compute_item_feature(self, return_host: bool = False):
        """Corpus item embeddings (reference compute_item_feature,
        trainer.py:731-824). ID models: one normalized matrix. Text models:
        chunked item-tower pass over the whole corpus → RAW embedding table
        (normalization happens at scoring time, reference hllm predict)."""
        if getattr(self.model, "needs_item_corpus_pass", False):
            if getattr(self.model, "freeze_item_llm", False):
                return self.extra_vars["frozen"]["all_item_embeds"]
            from mhrec_tpu.data.textset import BatchTextBatcher

            # reuse across evals: the batcher's ItemTextCache holds every
            # item's token array, so rebuilding it re-tokenized the whole
            # corpus each eval
            if getattr(self, "_corpus_batcher", None) is None:
                bs = None
                if self.num_processes > 1:
                    # chunk rows are sharded over ALL devices of the global
                    # mesh (shard_identical) — round the chunk size up
                    total = self.mesh.devices.size
                    base = (self.config["MAX_ITEM_LIST_LENGTH"]
                            * self.config["train_batch_size"])
                    bs = -(-base // total) * total
                    if self.config.get("packed_corpus_pass", False):
                        raise ValueError(
                            "packed_corpus_pass is single-process only; the "
                            "dense corpus pass shards rows across hosts"
                        )
                self._corpus_batcher = BatchTextBatcher(
                    self.config, self.dataload, batch_size=bs
                )
            corpus = self._corpus_batcher
            if not hasattr(self, "_item_chunk_fn") or self._item_chunk_fn is None:
                self._item_chunk_fn = jax.jit(
                    lambda p, tok, lens, px, extra=None: self.model.apply(
                        {"params": p, **self.extra_vars}, tok, lens, px,
                        extra,
                        method="compute_item_chunk",
                    ),
                    static_argnums=(),
                )
            packed_fn = None
            chunks = []
            from mhrec_tpu.data.trainset import _prefetch_iterator

            # overlap host chunk prep (token-matrix gathers, H2D staging)
            # with the device compute of the previous chunk
            for cb in _prefetch_iterator(corpus.batches(), 2):
                if "packed_tokens" in cb:
                    if packed_fn is None:
                        packed_fn = jax.jit(
                            lambda p, pt, sid, pos, slots: self.model.apply(
                                {"params": p, **self.extra_vars},
                                pt, sid, pos, slots,
                                method="encode_items_packed",
                            )
                        )
                    emb = packed_fn(
                        self.state.params,
                        jnp.asarray(cb["packed_tokens"]),
                        jnp.asarray(cb["packed_segment_ids"]),
                        jnp.asarray(cb["packed_positions"]),
                        jnp.asarray(cb["emb_slots"]),
                    )
                else:
                    px = cb.get("pixel_patches")
                    extra_keys = ("patch_valid", "patch_hw", "img_src",
                                  "img_pos", "tok_src")
                    extra = ({k: cb[k] for k in extra_keys if k in cb}
                             if "img_src" in cb else None)
                    if self.num_processes > 1:
                        from mhrec_tpu.parallel.mesh import shard_identical

                        tok = shard_identical(self.mesh, cb["tokens"])
                        lens = shard_identical(self.mesh, cb["lens"])
                        pxd = (shard_identical(self.mesh, px)
                               if px is not None else None)
                        if extra is not None:
                            extra = {k: shard_identical(self.mesh, v)
                                     for k, v in extra.items()}
                    else:
                        tok = jnp.asarray(cb["tokens"])
                        lens = jnp.asarray(cb["lens"])
                        pxd = jnp.asarray(px) if px is not None else None
                        if extra is not None:
                            extra = {k: jnp.asarray(v) for k, v in extra.items()}
                    emb = self._item_chunk_fn(self.state.params, tok, lens, pxd,
                                              extra)
                if self.num_processes > 1 and not emb.is_fully_replicated:
                    # rows are device-sharded: reassemble the full chunk on
                    # every host (process order == shard order)
                    from jax.experimental import multihost_utils

                    loc = local_shard(emb)
                    emb = multihost_utils.process_allgather(loc).reshape(
                        -1, loc.shape[-1]
                    )
                chunks.append(np.asarray(emb)[: cb["n_real"]])
            host = np.concatenate(chunks, axis=0)
            if return_host:
                return host
            return (put_replicated(self.mesh, host)
                    if self.num_processes > 1 else jnp.asarray(host))
        if not hasattr(self, "_item_feat_fn") or self._item_feat_fn is None:
            self._item_feat_fn = jax.jit(
                lambda p: self.model.apply(
                    {"params": p, **self.extra_vars}, method="compute_item_all"
                )
            )
        return self._item_feat_fn(self.state.params)

    def evaluate(self, eval_batcher, load_best_model: bool = False):
        if load_best_model:
            if not self.load_checkpoint():
                logger.warning("no checkpoint found; evaluating current params")
        needs_corpus = getattr(self.model, "needs_item_corpus_pass", False)
        # GAUC/meanrank and the VALUE metrics (MAE/RMSE/LogLoss) stream
        # (count-above-target / per-target scores per chunk) for ANY head
        # count — any process count, host-table compatible. Head-0 semantics
        # match the full-tensor path (collector._collect_meanrank /
        # _collect_tgt_score take scores[:, 0]); for multi-head models the
        # per-head prior masks come from routing the batch's own targets
        # through score_items (``target_score_mh_fn``). Only raw-score dumps
        # (rec.score) still need the full [B, H, I] tensor, feasible
        # single-process on small corpora.
        need_meanrank = self.collector.register.need("rec.meanrank")
        need_score = self.collector.register.need("rec.score")
        need_tgt = self.collector.register.need("rec.tgt_score")
        stream_meanrank = need_meanrank and not need_score
        stream_tgt = need_tgt and not need_score
        need_full = need_score
        if need_full and self.num_processes > 1:
            raise ValueError(
                "raw-score dumps (rec.score) are single-process only; drop "
                "them or evaluate on one host"
            )
        self.collector.external_meanrank = stream_meanrank
        self.collector.external_tgt_score = stream_tgt
        self.collector.set_logit_scale(self._eval_logit_scale())
        host_mode = self._use_host_item_table(needs_corpus, need_full)
        raw_item_table = None
        raw_host = norm_host = None
        item_feats = None
        if host_mode:
            # corpus-scale: item table stays in host RAM; eval streams each
            # item chunk to the device exactly once (chunk-outer loop)
            raw_host = self.compute_item_feature(return_host=True)
            norm = np.linalg.norm(raw_host, axis=-1, keepdims=True)
            norm_host = raw_host / np.clip(norm, 1e-12, None)
        else:
            item_feats = self.compute_item_feature()
            if needs_corpus:
                # text models: raw table feeds the user tower; normalized copy
                # feeds cosine scoring (reference hllm predict normalizes a copy)
                raw_item_table = item_feats
                norm = jnp.linalg.norm(item_feats, axis=-1, keepdims=True)
                item_feats = item_feats / jnp.clip(norm, 1e-12, None)
        item_tags = None
        if self.dataload.item_tag_matrix is not None:
            if host_mode:
                item_tags = np.asarray(self.dataload.item_tag_matrix)
            elif self.num_processes > 1:
                item_tags = put_replicated(self.mesh, self.dataload.item_tag_matrix)
            else:
                item_tags = jnp.asarray(self.dataload.item_tag_matrix)
        if self.dataload.item_orig_tag_matrix is not None:
            # Entropy is computed over the ORIGINAL tags even under the
            # random_tags/all_tags ablations (reference trainer.py:823 passes
            # all_original_item_tags to set_all_tags)
            self.collector.set_all_tags(np.asarray(self.dataload.item_orig_tag_matrix))

        top_k = max(self.config["topk"])
        switch_correct_sum = None
        n_eval_samples = 0

        if host_mode:
            results = self._host_table_topk_results(
                eval_batcher, raw_host, norm_host, item_tags, top_k,
                stream_meanrank=stream_meanrank, stream_tgt=stream_tgt,
            )
        else:
            results = self._device_topk_results(
                eval_batcher, item_feats, raw_item_table, item_tags, top_k,
                need_full, stream_meanrank=stream_meanrank,
                stream_tgt=stream_tgt,
            )
        for batch, n_real, topk_vals, topk_idx, pe in results:
            if need_full:
                # topk_vals carries the full [n_real, H, I] scores here
                self.collector.eval_batch_collect(
                    scores=topk_vals,
                    positive_i=batch["item_target"][:n_real],
                    tag_category=batch["target_tags"][:n_real],
                    outlier_users=batch["outlier_users"][:n_real],
                )
                n_eval_samples += n_real
                continue

            if self.save_for_eval and self.process_index == 0:
                save_eval_chunk(
                    os.path.join(self.saved_model_dir, "saved_eval"),
                    n_eval_samples,
                    user_ids=batch["user_ids"][:n_real],
                    topk_values=topk_vals,
                    topk_indices=topk_idx,
                    user_embs=np.asarray(pe["user_emb"])[:n_real],
                    head_embs=np.asarray(pe["head_embs"])[:n_real],
                )
            log_this_batch = (
                bool(self.config.get("log_detailed_results", False))
                and self.process_index == 0
            )
            detailed = self.collector.eval_batch_collect(
                positive_i=batch["item_target"][:n_real],
                tag_category=batch["target_tags"][:n_real],
                outlier_users=batch["outlier_users"][:n_real],
                topk_values=topk_vals,
                topk_indices=topk_idx,
                log_detailed_results=log_this_batch,
            )
            if log_this_batch and detailed is not None:
                # per-user recommendation dump with head provenance
                # (reference trainer.py:999-1015 save_log_dict path)
                from mhrec_tpu.utils.observability import save_log_dict

                id2item = self.dataload.id2token["item_id"]
                id2user = self.dataload.id2token["user_id"]
                detailed["user"] = [
                    id2user[u] for u in batch["user_ids"][:n_real].tolist()
                ]
                detailed["item_tgt"] = [
                    [id2item[i] for i in row]
                    for row in batch["item_target"][:n_real].tolist()
                ]
                detailed["recommend_items"] = [
                    [id2item[i] for i in row] for row in detailed.pop("idx")
                ]
                detailed.pop("idx_by_head", None)
                save_log_dict(
                    os.path.join(
                        self.saved_model_dir, "detailed",
                        f"batch_{n_eval_samples:07d}",
                    ),
                    detailed,
                )
            if "switch_correct" in pe:
                # per-row [B_local, C] → sum this host's real rows
                sc = np.asarray(pe["switch_correct"])[:n_real].sum(axis=0)
                switch_correct_sum = sc if switch_correct_sum is None else switch_correct_sum + sc
            n_eval_samples += n_real

        raw_sections: Dict[str, Dict[str, Any]] = {}
        # non-subgroup metrics divide by the GLOBAL eval-set size, matching the
        # reference (trainer.py:1038-1041: len(sampler.dataset), not reduced)
        num_total = float(len(eval_batcher))

        shared_struct = self.collector.get_data_struct(-1)
        if "rec.rec_tags" in shared_struct:
            # shared (tag-entropy) metrics only exist with category structure
            shared = self.evaluator.evaluate(shared_struct, pred_len=-1)
            if shared:
                raw_sections["shared"] = shared
        self.collector.reset_all_tags()

        for p in self.metrics_pred_len_list:
            struct = self.collector.get_data_struct(p)
            res = self.evaluator.evaluate(struct, pred_len=p)
            raw_sections[f"pred_{p}"] = res

        result_summary, switch_accs = self._normalize_all(
            raw_sections, num_total, switch_correct_sum, n_eval_samples
        )
        for section, metrics in result_summary.items():
            self.results_rows.append({"section": section, **metrics})
        if self.process_index == 0:
            try:
                import pandas as pd

                os.makedirs(self.saved_model_dir, exist_ok=True)
                pd.DataFrame(self.results_rows).to_pickle(
                    os.path.join(self.saved_model_dir, "results.pkl")
                )
            except Exception:
                pass
        if switch_accs:
            result_summary.setdefault("shared", {}).update(switch_accs)
        return result_summary

    def _log_scalars(self, metrics: Dict[str, Any], step: int, head: str):
        numeric = {k: v for k, v in metrics.items() if isinstance(v, (int, float))}
        self.wandblogger.log_metrics(numeric, step=step, head=head)
        if self._tb is None:
            self._tb = get_tensorboard(self.config) or False
        if self._tb:
            for k, v in numeric.items():
                self._tb.add_scalar(f"{head}/{k}", v, step)

    def _normalize_all(self, sections, num_total: float,
                       switch_correct_sum=None, n_eval_samples: int = 0):
        """SUM-reduce every metric scalar across hosts in ONE collective,
        then divide by (reduced) sample counts (reference trainer.py:1046-1123
        all_reduces each scalar separately — dozens of blocking collectives
        per eval on a pod; here the scalars ride a single allgather)."""
        dp = self.config["metric_decimal_place"] or 5
        flat: list = []
        layout: list = []  # (section, key, is_tuple)
        for sec, result in sections.items():
            for k in sorted(result.keys()):
                v = result[k]
                if isinstance(v, tuple):
                    # (sum, count[, post-reduce transform]) — e.g. RMSE
                    # reduces the squared-error sum then sqrts
                    layout.append((sec, k, v[2] if len(v) > 2 else True))
                    flat += [float(v[0]), float(v[1])]
                else:
                    layout.append((sec, k, False))
                    flat.append(float(v))
        n_switch = 0
        if switch_correct_sum is not None and n_eval_samples > 0:
            n_switch = len(switch_correct_sum)
            flat += [float(x) for x in switch_correct_sum]
            flat.append(float(n_eval_samples))
        reduced = self._reduce_sums(np.asarray(flat, np.float64))
        out: Dict[str, Dict[str, float]] = {sec: {} for sec in sections}
        i = 0
        for sec, k, is_tuple in layout:
            if is_tuple:
                val, n = reduced[i], reduced[i + 1]
                i += 2
                mean = val / max(1.0, n)
                if is_tuple == "sqrt":
                    mean = float(np.sqrt(mean))
                out.setdefault(sec, {})[k] = round(mean, dp)
            else:
                out.setdefault(sec, {})[k] = round(
                    reduced[i] / max(1.0, num_total), dp
                )
                i += 1
        switch_accs: Dict[str, float] = {}
        if n_switch:
            total_n = reduced[i + n_switch]
            for c in range(n_switch):
                name = self.config["int_to_category"].get(c, str(c))
                switch_accs[f"head_cat_{name}_acc"] = (
                    reduced[i + c] / max(total_n, 1.0)
                )
        return out, switch_accs

    def _reduce_sums(self, values: np.ndarray) -> np.ndarray:
        """Cross-host SUM of a vector of scalars (one collective)."""
        if self.num_processes <= 1 or values.size == 0:
            return values
        from jax.experimental import multihost_utils

        arr = multihost_utils.process_allgather(np.asarray(values, np.float64))
        return np.sum(arr, axis=0)

    # ------------------------------------------------------------------
    def _use_host_item_table(self, needs_corpus: bool, need_full: bool) -> bool:
        """Corpus tables larger than the HBM budget stay in host RAM and
        stream through the device chunk-by-chunk (config ``host_item_table``:
        auto | true | false; budget ``item_table_hbm_budget_gb``)."""
        mode = self.config.get("host_item_table", "auto")
        if mode in (False, "false", "False") or not needs_corpus:
            return False
        if self.config.get("freeze_item_llm", False):
            # frozen tables are loaded as device arrays up front — host
            # streaming would add transfers without saving HBM
            return False
        if need_full:
            if mode in (True, "true", "True"):
                raise ValueError(
                    "host_item_table is incompatible with full-score metrics "
                    "(rec.score / multi-head meanrank need [B, H, I] score "
                    "tensors; single-head GAUC streams fine)"
                )
            return False
        if mode in (True, "true", "True"):
            return True
        D = getattr(getattr(self.model, "item_config", None), "hidden_size", 0)
        est_bytes = float(self.dataload.item_num) * max(D, 1) * 4
        budget = float(self.config.get("item_table_hbm_budget_gb", 4.0) or 4.0)
        return est_bytes > budget * (1 << 30)

    def _get_predict_fn(self, kind: str):
        """jitted predict_embeddings variant: 'plain' | 'table' | 'seq_embeds'."""
        cache = getattr(self, "_predict_fns", None)
        if cache is None:
            cache = self._predict_fns = {}
        if kind not in cache:
            if kind == "table":
                cache[kind] = jax.jit(
                    lambda p, seq, tt, table: self.model.apply(
                        {"params": p, **self.extra_vars}, seq, tt, table,
                        method="predict_embeddings",
                    )
                )
            elif kind == "seq_embeds":
                cache[kind] = jax.jit(
                    lambda p, seq, tt, se: self.model.apply(
                        {"params": p, **self.extra_vars}, seq, tt, None, se,
                        method="predict_embeddings",
                    )
                )
            else:
                cache[kind] = jax.jit(
                    lambda p, seq, tt: self.model.apply(
                        {"params": p, **self.extra_vars}, seq, tt,
                        method="predict_embeddings",
                    )
                )
        return cache[kind]

    def _eval_device_batch(self, batch):
        """Device-side view of an eval batch: item_seq / target_tags sharded
        on dim 0 over the (possibly multi-host) mesh, plus the fixed-size
        history-suppression buffers with rows shifted to GLOBAL batch rows."""
        B_local = batch["item_seq"].shape[0]
        hist_r = batch["history_row"]
        hist_c = batch["history_col"]
        if not self.suppress_history:
            hist_c = np.full_like(hist_c, -1)
        if self.num_processes > 1:
            hist_r = hist_r + self.process_index * B_local
        return shard_batch(self.mesh, {
            "item_seq": batch["item_seq"],
            "target_tags": batch["target_tags"],
            "hist_r": hist_r.astype(np.int32),
            "hist_c": hist_c.astype(np.int32),
        })

    def _shard_local(self, x, n_real: int) -> np.ndarray:
        """This host's rows of a batch-dim-sharded device result, trimmed to
        the real (non-padding) rows."""
        return local_shard(x)[:n_real]

    def _device_topk_results(self, eval_batcher, item_feats, raw_item_table,
                             item_tags, top_k, need_full,
                             stream_meanrank=False, stream_tgt=False):
        """Per-batch predict + streamed top-k with a device-resident table.
        With ``need_full`` the full masked score tensor rides in the
        topk_vals slot (GAUC / rec.score path).

        Every host walks the SAME number of batches (the batcher pads with
        empty ones) and joins every device call — skipping would desync the
        SPMD program across hosts; empty batches are dropped only AFTER the
        device work, host-side.

        One-deep pipelining: device work (predict + chunked top-k) for batch
        i+1 is ENQUEUED before batch i's results are materialized to host
        numpy, so the device computes while the consumer (collector fusion,
        metric rows) runs on the host — jax's async dispatch provides the
        overlap for free once the blocking np.asarray is deferred."""
        predict_fn = self._get_predict_fn(
            "table" if raw_item_table is not None else "plain"
        )

        def materialize(p):
            batch, n_real, topk_vals, topk_idx, pe, mr = p
            if mr is not None:
                self._finalize_meanrank(mr, n_real)
            return (batch, n_real,
                    self._shard_local(topk_vals, n_real),
                    self._shard_local(topk_idx, n_real),
                    {k: local_shard(v) for k, v in pe.items()})

        pending = None
        for batch in eval_batcher.batches():
            n_real = int(batch["sample_weight"].sum())
            if n_real == 0 and self.num_processes == 1:
                continue
            dev = self._eval_device_batch(batch)
            predict_args = [self.state.params, dev["item_seq"],
                            dev["target_tags"]]
            if raw_item_table is not None:
                predict_args.append(raw_item_table)
            pe = predict_fn(*predict_args)
            if need_full:
                full_scores = np.asarray(
                    self._full_scores(pe, item_feats, item_tags, batch)
                )[:n_real]
                if n_real:
                    yield batch, n_real, full_scores, None, pe
                continue
            mr = None
            if stream_meanrank or stream_tgt:
                tgt_items_dev = shard_batch(
                    self.mesh, np.asarray(batch["item_target"], np.int32)
                )
                tgt_tag_feats = None
                if pe["head_embs"].shape[1] > 1 and item_tags is not None:
                    tgt_tag_feats = item_tags[tgt_items_dev]
                mr = self._init_meanrank_state(
                    pe, dev, tgt_items_dev, item_feats[tgt_items_dev],
                    counts=stream_meanrank, tgt_item_tags_dev=tgt_tag_feats,
                )
            topk_vals, topk_idx = self._stream_score_topk(
                pe, item_feats, item_tags, dev, top_k, mr=mr
            )
            if n_real:
                if pending is not None:
                    yield materialize(pending)
                pending = (batch, n_real, topk_vals, topk_idx, pe, mr)
        if pending is not None:
            yield materialize(pending)

    def _host_table_topk_results(self, eval_batcher, raw_host, norm_host,
                                 item_tags, top_k, stream_meanrank=False,
                                 stream_tgt=False):
        """Corpus-scale eval with a HOST-resident item table: phase A runs
        the user tower for every eval batch (sequence embeddings gathered
        host-side), phase B streams each normalized item chunk to the device
        ONCE and advances every batch's running top-k (kept on device).

        Total H2D traffic = one pass over the table, independent of the
        number of eval batches — vs. the reference's per-GPU replicated
        table (hstu.py:979 full matmul), which cannot fit 8M×1024 on a
        single chip."""
        if self._chunk_scorer is None:
            self._chunk_scorer = self._make_chunk_scorer()
        predict_fn = self._get_predict_fn("seq_embeds")
        # batch-group tiling: holding EVERY batch's device state (head embs +
        # running top-k) until the single table pass grows linearly with the
        # eval set — instead process G batches per table pass, where G comes
        # from an explicit config or an HBM budget. Tradeoff: the host table
        # streams to the device ceil(n_batches/G) times.
        group = int(self.config.get("host_eval_group_size", 0) or 0)
        budget = float(
            self.config.get("host_eval_state_budget_gb", 2.0) or 2.0
        ) * (1 << 30)
        states = []

        def flush(states):
            """Stream the full item table through the device once for this
            GROUP of batches, then emit their results."""
            if not states:
                return
            I = norm_host.shape[0]
            chunk = min(self.item_chunk_size, I)
            n_chunks = -(-I // chunk)

            def stage(ci):
                """Issue the (async) H2D transfer for chunk ``ci`` now."""
                off = ci * chunk
                feats_np = norm_host[off:off + chunk]
                tags_np = item_tags[off:off + chunk] if item_tags is not None else None
                if feats_np.shape[0] < chunk:       # static shapes: pad tail
                    pad = chunk - feats_np.shape[0]
                    feats_np = np.pad(feats_np, ((0, pad), (0, 0)))
                    if tags_np is not None:
                        tags_np = np.pad(tags_np, ((0, pad), (0, 0)))
                feats_c = put_replicated(self.mesh, feats_np)
                tags_c = (
                    put_replicated(self.mesh, tags_np)
                    if tags_np is not None else None
                )
                return feats_c, tags_c

            # double-buffered streaming: device_put is async, so issuing
            # chunk ci+1's transfer BEFORE scoring chunk ci lets the DMA ride
            # under the scoring matmuls (VERDICT r3 #8) — on PCIe-attached
            # TPU the transfer-bound phase roughly halves
            nxt = stage(0)
            for ci in range(n_chunks):
                feats_c, tags_c = nxt
                off = ci * chunk
                if ci + 1 < n_chunks:
                    nxt = stage(ci + 1)
                for st in states:
                    st["run_vals"], st["run_idx"] = self._chunk_scorer(
                        self.state.params, st["head_embs"], st["switch_pred"],
                        feats_c, tags_c, st["tgt"], off, I,
                        st["hist_r"], st["hist_c"],
                        st["run_vals"], st["run_idx"], top_k,
                    )
                    mr = st.get("mr")
                    if mr is not None and mr["counts"]:
                        _, _, count_fn = self._get_meanrank_fns()
                        mr["g"], mr["e"], mr["fin"] = count_fn(
                            self.state.params, st["head_embs"],
                            st["switch_pred"], feats_c, tags_c, st["tgt"],
                            off, I, st["hist_r"], st["hist_c"],
                            mr["tgt_score"], mr["g"], mr["e"], mr["fin"],
                        )
            for st in states:
                n_real = st["n_real"]
                if n_real:
                    if st.get("mr") is not None:
                        self._finalize_meanrank(st["mr"], n_real)
                    yield (st["batch"], n_real,
                           self._shard_local(st["run_vals"], n_real),
                           self._shard_local(st["run_idx"], n_real),
                           st["pe_host"])

        for batch in eval_batcher.batches():
            n_real = int(batch["sample_weight"].sum())
            if n_real == 0 and self.num_processes == 1:
                continue
            seq_embeds = raw_host[batch["item_seq"]]       # host gather [B,L,D]
            dev = self._eval_device_batch(batch)
            pe = predict_fn(
                self.state.params, dev["item_seq"], dev["target_tags"],
                shard_batch(self.mesh, seq_embeds.astype(np.float32)),
            )
            B, H, _ = pe["head_embs"].shape
            Heff = 1 if (self.config["split_mode"] == "average" and H > 1) else H
            B_local = batch["item_seq"].shape[0]
            mr = None
            if stream_meanrank or stream_tgt:
                tgt_ids = np.asarray(batch["item_target"], np.int32)
                tgt_tag_feats = None
                if pe["head_embs"].shape[1] > 1 and item_tags is not None:
                    tgt_tag_feats = shard_batch(
                        self.mesh, np.asarray(item_tags)[tgt_ids]
                    )
                mr = self._init_meanrank_state(
                    pe, dev, shard_batch(self.mesh, tgt_ids),
                    shard_batch(
                        self.mesh, norm_host[tgt_ids].astype(np.float32)
                    ),
                    counts=stream_meanrank, tgt_item_tags_dev=tgt_tag_feats,
                )
            states.append({
                "mr": mr,
                "batch": batch, "n_real": n_real,
                "head_embs": pe["head_embs"],
                "switch_pred": pe.get("switch_pred"),
                "pe_host": {k: local_shard(v) for k, v in pe.items()},
                "tgt": dev["target_tags"],
                "hist_r": dev["hist_r"], "hist_c": dev["hist_c"],
                "run_vals": shard_batch(self.mesh, np.full(
                    (B_local, Heff, top_k), -np.inf, np.float32)),
                "run_idx": shard_batch(self.mesh, np.zeros(
                    (B_local, Heff, top_k), np.int32)),
            })
            if not group:
                st = states[0]
                per_state = (
                    st["head_embs"].nbytes
                    + (st["switch_pred"].nbytes if st["switch_pred"] is not None else 0)
                    + st["tgt"].nbytes
                    + 2 * st["run_vals"].nbytes
                )
                group = max(1, int(budget // max(per_state, 1)))
            if len(states) >= group:
                yield from flush(states)
                states = []
        yield from flush(states)

    def _stream_score_topk(self, pe, item_feats, item_tags, dev, top_k: int,
                           mr=None):
        """Chunked full-corpus scoring with pad/history masking and on-device
        per-head top-k merge. ``dev`` is the device-side eval batch from
        ``_eval_device_batch`` (global arrays under multi-host). ``mr`` is an
        optional streamed mean-rank state (see ``_get_meanrank_fns``) whose
        counters advance alongside the top-k merge."""
        I = item_feats.shape[0]
        chunk = min(self.item_chunk_size, I)
        n_chunks = -(-I // chunk)
        padded = n_chunks * chunk

        if self._chunk_scorer is None:
            self._chunk_scorer = self._make_chunk_scorer()

        B, H, _ = pe["head_embs"].shape
        if self.config["split_mode"] == "average" and H > 1:
            H = 1  # heads fused by finite-mean inside the chunk scorer
        B_local = B // self.num_processes
        run_vals = shard_batch(
            self.mesh, np.full((B_local, H, top_k), -np.inf, np.float32)
        )
        run_idx = shard_batch(
            self.mesh, np.zeros((B_local, H, top_k), np.int32)
        )

        feats_padded = item_feats
        tags_padded = item_tags
        if padded != I:
            feats_padded = jnp.pad(item_feats, ((0, padded - I), (0, 0)))
            if item_tags is not None:
                tags_padded = jnp.pad(item_tags, ((0, padded - I), (0, 0)))

        switch_pred = pe.get("switch_pred")
        for ci in range(n_chunks):
            off = ci * chunk
            feats_c = jax.lax.dynamic_slice_in_dim(feats_padded, off, chunk, 0)
            tags_c = (
                jax.lax.dynamic_slice_in_dim(tags_padded, off, chunk, 0)
                if tags_padded is not None
                else None
            )
            run_vals, run_idx = self._chunk_scorer(
                self.state.params, pe["head_embs"], switch_pred, feats_c, tags_c,
                dev["target_tags"], off, I, dev["hist_r"], dev["hist_c"],
                run_vals, run_idx, top_k,
            )
            if mr is not None and mr["counts"]:
                _, _, count_fn = self._get_meanrank_fns()
                mr["g"], mr["e"], mr["fin"] = count_fn(
                    self.state.params, pe["head_embs"], switch_pred, feats_c,
                    tags_c, dev["target_tags"], off, I, dev["hist_r"],
                    dev["hist_c"], mr["tgt_score"], mr["g"], mr["e"], mr["fin"],
                )
        return run_vals, run_idx

    def _full_scores(self, pe, item_feats, item_tags, batch):
        """Full [B, H, I] masked score tensor (small corpora only — used for
        GAUC/meanrank and rec.score metrics, reference trainer.py:698-729)."""
        I = item_feats.shape[0]
        scores = self.model.apply(
            {"params": self.state.params, **self.extra_vars},
            pe["head_embs"], item_feats, item_tags,
            jnp.asarray(batch["target_tags"]), pe.get("switch_pred"),
            method="score_items",
        )
        gid = jnp.arange(I)
        scores = jnp.where(gid[None, None, :] == 0, -jnp.inf, scores)
        if self.suppress_history:
            # fixed-size buffers: col == -1 marks padding (no-op add)
            hr = jnp.asarray(batch["history_row"], jnp.int32)
            hc = jnp.asarray(batch["history_col"], jnp.int32)
            ok = hc >= 0
            add = jnp.where(ok, -jnp.inf, 0.0)
            hc_safe = jnp.clip(hc, 0, I - 1)
            scores = scores.at[hr, :, hc_safe].add(add[:, None])
        return scores

    def _masked_chunk_scores_closure(self, fuse_average: bool = True):
        """Shared chunk-scoring math (score_items + pad/history masking) used
        by both the running-top-k scorer and the streamed mean-rank counter —
        one definition so the two paths can never drift.

        ``fuse_average=False`` skips the split_mode='average' head fusion:
        the mean-rank counter mirrors the full-tensor path, which takes RAW
        head-0 scores (collector._collect_meanrank) — not the fused mean the
        top-k ranking uses."""
        model = self.model
        split_mode = self.config["split_mode"]
        do_fuse = fuse_average and split_mode == "average"
        extra_vars = self.extra_vars

        def masked_chunk_scores(
            params, head_embs, switch_pred, feats_c, tags_c, tgt_tags,
            off, item_num, hist_r, hist_c,
        ):
            scores = model.apply(
                {"params": params, **extra_vars}, head_embs, feats_c, tags_c,
                tgt_tags, switch_pred, method="score_items",
            )  # [B, H, Ck]
            if do_fuse and scores.shape[1] > 1:
                # finite-mean over heads (reference collector.py:227-230)
                finite = jnp.isfinite(scores)
                scores = (
                    jnp.where(finite, scores, 0.0).sum(axis=1)
                    / (finite.sum(axis=1) + 1e-8)
                )[:, None, :]
            Ck = scores.shape[-1]
            gid = off + jnp.arange(Ck)
            pad_mask = (gid == 0) | (gid >= item_num)  # pad item + padding rows
            scores = jnp.where(pad_mask[None, None, :], -jnp.inf, scores)
            # history suppression via additive -inf scatter
            col_local = hist_c - off
            ok = (col_local >= 0) & (col_local < Ck)
            col_safe = jnp.clip(col_local, 0, Ck - 1).astype(jnp.int32)
            add = jnp.where(ok, -jnp.inf, 0.0)
            scores = scores.at[hist_r, :, col_safe].add(add[:, None])
            return scores

        return masked_chunk_scores

    def _make_chunk_scorer(self):
        masked_chunk_scores = self._masked_chunk_scores_closure()

        @partial(jax.jit, static_argnames=("top_k",))
        def chunk_scorer(
            params, head_embs, switch_pred, feats_c, tags_c, tgt_tags,
            off, item_num, hist_r, hist_c, run_vals, run_idx, top_k,
        ):
            scores = masked_chunk_scores(
                params, head_embs, switch_pred, feats_c, tags_c, tgt_tags,
                off, item_num, hist_r, hist_c,
            )
            Ck = scores.shape[-1]

            k_eff = min(top_k, Ck)
            vals, idx = jax.lax.top_k(scores, k_eff)
            gidx = (off + idx).astype(jnp.int32)
            if k_eff < top_k:
                pad_n = top_k - k_eff
                vals = jnp.pad(vals, ((0, 0), (0, 0), (0, pad_n)), constant_values=-jnp.inf)
                gidx = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad_n)))
            # fresh chunk first: on all--inf ties (fully masked heads)
            # lax.top_k keeps the first occurrences, which must be the
            # chunk's DISTINCT indices, not the init buffer's repeated zeros
            cat_vals = jnp.concatenate([vals, run_vals], axis=-1)
            cat_idx = jnp.concatenate([gidx, run_idx], axis=-1)
            mvals, mpos = jax.lax.top_k(cat_vals, top_k)
            midx = jnp.take_along_axis(cat_idx, mpos, axis=-1)
            return mvals, midx

        return chunk_scorer

    # -- streamed mean-rank (GAUC without the [B, H, I] tensor) ------------
    def _get_meanrank_fns(self):
        """jitted (target_score_fn, target_score_mh_fn, count_fn) triple for
        the streamed GAUC path (VERDICT r3 #5; reference collector.py:327-344
        semantics).

        The tie-averaged descending rank of target t is
        ``count(score > s_t) + (count(score == s_t) + 1) / 2`` and
        ``user_len = count(score > -inf)`` (the corpus minimum is always
        -inf: pad item 0 is masked), so all three GAUC inputs are sums of
        per-chunk counts — no full score tensor, works multi-process and in
        host-table mode. Head-0 scores throughout, matching the full-tensor
        path (collector._collect_meanrank takes scores[:, 0]; the
        reference's own meanrank collection assumes [B, I] scores). For
        multi-head models the target scores must carry score_items' per-head
        prior/switch masks, so ``target_score_mh_fn`` scores the batch's own
        targets as a pseudo-chunk through score_items itself."""
        if getattr(self, "_meanrank_fns", None) is not None:
            return self._meanrank_fns
        # fuse_average=False: the counter mirrors the full path's RAW head-0
        # scores, not the fused mean the top-k ranking uses
        masked_chunk_scores = self._masked_chunk_scores_closure(
            fuse_average=False
        )
        model = self.model
        extra_vars = self.extra_vars

        @jax.jit
        def target_score_fn(head_embs, tgt_feats, tgt_items, hist_r, hist_c):
            # head_embs [B, 1, D] normalized; tgt_feats [B, P, D] normalized.
            # Same contraction as score_items' bhd,id->bhi chunk matmul so
            # the self-equality count lands bit-exactly.
            s = jnp.einsum("bhd,bpd->bhp", head_embs, tgt_feats)[:, 0]
            s = jnp.where(tgt_items == 0, -jnp.inf, s)  # pad item mask
            ok = hist_c >= 0
            eq = (tgt_items[hist_r] == hist_c[:, None]) & ok[:, None]  # [Hn, P]
            hit = jnp.zeros(s.shape, bool).at[hist_r].max(eq)
            return jnp.where(hit, -jnp.inf, s)

        @jax.jit
        def target_score_mh_fn(params, head_embs, switch_pred, tgt_feats,
                               tgt_item_tags, tgt_tags, tgt_items,
                               hist_r, hist_c):
            # Multi-head: head-0 target scores WITH score_items' per-head
            # masks (prior_given_at_test / item-tag / switch), obtained by
            # scoring the batch's B·P target items as one pseudo-chunk.
            B, P, D = tgt_feats.shape
            feats_c = tgt_feats.reshape(B * P, D)
            tags_c = (tgt_item_tags.reshape(B * P, -1)
                      if tgt_item_tags is not None else None)
            scores = model.apply(
                {"params": params, **extra_vars}, head_embs, feats_c, tags_c,
                tgt_tags, switch_pred, method="score_items",
            )[:, 0]  # [B, B·P] head-0 (full-tensor-path parity)
            cols = jnp.arange(B)[:, None] * P + jnp.arange(P)[None, :]
            s = jnp.take_along_axis(scores, cols, axis=1)  # own targets
            s = jnp.where(tgt_items == 0, -jnp.inf, s)  # pad item mask
            ok = hist_c >= 0
            eq = (tgt_items[hist_r] == hist_c[:, None]) & ok[:, None]
            hit = jnp.zeros(s.shape, bool).at[hist_r].max(eq)
            return jnp.where(hit, -jnp.inf, s)

        @jax.jit
        def count_fn(
            params, head_embs, switch_pred, feats_c, tags_c, tgt_tags,
            off, item_num, hist_r, hist_c, tgt_score, g_cnt, e_cnt, fin_cnt,
        ):
            scores = masked_chunk_scores(
                params, head_embs, switch_pred, feats_c, tags_c, tgt_tags,
                off, item_num, hist_r, hist_c,
            )[:, 0]  # [B, Ck] — head-0 (any H)
            Ck = scores.shape[-1]
            gid = off + jnp.arange(Ck)
            valid = gid < item_num  # excludes the static-shape tail padding
            fin_cnt = fin_cnt + (scores > -jnp.inf).sum(-1).astype(jnp.int32)
            g_new, e_new = [], []
            for p in range(tgt_score.shape[1]):  # P is small and static
                sp = tgt_score[:, p][:, None]
                # invalid tail rows are -inf, never > sp; equality needs the
                # explicit valid mask (an -inf target equals the -inf tail)
                g_new.append((scores > sp).sum(-1))
                e_new.append(((scores == sp) & valid[None, :]).sum(-1))
            g_cnt = g_cnt + jnp.stack(g_new, 1).astype(jnp.int32)
            e_cnt = e_cnt + jnp.stack(e_new, 1).astype(jnp.int32)
            return g_cnt, e_cnt, fin_cnt

        self._meanrank_fns = (target_score_fn, target_score_mh_fn, count_fn)
        return self._meanrank_fns

    def _init_meanrank_state(self, pe, dev, tgt_items_dev, tgt_feats_dev,
                             counts: bool = True, tgt_item_tags_dev=None):
        """Per-batch device accumulators for the streamed mean-rank /
        target-score path. ``counts=False`` (VALUE metrics only) skips the
        per-chunk rank counters — only the target scores are needed.
        Multi-head models route the targets through score_items (with the
        targets' item tags) so head-0 carries the full mask semantics."""
        target_score_fn, target_score_mh_fn, _ = self._get_meanrank_fns()
        if pe["head_embs"].shape[1] == 1:
            tgt_score = target_score_fn(
                pe["head_embs"], tgt_feats_dev, tgt_items_dev,
                dev["hist_r"], dev["hist_c"],
            )
        else:
            tgt_score = target_score_mh_fn(
                self.state.params, pe["head_embs"], pe.get("switch_pred"),
                tgt_feats_dev, tgt_item_tags_dev, dev["target_tags"],
                tgt_items_dev, dev["hist_r"], dev["hist_c"],
            )
        B_local = local_shard(tgt_items_dev).shape[0]
        P = local_shard(tgt_items_dev).shape[1]
        zeros_bp = shard_batch(self.mesh, np.zeros((B_local, P), np.int32))
        zeros_b = shard_batch(self.mesh, np.zeros((B_local,), np.int32))
        return {
            "counts": counts,
            "tgt_items": tgt_items_dev,
            "tgt_score": tgt_score,
            "g": zeros_bp, "e": zeros_bp, "fin": zeros_b,
        }

    def _eval_logit_scale(self) -> float:
        """The model's NCE temperature exp(clamped logit_scale) — maps eval
        cosine scores onto the calibrated logits the VALUE metrics sigmoid
        (losses.py trains logits at this scale)."""
        if self.config["fix_temp"]:
            return float(1.0 / 0.07)
        ls = self.state.params.get("logit_scale") if hasattr(
            self.state.params, "get") else None
        if ls is None:
            return 1.0
        return float(np.exp(np.clip(np.asarray(ls), None, np.log(100.0))))

    def _finalize_meanrank(self, mr, n_real: int):
        """Turn accumulated counts into per-horizon
        [pos_rank_sum, user_len, pos_len] rows (reference meanrank layout)
        and hand them to the collector. Duplicate target ids within a
        horizon collapse (the reference's pos_matrix scatter is a set).
        Also hands the per-target sigmoid scores to the collector when the
        VALUE metrics stream (rec.tgt_score)."""
        ids = self._shard_local(mr["tgt_items"], n_real)
        tgt_s = self._shard_local(mr["tgt_score"], n_real).astype(np.float64)
        P = ids.shape[1]
        first = np.ones(ids.shape, bool)
        for j in range(1, P):
            first[:, j] = ~(ids[:, :j] == ids[:, j : j + 1]).any(axis=1)

        if self.collector.external_tgt_score:
            scale = self.collector.logit_scale_value
            keep = first & np.isfinite(tgt_s)
            preds = {}
            for p in self.metrics_pred_len_list:
                m = keep[:, : p + 1]
                preds[p] = 1.0 / (1.0 + np.exp(-scale * tgt_s[:, : p + 1][m]))
            self.collector.tgt_score_collect(preds)

        if not mr["counts"]:
            return
        g = self._shard_local(mr["g"], n_real).astype(np.float64)
        e = self._shard_local(mr["e"], n_real).astype(np.float64)
        fin = self._shard_local(mr["fin"], n_real).astype(np.float64)
        rank = g + (e + 1.0) / 2.0
        rows = {}
        for p in self.metrics_pred_len_list:
            m = first[:, : p + 1]
            rows[p] = np.stack(
                [
                    (rank[:, : p + 1] * m).sum(1),
                    fin,
                    m.sum(1).astype(np.float64),
                ],
                axis=1,
            )
        self.collector.meanrank_rows_collect(rows)
