"""Optimizer construction: the reference's four regimes
(trainer.py:175-299) as one optax factory.

* ``freeze_prefix`` (+ implicit ``item_llm``/``item_emb_tokens`` under
  ``freeze_item_llm``) — frozen subtrees get zero updates via
  ``optax.multi_transform`` masking (trainer.py:185-203);
* modal/recsys split LRs when ``optim_args`` carries
  ``modal_lr/modal_decay/rec_lr/rec_decay`` — 'visual_encoder' params get the
  modal group (trainer.py:226-267);
* ``lr_mult_prefix`` × ``lr_mult_rate`` high-LR groups (trainer.py:270-291);
* plain AdamW otherwise — FusedAdam's role is played by XLA fusing the
  update (trainer.py:292-299).

Labels are assigned by dot-joined parameter path prefix, matching the
reference's ``name.startswith(prefix)`` semantics.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List

import optax

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return ".".join(parts)


def _label_tree(params, label_fn):
    import jax.tree_util as jtu

    return jtu.tree_map_with_path(lambda path, _: label_fn(_path_str(path)), params)


def _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype):
    """optax.scale_by_adam with independent storage dtypes for BOTH moments
    (optax only exposes mu_dtype). Math in the gradient dtype (fp32)."""
    import jax
    import jax.numpy as jnp

    def _cast(tree, dtype):
        if dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(dtype), tree)

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: b1 * m.astype(g.dtype) + (1.0 - b1) * g,
            updates, state.mu,
        )
        nu = jax.tree.map(
            lambda g, n: b2 * n.astype(g.dtype) + (1.0 - b2) * (g * g),
            updates, state.nu,
        )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, n: (m / bc1) / (jnp.sqrt(n / bc2) + eps), mu, nu
        )
        return out, optax.ScaleByAdamState(
            count=count, mu=_cast(mu, mu_dtype), nu=_cast(nu, nu_dtype)
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(config, schedule_factory, total_iters: int):
    """Returns (optax transform factory taking params, needs_param_labels).

    ``schedule_factory(lr)`` builds a schedule with the configured
    warmup/decay shape at base learning rate ``lr``.
    """
    optim_args = dict(config["optim_args"] or {})
    base_lr = float(optim_args.get("learning_rate", 1e-3))
    wd = float(optim_args.get("weight_decay", 0.0))

    freeze_prefix: List[str] = list(config.get("freeze_prefix", []) or [])
    if config.get("freeze_item_llm", False):
        freeze_prefix += ["item_llm", "item_emb_tokens"]
    # sparse_item_adam: the table is updated row-wise by the trainer's
    # sparse AdamW path (trainer/sparse_adam.py); mask it here so no dense
    # moments exist. Matched as a dotted-path COMPONENT, not a prefix — the
    # table lives at top level for HSTU/SASRec but under ``trunk.`` for
    # ComiRec/REMI, where a prefix match would silently allocate dense
    # fp32 moments for the full [N, D] table (ADVICE r3).
    sparse_table = bool(config.get("sparse_item_adam", False))

    def _is_frozen(path: str) -> bool:
        if any(path.startswith(p) for p in freeze_prefix):
            return True
        return sparse_table and "item_embedding" in path.split(".")

    split_modal = {"modal_lr", "modal_decay", "rec_lr", "rec_decay"} <= set(optim_args)
    lr_mult_prefix = list(config.get("lr_mult_prefix", []) or [])
    lr_mult_rate = config.get("lr_mult_rate", None)

    # moment storage dtypes (beyond reference): `adam_mu_dtype: bfloat16` /
    # `adam_nu_dtype: bfloat16` halve the corresponding buffer's HBM
    # footprint and per-step traffic (update math still runs fp32; cast on
    # read/write). bf16 keeps fp32's exponent range so ν never over/under
    # flows, but beware: an EMA stored with an 8-bit mantissa drops
    # increments below ~ν·2⁻⁹ entirely, so for small/steady gradients the
    # second moment can STALL at a fixed value rather than merely jitter —
    # ν is the moment generally considered unsafe to quantize. Both flags
    # stay opt-in capacity levers for 1B+ towers; prefer `adam_mu_dtype`
    # alone when quality matters.
    mu_dtype = config.get("adam_mu_dtype") or None
    nu_dtype = config.get("adam_nu_dtype") or None

    def adamw(lr, weight_decay):
        if nu_dtype is None:
            return optax.adamw(
                schedule_factory(lr), b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=weight_decay, mu_dtype=mu_dtype,
            )
        return optax.chain(
            _scale_by_adam_cast(0.9, 0.999, 1e-8, mu_dtype, nu_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(schedule_factory(lr)),
        )

    def make(params):
        transforms: Dict[str, Any] = {}
        if split_modal:
            transforms["modal"] = adamw(
                float(optim_args["modal_lr"]), float(optim_args["modal_decay"])
            )
            transforms["rec"] = adamw(
                float(optim_args["rec_lr"]), float(optim_args["rec_decay"])
            )
            # when decay_check_name is set, the reference groups by that
            # substring instead of 'visual_encoder' (trainer.py:232-250)
            check = config.get("decay_check_name") or "visual_encoder"

            def label(path: str) -> str:
                if _is_frozen(path):
                    return "frozen"
                return "modal" if check in path else "rec"

        elif lr_mult_prefix and lr_mult_rate:
            transforms["normal"] = adamw(base_lr, wd)
            transforms["high"] = adamw(base_lr * float(lr_mult_rate), wd)

            def label(path: str) -> str:
                if _is_frozen(path):
                    return "frozen"
                if any(path.startswith(p) for p in lr_mult_prefix):
                    return "high"
                return "normal"

        else:
            transforms["normal"] = adamw(base_lr, wd)

            def label(path: str) -> str:
                if _is_frozen(path):
                    return "frozen"
                return "normal"

        if freeze_prefix or sparse_table:
            transforms["frozen"] = optax.set_to_zero()
        if len(transforms) == 1:
            tx = transforms["normal"]
        else:
            labels = _label_tree(params, label)
            tx = optax.multi_transform(transforms, labels)
        # global-norm gradient clipping (the reference reads clip_grad_norm,
        # trainer.py:99, but never applies it — here it is honored when set;
        # under sparse_item_adam the row-sparse table grads bypass clipping)
        clip = config.get("clip_grad_norm")
        if clip:
            tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
        return tx

    return make
