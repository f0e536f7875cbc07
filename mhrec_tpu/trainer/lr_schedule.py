"""Learning-rate schedules (optax), mirroring the reference inventory
(``REC/utils/lr_scheduler.py``): constant / linear / cosine (+hard restarts)
/ polynomial decay with warmup, plus warmup multi-step. Warmup is specified
as a fraction of ``total_iters`` (reference trainer.py:210-223)."""

from __future__ import annotations

import math

import optax


def build_schedule(scheduler_args, base_lr: float, total_iters: int):
    args = dict(scheduler_args or {})
    kind = args.get("type", "constant")
    warmup_frac = float(args.get("warmup", 0.0))
    warmup_steps = int(warmup_frac * total_iters)

    if kind == "constant":
        if warmup_steps > 0:
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, base_lr, warmup_steps),
                    optax.constant_schedule(base_lr),
                ],
                [warmup_steps],
            )
        return optax.constant_schedule(base_lr)

    if kind == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
                optax.linear_schedule(base_lr, 0.0, max(total_iters - warmup_steps, 1)),
            ],
            [warmup_steps],
        )

    if kind == "cosine":
        cycles = float(args.get("num_cycles", 0.5))

        def cosine(step):
            decay_steps = max(total_iters - warmup_steps, 1)
            progress = (step - warmup_steps) / decay_steps
            import jax.numpy as jnp

            progress = jnp.clip(progress, 0.0, 1.0)
            return base_lr * jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * cycles * progress))
            )

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)), cosine],
            [warmup_steps],
        )

    if kind == "cosine_with_restarts":
        cycles = int(args.get("num_cycles", 1))

        def cos_restart(step):
            import jax.numpy as jnp

            decay_steps = max(total_iters - warmup_steps, 1)
            progress = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0 - 1e-9)
            within = (progress * cycles) % 1.0
            return base_lr * jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * within)))

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)), cos_restart],
            [warmup_steps],
        )

    if kind == "polynomial":
        power = float(args.get("power", 1.0))
        end_lr = float(args.get("lr_end", 1e-7))
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(warmup_steps, 1)),
                optax.polynomial_schedule(
                    base_lr, end_lr, power, max(total_iters - warmup_steps, 1)
                ),
            ],
            [warmup_steps],
        )

    if kind == "multistep":
        milestones = list(args.get("milestones", []))
        gamma = float(args.get("gamma", 0.1))
        boundaries = {m: gamma for m in milestones}
        sched = optax.piecewise_constant_schedule(base_lr, boundaries)
        if warmup_steps > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, warmup_steps), sched],
                [warmup_steps],
            )
        return sched

    raise ValueError(f"Unknown scheduler type: {kind}")
