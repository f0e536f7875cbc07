"""CLI entry point.

TPU-native counterpart of the reference launch stack (``main.py`` +
``run.py``): no torchrun fork — one process per TPU host, with
``jax.distributed.initialize()`` wiring multi-host pods. Usage::

    python -m mhrec_tpu.run --config_file IDNet/hstu-size1.yaml overall/ID.yaml \
        IDNet/hstu.yaml -- --train_batch_size 64 --loss prior ...

``--val_only True`` skips fit and evaluates the best checkpoint
(reference run.py:136-143).
"""

from __future__ import annotations

import argparse
import logging
import sys

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.trainer import Trainer
from mhrec_tpu.utils import init_logger
from mhrec_tpu.utils.misc import enable_compilation_cache, init_seed

logger = logging.getLogger(__name__)


def run_loop(config_files, extra_args, multihost: bool = False,
             coordinator_address=None, num_processes=None, process_id=None):
    import os

    import jax

    # honor JAX_PLATFORMS even when a site plugin (e.g. a tunneled TPU)
    # registered itself with higher priority
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if multihost:
        # TPU pods auto-discover peers; explicit args drive CPU/GPU clusters
        # and the multi-process CPU tests (reference: torchrun rendezvous,
        # run.py:191)
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    config = Config(config_file_list=config_files, cli_args=extra_args).finalize()
    # runtime precision knob — the TPU-native face of the reference's TF32
    # toggles (reference run.py:179-182 torch.backends.*.allow_tf32): governs
    # the MXU pass count for f32 matmuls ('bfloat16' | 'tensorfloat32' |
    # 'float32' | 'highest'); bf16-stored weights are unaffected
    if config.get("matmul_precision"):
        jax.config.update(
            "jax_default_matmul_precision", str(config["matmul_precision"])
        )
    if config.get("compilation_cache") is not False:
        # persistent XLA compile cache (default on): repeated processes —
        # val_only reruns, resume, bench tools — skip recompiling the
        # protocol step/eval programs
        enable_compilation_cache(config.get("compilation_cache_dir"))
    init_seed(
        config["seed"] or 2020, config["reproducibility"],
        prng_impl=config.get("prng_impl"),
    )
    init_logger(config, process_index=jax.process_index())
    logger.info("configuration:\n%s", config.format_categorized())

    logger.info("loading data...")
    data = InteractionData(config).build()
    num_hosts = jax.process_count()
    host_id = jax.process_index()
    n_dev = len(jax.devices())
    for key in ("train_batch_size", "eval_batch_size"):
        if config[key] and config[key] % n_dev:
            raise ValueError(
                f"{key}={config[key]} is GLOBAL and must divide by the "
                f"total device count {n_dev} for the data-parallel sharding"
            )
    train_loader, valid_loader, test_loader = build_dataloader(
        config, data, world_size=1, host_id=host_id, num_hosts=num_hosts
    )

    trainer = Trainer(config, data)
    trainer.setup_model()

    fit_stats = None
    if config.get("val_only", False):
        result = trainer.evaluate(test_loader, load_best_model=True)
    else:
        fit_stats = trainer.fit(train_loader, valid_loader)
        result = trainer.evaluate(test_loader, load_best_model=True)
    for section, metrics in result.items():
        logger.info("%s: %s", section, metrics)
    if config.get("result_json_path"):
        # machine-readable run summary (multi-process parity tests compare
        # these across launch modes): final metrics, last train loss, and a
        # parameter checksum
        import json

        import jax.numpy as jnp

        # computed as a global jit program: a replicated scalar, identical on
        # every host regardless of how XLA sharded individual leaves
        checksum = float(jax.jit(
            lambda p: sum(jnp.abs(x).astype(jnp.float32).sum()
                          for x in jax.tree.leaves(p))
        )(trainer.state.params))
        payload = {
            "process_index": jax.process_index(),
            "result": {k: {m: float(v) for m, v in d.items()}
                       for k, d in result.items()},
            "final_loss": float(fit_stats.get("loss", float("nan"))) if fit_stats else None,
            "param_checksum": checksum,
        }
        path = f"{config['result_json_path']}.{jax.process_index()}.json"
        with open(path, "w") as f:
            json.dump(payload, f)
    return result


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", nargs="+", required=True)
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--coordinator_address", default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument(
        "--xla_flags", default=None,
        help="extra XLA_FLAGS appended before backend init — the TPU-native "
             "surface for compiler/allocator knobs (the reference exposes "
             "its CUDA equivalents via env in run.py:176-187)",
    )
    args, extra = parser.parse_known_args(argv)
    if extra and extra[0] == "--":
        extra = extra[1:]
    if args.xla_flags:
        import os

        # must land before the first backend touch (jax is imported but the
        # XLA client only reads XLA_FLAGS when a device backend initializes)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + args.xla_flags
        ).strip()
    return run_loop(
        args.config_file, extra, multihost=args.multihost,
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes, process_id=args.process_id,
    )


if __name__ == "__main__":
    main()
