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
from mhrec_tpu.utils.misc import init_seed

logger = logging.getLogger(__name__)


def run_loop(config_files, extra_args, multihost: bool = False):
    import os

    import jax

    # honor JAX_PLATFORMS even when a site plugin (e.g. a tunneled TPU)
    # registered itself with higher priority
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if multihost:
        jax.distributed.initialize()

    config = Config(config_file_list=config_files, cli_args=extra_args).finalize()
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
    train_loader, valid_loader, test_loader = build_dataloader(
        config, data, world_size=1, host_id=host_id, num_hosts=num_hosts
    )

    trainer = Trainer(config, data)
    trainer.setup_model()

    if config.get("val_only", False):
        result = trainer.evaluate(test_loader, load_best_model=True)
    else:
        trainer.fit(train_loader, valid_loader)
        result = trainer.evaluate(test_loader, load_best_model=True)
    for section, metrics in result.items():
        logger.info("%s: %s", section, metrics)
    return result


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", nargs="+", required=True)
    parser.add_argument("--multihost", action="store_true")
    args, extra = parser.parse_known_args(argv)
    if extra and extra[0] == "--":
        extra = extra[1:]
    return run_loop(args.config_file, extra, multihost=args.multihost)


if __name__ == "__main__":
    main()
