"""Test config: force the CPU backend with 8 virtual devices BEFORE jax
initializes (the environment pins JAX_PLATFORMS=axon via sitecustomize, which
would route eager ops through a TPU tunnel)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile

import numpy as np
import pytest

from mhrec_tpu.config import Config
from mhrec_tpu.data import InteractionData, build_dataloader
from mhrec_tpu.data.synthetic import generate_synthetic_dataset


@pytest.fixture(scope="session")
def synth_dir():
    tmp = tempfile.mkdtemp(prefix="mhrec_synth_")
    meta = generate_synthetic_dataset(tmp, num_users=120, num_items=300, seed=1)
    return meta


@pytest.fixture(scope="session")
def synth_events_dir():
    tmp = tempfile.mkdtemp(prefix="mhrec_synth_ev_")
    meta = generate_synthetic_dataset(
        tmp, name="SynthEvents", num_users=80, num_items=200, seed=3, with_events=True
    )
    return meta


def make_config(meta, **overrides):
    base = dict(
        data_path=meta["data_path"],
        dataset=meta["name"],
        text_path=meta["text_path"],
        MAX_ITEM_LIST_LENGTH=20,
        train_batch_size=8,
        eval_batch_size=32,
        num_negatives=256,
        tag_version="v1",
        n_layers=2,
        n_heads=2,
        item_embedding_size=32,
        hstu_embedding_size=32,
        eval_pred_len=4,
        pred_len=2,
        topk=[5, 10, 50],
        total_iters=5,
        eval_interval=5,
    )
    base.update(overrides)
    return Config(
        config_file_list=["IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml"],
        config_dict=base,
    ).finalize()


@pytest.fixture(scope="session")
def base_config(synth_dir):
    return make_config(synth_dir)


@pytest.fixture(scope="session")
def base_data(base_config):
    return InteractionData(base_config).build()


@pytest.fixture(scope="session")
def prior_config(synth_dir):
    return make_config(
        synth_dir,
        loss="prior",
        eval_num_cats=4,
        num_prior_head=4,
        num_segment_head=1,
        medusa_num_layers=1,
        pred_len=4,
        prior_switch="in",
        prior_switch_loss_weight=0.1,
        use_prior_switch_test=True,
    )


@pytest.fixture(scope="session")
def prior_data(prior_config):
    return InteractionData(prior_config).build()
