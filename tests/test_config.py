"""Config system: cascade, overrides, derived defaults (reference
configurator.py / run.py:49-104 semantics)."""

import pytest

from mhrec_tpu.config import Config, convert_str


def test_cascade_last_wins():
    c = Config(config_file_list=["IDNet/hstu-size1.yaml", "IDNet/hstu-size4.yaml"])
    assert c["n_layers"] == 16
    c = Config(config_file_list=["IDNet/hstu-size4.yaml", "IDNet/hstu-size1.yaml"])
    assert c["n_layers"] == 4


def test_missing_key_is_none():
    c = Config(config_file_list=["overall/ID.yaml"])
    assert c["does_not_exist"] is None
    assert c.get("does_not_exist", 5) == 5


def test_scientific_float_parsing():
    c = Config(config_file_list=["overall/ID.yaml"])
    assert isinstance(c["optim_args"]["learning_rate"], float)
    assert c["optim_args"]["learning_rate"] == 1e-3


def test_cli_overrides_types_and_dotted():
    c = Config(
        config_file_list=["overall/ID.yaml"],
        cli_args=[
            "--train_batch_size", "128",
            "--optim_args.learning_rate", "1e-4",
            "--pad_random_sample", "False",
            "--topk", "[5,10]",
            "--model", "HSTU",
        ],
    )
    assert c["train_batch_size"] == 128
    assert c["optim_args"]["learning_rate"] == 1e-4
    assert c["pad_random_sample"] is False
    assert c["topk"] == [5, 10]


def test_convert_str():
    assert convert_str("True") is True
    assert convert_str("none") is None
    assert convert_str("3") == 3
    assert convert_str("3.5") == 3.5
    assert convert_str("hello") == "hello"


def test_finalize_pred_len_list():
    c = Config(
        config_file_list=["overall/ID.yaml"],
        config_dict={"eval_pred_len": 8, "metrics_pred_len_list": [1]},
    ).finalize()
    # [1, 8, 4] → 0-based sorted (reference run.py:91-100)
    assert c["metrics_pred_len_list"] == [0, 3, 7]


def test_finalize_nulls_prior_switch_without_prior_loss():
    c = Config(
        config_file_list=["overall/ID.yaml"],
        config_dict={"loss": "nce", "prior_switch": "in", "medusa_num_layers": 2},
    ).finalize()
    assert c["prior_switch"] is None


def test_merrec_forces_event_category():
    c = Config(
        config_file_list=["overall/ID.yaml"],
        config_dict={"dataset": "merrec_2000", "category_by": "item"},
    ).finalize()
    assert c["category_by"] == "event"


def test_valid_metric_bigger():
    c = Config(config_file_list=["overall/ID.yaml"], config_dict={"valid_metric": "MAE"})
    assert c["valid_metric_bigger"] is False
    c = Config(config_file_list=["overall/ID.yaml"])
    assert c["valid_metric_bigger"] is True


def test_use_ft_flash_attn_aliases_packed_tower():
    # the reference's varlen flash-attn flag (hllm.py:56) maps to the packed
    # splash tower unless dense is required (images / frozen item tower)
    c = Config(
        config_file_list=["overall/LLM.yaml"],
        config_dict={"use_ft_flash_attn": True},
    ).finalize()
    assert c["packed_item_tower"] is True
    c = Config(
        config_file_list=["overall/LLM.yaml"],
        config_dict={"use_ft_flash_attn": True, "use_image": True},
    ).finalize()
    assert c["packed_item_tower"] is False
    c = Config(
        config_file_list=["overall/LLM.yaml"],
        config_dict={"use_ft_flash_attn": True, "packed_item_tower": False},
    ).finalize()
    assert c["packed_item_tower"] is False
