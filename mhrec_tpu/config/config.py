"""Cascading-YAML configuration system.

Behavior parity with the reference config layer
(`code/REC/config/configurator.py`, `code/run.py:41-104`):

* ``Config(config_file_list)`` loads an ordered list of YAML files; later
  files override earlier ones key-by-key (dict merge, last wins).
* Missing keys read as ``None`` via ``__getitem__`` (models rely on this).
* CLI-style overrides ``--key value`` (including JSON lists/dicts and dotted
  ``a.b`` nested keys) are applied after file loading with type coercion.
* Post-load fixups: ``metrics_pred_len_list`` gets ``eval_pred_len`` and
  ``eval_pred_len // 2`` appended, is converted to 0-based and sorted;
  ``prior_switch`` is nulled unless the prior loss with medusa layers is
  active; merrec datasets force ``category_by = 'event'``
  (reference ``run.py:90-104``).

YAML files resolve relative to ``mhrec_tpu/config/yamls`` first, then the
current working directory, then as absolute paths.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Iterable, List, Optional

import yaml

_YAML_DIR = os.path.join(os.path.dirname(__file__), "yamls")

# PyYAML's default resolver misses floats like "1e-4" (no dot). Install a
# resolver that handles full scientific notation, mirroring the custom float
# resolver in the reference (configurator.py:33-47) — built independently.
_FLOAT_TAG_RE = re.compile(
    r"""^(?:
        [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |\.[0-9_]+(?:[eE][-+][0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN)
    )$""",
    re.X,
)


class _ConfigLoader(yaml.SafeLoader):
    pass


_ConfigLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    _FLOAT_TAG_RE,
    list("-+0123456789."),
)


def convert_str(value: str) -> Any:
    """Coerce a CLI string to bool/int/float/None when it parses as one."""
    if not isinstance(value, str):
        return value
    low = value.strip()
    if low.lower() in ("true", "yes"):
        return True
    if low.lower() in ("false", "no"):
        return False
    if low.lower() in ("none", "null"):
        return None
    try:
        return int(low)
    except ValueError:
        pass
    try:
        return float(low)
    except ValueError:
        pass
    return value


def _resolve_path(name: str) -> str:
    if os.path.isfile(name):
        return name
    cand = os.path.join(_YAML_DIR, name)
    if os.path.isfile(cand):
        return cand
    raise FileNotFoundError(f"Config file not found: {name!r} (searched cwd and {_YAML_DIR})")


class Config:
    """Dict-like config; missing keys read as ``None``."""

    def __init__(
        self,
        config_file_list: Optional[Iterable[str]] = None,
        config_dict: Optional[Dict[str, Any]] = None,
        cli_args: Optional[List[str]] = None,
    ):
        self._data: Dict[str, Any] = {}
        for f in config_file_list or []:
            with open(_resolve_path(f)) as fh:
                loaded = yaml.load(fh, Loader=_ConfigLoader) or {}
            if not isinstance(loaded, dict):
                raise ValueError(f"Config file {f} must contain a mapping")
            self._data.update(loaded)
        if config_dict:
            self._data.update(config_dict)
        if cli_args:
            self.apply_cli_overrides(cli_args)
        self._set_default_parameters()

    # -- CLI overrides -------------------------------------------------------
    def apply_cli_overrides(self, args: List[str]) -> None:
        """Apply ``['--key', 'value', ...]`` pairs (reference run.py:49-69)."""
        if len(args) % 2 != 0:
            raise ValueError(f"CLI overrides must be --key value pairs, got {args}")
        for i in range(0, len(args), 2):
            key = args[i]
            if not key.startswith("--"):
                raise ValueError(f"Expected --key, got {key}")
            key = key[2:]
            raw = args[i + 1]
            if "[" in raw or "{" in raw:
                value = json.loads(raw)
                if isinstance(value, dict):
                    value = {k: convert_str(v) for k, v in value.items()}
                else:
                    value = [convert_str(x) for x in value]
            else:
                value = convert_str(raw)
            if "." in key:
                k1, k2 = key.split(".", 1)
                if not isinstance(self._data.get(k1), dict):
                    self._data[k1] = {}
                self._data[k1][k2] = value
            else:
                self._data[key] = value

    # -- derived defaults ----------------------------------------------------
    def _set_default_parameters(self) -> None:
        d = self._data
        d.setdefault("metrics", ["Recall", "NDCG"])
        d.setdefault("shared_metrics", [])
        d.setdefault("topk", [10])
        if isinstance(d["topk"], int):
            d["topk"] = [d["topk"]]
        d.setdefault("valid_metric", "NDCG@10")
        # smaller-is-better detection mirrors the reference metric registry
        from mhrec_tpu.evaluator.registry import smaller_metrics

        metric_name = str(d["valid_metric"]).split("@")[0].lower()
        d.setdefault("valid_metric_bigger", metric_name not in smaller_metrics)
        d.setdefault("eval_pred_len", 1)
        d.setdefault("pred_len", 1)
        d.setdefault("eval_num_cats", 1)
        d.setdefault("metric_decimal_place", 7)

    def finalize(self) -> "Config":
        """Post-load fixups applied once by the runtime (run.py:90-104)."""
        d = self._data
        mpl = list(d.get("metrics_pred_len_list") or [1])
        if d["eval_pred_len"] not in mpl:
            mpl.append(d["eval_pred_len"])
        half = d["eval_pred_len"] // 2
        if half > 0 and half not in mpl:
            mpl.append(half)
        assert all(isinstance(x, int) and x >= 0 for x in mpl)
        d["metrics_pred_len_list"] = sorted(x - 1 for x in mpl)
        if d.get("loss") not in ("prior",) or not d.get("medusa_num_layers"):
            d["prior_switch"] = None
        if "merrec" in str(d.get("dataset", "")):
            d["category_by"] = "event"
        if d.get("packed_item_tower") is None and d.get("use_ft_flash_attn"):
            # use_ft_flash_attn is the reference's varlen flash-attn fast
            # path for the item tower (hllm.py:56); the TPU moral equivalent
            # is the packed splash-attention tower, so the flag defaults it
            # on unless the dense path is required (images / frozen tower)
            d["packed_item_tower"] = not (
                d.get("use_image") or d.get("use_video")
                or d.get("freeze_item_llm")
            )
        if any(d.get(k) for k in ("video_dir", "video_nframes")) \
                and not d.get("use_video"):
            raise ValueError(
                "video_dir/video_nframes are set but use_video is not — "
                "set use_video: true to enable the static-grid video item "
                "branch (data/vision.py ItemVideoStore)"
            )
        if d.get("use_video"):
            if d.get("use_image"):
                raise ValueError("use_image and use_video are mutually "
                                 "exclusive (one vision span per item)")
            nf = int(d.get("video_nframes", 4) or 4)
            if nf < 2 or nf % 2:
                raise ValueError(
                    f"video_nframes={nf} must be an even count >= 2 "
                    f"(Qwen2-VL temporal patch pairs)"
                )
            d["video_nframes"] = nf
        if d.get("category_by") == "user":
            # user-cluster priors only make sense as an oracle over a single
            # horizon (reference trainer.py:104-105)
            assert d.get("prior_given_at_test") is True and int(
                d.get("given_prior_len") or 0
            ) == 1, (
                "category_by='user' requires prior_given_at_test=True and "
                "given_prior_len=1"
            )
        return self

    # -- mapping protocol ----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data.get(key)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        v = self._data.get(key, default)
        return default if v is None and default is not None else v

    def keys(self):
        return self._data.keys()

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._data)

    # categorized pretty-print (reference utils/argument_list.py +
    # configurator __str__: General/Training/Evaluation/Dataset sections,
    # remainder under "Other Hyper Parameters")
    _CATEGORIES = (
        ("General", ("seed", "reproducibility", "state", "model", "data_path",
                     "checkpoint_dir", "show_progress", "config_file",
                     "log_wandb", "save_model_note")),
        ("Training", ("total_iters", "train_batch_size", "optim_args",
                      "eval_interval", "stopping_step", "accumulate_grad",
                      "gradient_checkpointing", "loss", "num_negatives",
                      "sparse_item_adam", "tp_size")),
        ("Evaluation", ("metrics", "topk", "valid_metric",
                        "valid_metric_bigger", "eval_batch_size",
                        "eval_pred_len", "metric_decimal_place",
                        "split_mode", "suppress_history")),
        ("Dataset", ("dataset", "text_path", "MAX_TEXT_LENGTH",
                     "MAX_ITEM_LIST_LENGTH", "MAX_ITEM_LIST_LENGTH_TEST",
                     "min_seq_len", "text_keys", "item_prompt",
                     "tag_version", "eval_num_cats")),
    )

    def format_categorized(self) -> str:
        lines = []
        seen = set()
        for title, keys in self._CATEGORIES:
            lines.append(f"{title} Hyper Parameters:")
            for k in keys:
                if k in self._data:
                    lines.append(f"  {k} = {self._data[k]}")
                    seen.add(k)
            lines.append("")
        rest = [k for k in sorted(self._data) if k not in seen]
        if rest:
            lines.append("Other Hyper Parameters:")
            lines.extend(f"  {k} = {self._data[k]}" for k in rest)
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Config({len(self._data)} keys)"
