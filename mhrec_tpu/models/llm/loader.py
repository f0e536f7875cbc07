"""HF checkpoint → flax parameter loading (local files only).

Maps HF Llama-family state-dict names onto :class:`LlamaBackbone` params:

  model.embed_tokens.weight            → embed_tokens.embedding
  model.layers.N.self_attn.{q,k,v,o}_proj.weight/.bias
                                       → layers_N.self_attn.*.kernel/bias
  model.layers.N.mlp.{gate,up,down}_proj.weight
                                       → layers_N.mlp.*.kernel
  model.layers.N.{input,post_attention}_layernorm.weight → *.weight
  model.norm.weight                    → norm.weight

Reads ``*.safetensors`` (via safetensors.numpy) or ``pytorch_model*.bin``
(via torch, CPU). Projection weights are transposed ([out,in] → [in,out])
and attention projections reshaped to DenseGeneral layouts.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np

from mhrec_tpu.models.llm.config import LLMConfig


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    tensors: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    tensors[k] = sf.get_tensor(k)
        return tensors
    bin_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    index = os.path.join(path, "pytorch_model.bin.index.json")
    if os.path.isfile(index):
        with open(index) as fh:
            shards = sorted(set(json.load(fh)["weight_map"].values()))
        bin_files = [os.path.join(path, s) for s in shards]
    if not bin_files:
        raise FileNotFoundError(f"No safetensors/bin weights under {path}")
    import torch

    for f in bin_files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            tensors[k] = v.float().numpy()
    return tensors


def load_llama_params(path: str, config: LLMConfig, dtype=np.float32):
    """Returns a flax params dict for LlamaBackbone."""
    return llama_params_from_state_dict(_load_state_dict(path), config, dtype)


def llama_params_from_state_dict(sd: Dict[str, np.ndarray], config: LLMConfig,
                                 dtype=np.float32):
    """Map an already-loaded HF Llama-family state dict onto LlamaBackbone
    params (shared by the dir loader above and the reference-checkpoint
    converter, which extracts ``item_llm.*``/``user_llm.*`` sub-dicts from
    a full-model HLLM checkpoint — reference trainer.py:851-876)."""
    h = config.num_attention_heads
    hk = config.num_key_value_heads
    D = config.hidden_size
    dh = D // h

    def _key(name):
        # bare (bert-style), HF decoder, and llava-family nestings
        for k in (name, f"model.{name}", f"language_model.model.{name}",
                  f"language_model.{name}"):
            if k in sd:
                return k
        raise KeyError(name)

    def t(name):
        return np.asarray(sd[_key(name)], dtype=dtype)

    def has(name):
        try:
            _key(name)
            return True
        except KeyError:
            return False

    params: Dict = {
        "embed_tokens": {"embedding": t("embed_tokens.weight")},
        "norm": {"weight": t("norm.weight")},
    }
    for i in range(config.num_hidden_layers):
        pre = f"layers.{i}"
        if has(f"{pre}.self_attn.W_pack.weight"):
            # Baichuan fuses q/k/v into one [3D, D] W_pack matrix
            # (reference baichuan/modeling_baichuan.py); split into thirds.
            wq, wk, wv = np.split(t(f"{pre}.self_attn.W_pack.weight"), 3, axis=0)
        else:
            wq = t(f"{pre}.self_attn.q_proj.weight")
            wk = t(f"{pre}.self_attn.k_proj.weight")
            wv = t(f"{pre}.self_attn.v_proj.weight")
        attn = {
            "q_proj": {"kernel": wq.T.reshape(D, h, dh)},
            "k_proj": {"kernel": wk.T.reshape(D, hk, dh)},
            "v_proj": {"kernel": wv.T.reshape(D, hk, dh)},
            "o_proj": {"kernel": t(f"{pre}.self_attn.o_proj.weight").T},
        }
        if config.attention_bias:
            attn["q_proj"]["bias"] = t(f"{pre}.self_attn.q_proj.bias").reshape(h, dh)
            attn["k_proj"]["bias"] = t(f"{pre}.self_attn.k_proj.bias").reshape(hk, dh)
            attn["v_proj"]["bias"] = t(f"{pre}.self_attn.v_proj.bias").reshape(hk, dh)
        params[f"layers_{i}"] = {
            "self_attn": attn,
            "mlp": {
                "gate_proj": {"kernel": t(f"{pre}.mlp.gate_proj.weight").T},
                "up_proj": {"kernel": t(f"{pre}.mlp.up_proj.weight").T},
                "down_proj": {"kernel": t(f"{pre}.mlp.down_proj.weight").T},
            },
            "input_layernorm": {"weight": t(f"{pre}.input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": t(f"{pre}.post_attention_layernorm.weight")
            },
        }
    return params


def load_bert_params(path: str, config: LLMConfig, dtype=np.float32):
    """HF BertModel checkpoint → flax params for BertBackbone.

    HF adds word + position + token-type embeddings before the embedding
    LayerNorm; item text always uses token type 0, so the type-0 row is
    folded into the position-embedding table (exact). Separate q/k/v
    projections are stacked into the fused DenseGeneral qkv kernel.
    """
    return bert_params_from_state_dict(_load_state_dict(path), config, dtype)


def bert_params_from_state_dict(sd: Dict[str, np.ndarray], config: LLMConfig,
                                dtype=np.float32):

    def t(name):
        for k in (name, f"bert.{name}", f"model.{name}"):
            if k in sd:
                return np.asarray(sd[k], dtype=dtype)
        raise KeyError(name)

    D = config.hidden_size
    h = config.num_attention_heads
    dh = D // h

    pos = t("embeddings.position_embeddings.weight")
    try:
        pos = pos + t("embeddings.token_type_embeddings.weight")[0][None, :]
    except KeyError:
        pass
    params = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {"embedding": pos},
        "embeddings_ln": {"scale": t("embeddings.LayerNorm.weight"),
                          "bias": t("embeddings.LayerNorm.bias")},
        "encoder": {},
    }
    for i in range(config.num_hidden_layers):
        p = f"encoder.layer.{i}"
        q_k = t(f"{p}.attention.self.query.weight").T.reshape(D, h, dh)
        k_k = t(f"{p}.attention.self.key.weight").T.reshape(D, h, dh)
        v_k = t(f"{p}.attention.self.value.weight").T.reshape(D, h, dh)
        q_b = t(f"{p}.attention.self.query.bias").reshape(h, dh)
        k_b = t(f"{p}.attention.self.key.bias").reshape(h, dh)
        v_b = t(f"{p}.attention.self.value.bias").reshape(h, dh)
        params["encoder"][f"layer_{i}"] = {
            "qkv": {"kernel": np.stack([q_k, k_k, v_k], axis=1),
                    "bias": np.stack([q_b, k_b, v_b], axis=0)},
            "attn_out": {"kernel": t(f"{p}.attention.output.dense.weight").T,
                         "bias": t(f"{p}.attention.output.dense.bias")},
            "attn_ln": {"scale": t(f"{p}.attention.output.LayerNorm.weight"),
                        "bias": t(f"{p}.attention.output.LayerNorm.bias")},
            "ff_in": {"kernel": t(f"{p}.intermediate.dense.weight").T,
                      "bias": t(f"{p}.intermediate.dense.bias")},
            "ff_out": {"kernel": t(f"{p}.output.dense.weight").T,
                       "bias": t(f"{p}.output.dense.bias")},
            "ff_ln": {"scale": t(f"{p}.output.LayerNorm.weight"),
                      "bias": t(f"{p}.output.LayerNorm.bias")},
        }
    return params
