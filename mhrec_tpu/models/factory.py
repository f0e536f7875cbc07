"""Model registry: config['model'] name → builder (reference
``REC/utils/utils.py:38-57`` dynamic import, made explicit)."""

from __future__ import annotations


def build_model(config, dataload):
    name = str(config["model"] or "HSTU")
    if name == "HSTU":
        from mhrec_tpu.models.idnet.hstu import hstu_from_config

        return hstu_from_config(config, dataload)
    if name == "SASRec":
        from mhrec_tpu.models.idnet.sasrec import sasrec_from_config

        return sasrec_from_config(config, dataload)
    if name == "ComiRec":
        from mhrec_tpu.models.idnet.comirec import comirec_from_config

        return comirec_from_config(config, dataload)
    if name == "REMI":
        from mhrec_tpu.models.idnet.remi import remi_from_config

        return remi_from_config(config, dataload)
    if name == "DualVAE":
        from mhrec_tpu.models.idnet.dualvae import dualvae_from_config

        return dualvae_from_config(config, dataload)
    if name == "LLMIDRec":
        from mhrec_tpu.models.idnet.llmidrec import llmidrec_from_config

        return llmidrec_from_config(config, dataload)
    if name == "HLLM":
        from mhrec_tpu.models.hllm.hllm import hllm_from_config

        return hllm_from_config(config, dataload)
    raise ValueError(f"Unknown model {name!r}")
