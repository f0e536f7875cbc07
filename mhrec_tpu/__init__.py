"""mhrec_tpu — a TPU-native generative-recommender framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
"Multi-Head Recommendation with Human Priors" (reference:
zhykoties/Multi-Head-Recommendation-with-Human-Priors): sequential /
generative recommenders (HSTU and HLLM two-tower LLM stacks) trained with
in-batch + sampled-negative InfoNCE, multi-head "medusa" decoding bound to
human-prior structure (item categories / user clusters / event types), and
full-corpus retrieval evaluation (Recall@K / NDCG@K / Entropy@K).

Everything on the compute path is JAX (jit/pjit over a device Mesh, Pallas
kernels for the HSTU pointwise attention); the host side (config, data,
metrics aggregation) is numpy/pyarrow.
"""

__version__ = "0.1.0"

from mhrec_tpu.config import Config  # noqa: F401
