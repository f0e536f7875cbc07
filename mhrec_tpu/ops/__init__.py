from mhrec_tpu.ops.hstu_attention import hstu_attention  # noqa: F401
