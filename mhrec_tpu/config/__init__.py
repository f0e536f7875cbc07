from mhrec_tpu.config.config import Config, convert_str  # noqa: F401
