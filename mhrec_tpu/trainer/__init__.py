from mhrec_tpu.trainer.trainer import Trainer  # noqa: F401
