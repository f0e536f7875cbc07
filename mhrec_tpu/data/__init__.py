from mhrec_tpu.data.interaction import InteractionData  # noqa: F401
from mhrec_tpu.data.loaders import build_dataloader  # noqa: F401
