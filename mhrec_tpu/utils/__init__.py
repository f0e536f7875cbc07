from mhrec_tpu.utils.logger import init_logger, set_color  # noqa: F401
from mhrec_tpu.utils.misc import (  # noqa: F401
    early_stopping,
    calculate_valid_score,
    init_seed,
    get_model,
)
from mhrec_tpu.utils.enums import InputType, EvaluatorType  # noqa: F401
