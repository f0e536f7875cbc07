from mhrec_tpu.evaluator.registry import Register, metrics_dict, smaller_metrics  # noqa: F401
from mhrec_tpu.evaluator.collector import Collector, DataStruct  # noqa: F401
from mhrec_tpu.evaluator.evaluator import Evaluator  # noqa: F401
