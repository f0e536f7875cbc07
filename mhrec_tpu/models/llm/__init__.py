from mhrec_tpu.models.llm.config import LLMConfig  # noqa: F401
from mhrec_tpu.models.llm.llama import LlamaBackbone  # noqa: F401
from mhrec_tpu.models.llm.dummy import DummyLLM  # noqa: F401
