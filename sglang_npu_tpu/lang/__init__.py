from sglang_npu_tpu.lang.api import (  # noqa: F401
    EngineBackend,
    RuntimeEndpoint,
    assistant,
    function,
    gen,
    image,
    select,
    set_default_backend,
    system,
    user,
)
from sglang_npu_tpu.lang.backends import (  # noqa: F401
    AnthropicBackend,
    LiteLLMBackend,
    OpenAIBackend,
)
from sglang_npu_tpu.lang.tracer import (  # noqa: F401
    CompiledFunction,
    TracedProgram,
    trace,
)
