from sglang_npu_tpu.lang.api import (  # noqa: F401
    EngineBackend,
    RuntimeEndpoint,
    assistant,
    function,
    gen,
    select,
    set_default_backend,
    system,
    user,
)
