from sglang_npu_tpu.utils.common import (  # noqa: F401
    cdiv,
    get_bool_env_var,
    get_exception_traceback,
    next_power_of_2,
    round_up,
    set_random_seed,
)
