"""Small shared utilities (reference: `python/sglang/srt/utils.py` subset)."""

from __future__ import annotations

import logging
import os
import random
import sys
import traceback

logger = logging.getLogger(__name__)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def get_bool_env_var(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("true", "1", "yes")


def get_exception_traceback() -> str:
    etype, value, tb = sys.exc_info()
    return "".join(traceback.format_exception(etype, value, tb))


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    try:
        import numpy as np

        np.random.seed(seed % (2**32))
    except ImportError:
        pass


def pick_bucket(buckets, n: int) -> int:
    """Smallest bucket >= n; buckets must be sorted ascending."""
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]
