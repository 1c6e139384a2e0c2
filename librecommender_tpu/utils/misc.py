"""Small shared helpers: timing, colored printing, parameter counting.

Reference parity: libreco/utils/misc.py (time_block :59, colorize :77,
count_params :15).
"""
import time
from contextlib import contextmanager

import numpy as np

_ANSI = {
    "red": 31,
    "green": 32,
    "yellow": 33,
    "blue": 34,
    "magenta": 35,
    "cyan": 36,
    "white": 37,
}


def colorize(string, color, bold=False, highlight=False):
    """Wrap ``string`` in ANSI color codes (reference utils/misc.py
    colorize contract, incl. the background-highlight variant)."""
    code = _ANSI.get(color, 37)
    if highlight:
        code += 10  # ANSI background color offset
    prefix = f"\033[{'1;' if bold else ''}{code}m"
    return f"{prefix}{string}\033[0m"


def time_func(func):
    """Decorator printing a function's elapsed wall-clock time
    (reference utils/misc.py ``time_func``)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        try:
            return func(*args, **kwargs)
        finally:
            elapsed = time.perf_counter() - start
            print(colorize(f"{func.__name__} elapsed: {elapsed:.3f}s",
                           "green"))

    return wrapper


@contextmanager
def time_block(block_name="block", verbose=1):
    """Context manager printing elapsed wall-clock time of a block."""
    if verbose > 0:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            msg = f"{block_name} elapsed: {elapsed:.3f}s"
            print(colorize(msg, "green"))
    else:
        yield


def count_params(params):
    """Count total number of scalars in a params pytree."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(np.prod(leaf.shape)) for leaf in leaves)
    print(colorize(f"total params: {total:,}", "cyan"))
    return total
