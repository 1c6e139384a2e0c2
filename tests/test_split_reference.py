"""Reference split-semantics battery: the same 12-interaction frame the
reference's split tests pin down (tests/test_split_data.py), expressed as
one table of (splitter, kwargs, expected train/eval sizes, checks) —
covering shuffle / filter_unknown / pad_unknown / pad_val across all five
strategies, plus the misc-utils contract (tests/test_misc.py)."""
import pandas as pd
import pytest

from librecommender_tpu.data import (
    random_split,
    split_by_num,
    split_by_num_chrono,
    split_by_ratio,
    split_by_ratio_chrono,
)

# 5 users; user 4617 has 3 rows, users 1298/4585 have 2, the rest 1 —
# the exact interaction pattern whose split counts the reference asserts
_ROWS = [
    (4617, 296, 2, 964138229), (4617, 296, 2, 964138221),
    (4617, 296, 2, 964138222), (1298, 208, 4, 974849526),
    (4585, 1769, 4, 964322774), (3706, 1136, 5, 966376465),
    (2137, 1215, 3, 974640099), (4617, 208, 4, 974170662),
    (1298, 1769, 3, 977854274), (4585, 208, 4, 974607346),
    (263, 1136, 2, 976651827), (5184, 1215, 5, 961735308),
]
FRAME = pd.DataFrame(_ROWS, columns=["user", "item", "label", "time"])

CASES = [
    # (splitter, kwargs, n_train, n_eval, extra check on eval frame)
    ("ratio-filtered", split_by_ratio,
     dict(test_size=0.5, filter_unknown=True), 10, 2, None),
    ("ratio-shuffled-padded", split_by_ratio,
     dict(test_size=0.5, shuffle=True, filter_unknown=False,
          pad_unknown=True, pad_val=0), 10, 2, None),
    ("num-filtered", split_by_num,
     dict(test_size=1, filter_unknown=True), 11, 1, None),
    ("num-shuffled-padded", split_by_num,
     dict(test_size=1, shuffle=True, filter_unknown=False,
          pad_unknown=True, pad_val=0), 11, 1, None),
    ("ratio-chrono", split_by_ratio_chrono, dict(test_size=0.5),
     10, 2, None),
    ("num-chrono", split_by_num_chrono, dict(test_size=1), 11, 1, None),
    ("random-unfiltered-listpad", random_split,
     dict(test_size=0.5, shuffle=False, filter_unknown=False,
          pad_unknown=True, pad_val=[-1, -1]), 6, 6,
     lambda ev: ev["user"].min() == -1),
    ("random-unfiltered-scalarpad", random_split,
     dict(test_size=0.5, shuffle=False, filter_unknown=False,
          pad_unknown=True, pad_val=0), 6, 6,
     lambda ev: ev["user"].min() == 0),
    ("random-filtered", random_split,
     dict(test_size=0.5, shuffle=False, filter_unknown=True), 6, 3, None),
]


@pytest.mark.parametrize(
    "splitter, kwargs, n_train, n_eval, check",
    [c[1:] for c in CASES], ids=[c[0] for c in CASES],
)
def test_split_semantics(splitter, kwargs, n_train, n_eval, check):
    train, evals = splitter(FRAME, **kwargs)
    assert len(train) == n_train
    assert len(evals) == n_eval
    if check is not None:
        assert check(evals)


def test_random_split_three_way():
    parts = random_split(FRAME, multi_ratios=[0.8, 0.1, 0.1])
    assert len(parts) == 3
    assert sum(len(p) for p in parts) == len(FRAME)


def test_misc_utils():
    """time_func decorator, time_block context (incl. exception
    passthrough), colorize — the reference utils/misc.py contract."""
    import time as _time

    from librecommender_tpu.utils.misc import colorize, time_block, time_func

    @time_func
    def long_work():
        _time.sleep(0.01)
        return colorize("done!", color="red", bold=True, highlight=True)

    out = long_work()
    assert "done!" in out and out.startswith("\033[")
    with time_block("long work2", verbose=0):
        _time.sleep(0.01)
    with pytest.raises(RuntimeError):
        with time_block("long work2", verbose=0):
            raise RuntimeError
