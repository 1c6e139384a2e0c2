"""Consumed-interaction bookkeeping.

``user_consumed[u]`` lists the items user ``u`` interacted with (first
occurrence order, deduplicated); ``item_consumed[i]`` the users per item.
Reference parity: libreco/data/consumed.py (the reference defers to a Rust
helper; here it's vectorized pandas/numpy).
"""
import numpy as np
import pandas as pd


def interaction_consumed(user_indices, item_indices):
    frame = pd.DataFrame(
        {"user": np.asarray(user_indices), "item": np.asarray(item_indices)}
    )
    dedup = frame.drop_duplicates(keep="first")
    user_consumed = {
        int(u): items.tolist()
        for u, items in dedup.groupby("user", sort=False)["item"]
    }
    item_consumed = {
        int(i): users.tolist()
        for i, users in dedup.groupby("item", sort=False)["user"]
    }
    return user_consumed, item_consumed


def update_consumed(user_indices, item_indices, n_users, n_items, old_info, merge_behavior):
    user_consumed, item_consumed = interaction_consumed(user_indices, item_indices)
    if merge_behavior:
        user_consumed = _merge_dedup(user_consumed, n_users, old_info.user_consumed)
        item_consumed = _merge_dedup(item_consumed, n_items, old_info.item_consumed)
    else:
        user_consumed = _fill_empty(user_consumed, n_users, old_info.user_consumed)
        item_consumed = _fill_empty(item_consumed, n_items, old_info.item_consumed)
    return user_consumed, item_consumed


def _merge_dedup(new_consumed, num, old_consumed):
    result = {}
    for i in range(num):
        assert i in new_consumed or i in old_consumed
        if i in new_consumed and i in old_consumed:
            result[i] = old_consumed[i] + new_consumed[i]
        else:
            result[i] = new_consumed[i] if i in new_consumed else old_consumed[i]
    return result


def _fill_empty(consumed, num, old_consumed):
    return {i: consumed[i] if i in consumed else old_consumed[i] for i in range(num)}
