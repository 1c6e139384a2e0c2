"""Consumed-interaction bookkeeping.

``user_consumed[u]`` lists the items user ``u`` interacted with in
interaction order with CONSECUTIVE duplicates removed — the reference's
exact semantics (libreco/data/consumed.py defers to its Rust
``_remove_consecutive_duplicates``; ported battery in
tests/test_batch_semantics.py). Revisits separated by other interactions
are kept: they re-enter the recent-history window like the reference's.
``item_consumed[i]`` lists the users per item the same way.
"""
import numpy as np
import pandas as pd


def interaction_consumed(user_indices, item_indices):
    frame = pd.DataFrame(
        {"user": np.asarray(user_indices), "item": np.asarray(item_indices)}
    )
    # consecutive-duplicate removal happens WITHIN each group's own
    # subsequence (a user's items; an item's users) — two distinct masks
    u_keep = frame["item"] != frame.groupby("user")["item"].shift()
    user_consumed = {
        int(u): items.tolist()
        for u, items in frame[u_keep].groupby("user", sort=False)["item"]
    }
    i_keep = frame["user"] != frame.groupby("item")["user"].shift()
    item_consumed = {
        int(i): users.tolist()
        for i, users in frame[i_keep].groupby("item", sort=False)["user"]
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
