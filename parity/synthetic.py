"""ML-1M-scale synthetic interaction data with PLANTED structure.

The reference's bundled 20k-row sample has ~4 interactions/user after a
chrono split — near the learnability floor for every model (round-1 PARITY
observation). This generator plants recoverable structure so AUC/NDCG have
headroom and ours-vs-reference differences are attributable to the
implementations:

- latent user/item factors (rank ``d``) drive a soft-max consumption model,
- genres carry real signal (items cluster by genre; users have genre
  affinities feeding the same logits),
- ratings 1..5 follow affinity quantiles,
- timestamps order each user's history by a slowly drifting preference
  vector, giving sequence models a learnable recent-history signal.

Scale defaults mirror MovieLens-1M (6040 users / 3706 items / 1M rows).
"""
import numpy as np
import pandas as pd

GENRES = ["action", "comedy", "drama", "horror", "romance", "scifi", "doc"]
SEXES = ["m", "f"]
OCCUPATIONS = [f"occ{i}" for i in range(8)]


def make_ml1m_like(
    n_users=6040,
    n_items=3706,
    interactions_per_user=165,
    d=12,
    genre_weight=1.2,
    drift=0.15,
    seed=0,
    demo_effect=0.0,
):
    """``demo_effect > 0`` plants a DEMOGRAPHIC rating component
    (sex x genre and age x genre effects feed the rating affinity, not
    just the consumption logits) so supervised estimators that see only
    (sex, age, occupation, genre) have real signal — the offline-tier
    anchor dataset (PARITY.md "Offline batch tier"). The default 0.0
    leaves the original generator byte-identical (the extra coefficients
    draw from a SEPARATE rng stream, only when enabled)."""
    rng = np.random.default_rng(seed)
    user_f = rng.normal(size=(n_users, d)).astype(np.float32)
    item_f = rng.normal(size=(n_items, d)).astype(np.float32)
    item_genre = rng.integers(0, len(GENRES), n_items)
    # genre centroids pull item factors together (planted cluster signal)
    centroids = rng.normal(size=(len(GENRES), d)).astype(np.float32)
    item_f = 0.6 * item_f + 0.8 * centroids[item_genre]
    user_genre_aff = rng.normal(size=(n_users, len(GENRES))).astype(np.float32)

    user_sex = rng.integers(0, 2, n_users)
    user_age = rng.integers(16, 60, n_users)
    user_occ = rng.integers(0, len(OCCUPATIONS), n_users)
    # demographic effects feed the logits too (so feat models gain from them)
    sex_genre = rng.normal(scale=0.5, size=(2, len(GENRES))).astype(np.float32)
    if demo_effect:
        rng_demo = np.random.default_rng(seed + 1000)
        rate_sex_genre = rng_demo.normal(
            scale=1.0, size=(2, len(GENRES))
        ).astype(np.float32)
        rate_age_genre = rng_demo.normal(
            scale=1.0, size=len(GENRES)
        ).astype(np.float32)

    rows_u, rows_i, rows_r, rows_t = [], [], [], []
    for u in range(n_users):
        n_u = int(rng.integers(
            max(20, interactions_per_user // 3), interactions_per_user * 2
        ))
        n_u = min(n_u, n_items - 1)
        pref = user_f[u].copy()
        consumed = []
        # consume in bursts with a drifting preference vector -> timestamps
        # carry sequence signal
        remaining_mask = np.ones(n_items, bool)
        batch = max(8, n_u // 8)
        while len(consumed) < n_u:
            logits = item_f @ pref
            logits = logits + genre_weight * (
                user_genre_aff[u, item_genre] + sex_genre[user_sex[u], item_genre]
            )
            logits = np.where(remaining_mask, logits, -np.inf)
            take = min(batch, n_u - len(consumed))
            p = np.exp((logits - logits.max()) / 1.2)
            p = np.where(remaining_mask, p, 0.0)
            p = p / p.sum()
            picks = rng.choice(n_items, size=take, replace=False, p=p)
            remaining_mask[picks] = False
            consumed.extend(picks.tolist())
            pref = (1.0 - drift) * pref + drift * rng.normal(size=d).astype(
                np.float32
            )
        consumed = np.asarray(consumed)
        aff = item_f[consumed] @ user_f[u] + genre_weight * user_genre_aff[
            u, item_genre[consumed]
        ]
        if demo_effect:
            g_c = item_genre[consumed]
            age_n = (user_age[u] - 38.0) / 22.0
            aff = aff + demo_effect * (
                rate_sex_genre[user_sex[u], g_c] + age_n * rate_age_genre[g_c]
            )
        q = np.argsort(np.argsort(aff)) / max(1, len(aff) - 1)
        ratings = np.clip(np.round(1 + 4 * q + rng.normal(scale=0.4, size=len(aff))), 1, 5)
        rows_u.append(np.full(len(consumed), u))
        rows_i.append(consumed)
        rows_r.append(ratings)
        rows_t.append(np.arange(len(consumed)) + u * 10_000)

    frame = pd.DataFrame({
        "user": np.concatenate(rows_u),
        "item": np.concatenate(rows_i),
        "label": np.concatenate(rows_r).astype(np.float64),
        "time": np.concatenate(rows_t),
    })
    frame["sex"] = np.asarray(SEXES)[user_sex[frame.user]]
    frame["age"] = user_age[frame.user]
    frame["occupation"] = np.asarray(OCCUPATIONS)[user_occ[frame.user]]
    frame["genre"] = np.asarray(GENRES)[item_genre[frame.item]]
    return frame


def chrono_split(frame, test_size=0.2):
    """Per-user chronological split shared VERBATIM by both frameworks so
    the reference column and ours train/evaluate on identical rows."""
    frame = frame.sort_values(["user", "time"], kind="stable")
    rank = frame.groupby("user").cumcount()
    size = frame.groupby("user")["user"].transform("size")
    is_train = rank < ((1.0 - test_size) * size).astype(int)
    train = frame[is_train].reset_index(drop=True)
    evals = frame[~is_train].reset_index(drop=True)
    return train, evals


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_ml1m"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    frame = make_ml1m_like(
        n_users=int(6040 * scale), n_items=max(500, int(3706 * scale)),
        interactions_per_user=165,
    )
    train, evals = chrono_split(frame)
    import pathlib

    p = pathlib.Path(out)
    p.mkdir(parents=True, exist_ok=True)
    train.to_csv(p / "train.csv", index=False)
    evals.to_csv(p / "eval.csv", index=False)
    print(f"{len(frame)} rows, {frame.user.nunique()} users, "
          f"{frame.item.nunique()} items -> {p}")
