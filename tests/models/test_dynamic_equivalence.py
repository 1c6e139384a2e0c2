"""Dynamic-override recommend must agree with the static path when the
overrides equal the stored state (VERDICT r2 #6): the online hot path now
routes through the same catalog scorers as the static path, with per-user
(U, F)/(U, L) override rows broadcast over items on device instead of being
tiled to (n_items, ...) host-side.
"""
import numpy as np
import pytest

from librecommender_tpu.models import FM, DIN, SIM


def _stored_request_seq(model, uid):
    """The user's consumed history as an inner-id request list whose
    conversion reproduces the stored recent-seq table row."""
    return [int(i) for i in model.user_consumed[uid]]


@pytest.fixture()
def din_fitted(feat_builds):
    train_data, *_, data_info = feat_builds
    model = DIN("ranking", data_info, embed_size=8, n_epochs=1,
                batch_size=256, recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    return model


def test_dynamic_equals_static_din_seq(din_fitted):
    """seq override == stored history -> identical recommendations."""
    model = din_fitted
    uids = [0, 1, 2, 5]
    static = model.recommend_user(user=uids, n_rec=6, inner_id=True)
    dynamic = model.recommend_user(
        user=uids, n_rec=6, inner_id=True,
        seq=[_stored_request_seq(model, u) for u in uids],
    )
    for u in uids:
        assert list(static[u]) == list(dynamic[u])


def test_dynamic_equals_static_din_feats(din_fitted):
    """Empty user_feats override (stored rows pass through the override
    assembly) -> identical recommendations."""
    model = din_fitted
    uids = [0, 3, 7]
    static = model.recommend_user(user=uids, n_rec=6, inner_id=True)
    dynamic = model.recommend_user(user=uids, n_rec=6, inner_id=True,
                                   user_feats={})
    for u in uids:
        assert list(static[u]) == list(dynamic[u])


def test_dynamic_equals_static_fm_generic_path(feat_builds):
    """FM has no catalog scorer: the generic pair loop consumes the same
    (U, F) override rows via device-side broadcast."""
    train_data, *_, data_info = feat_builds
    model = FM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256)
    model.fit(train_data, neg_sampling=True, verbose=0)
    uids = [0, 1, 4]
    static = model.recommend_user(user=uids, n_rec=6, inner_id=True)
    dynamic = model.recommend_user(user=uids, n_rec=6, inner_id=True,
                                   user_feats={})
    for u in uids:
        assert list(static[u]) == list(dynamic[u])


def test_dynamic_equals_static_sim_dual(feat_builds):
    """SIM: a request seq equal to the stored history reproduces BOTH the
    short and long stored windows (suffix-split convention)."""
    train_data, *_, data_info = feat_builds
    model = SIM("ranking", data_info, embed_size=8, n_epochs=1, batch_size=256,
                hidden_units=(16,), long_max_len=20, search_topk=5,
                recent_num=5)
    model.fit(train_data, neg_sampling=True, verbose=0)
    uids = [0, 2]
    static = model.recommend_user(user=uids, n_rec=6, inner_id=True)
    dynamic = model.recommend_user(
        user=uids, n_rec=6, inner_id=True,
        seq=[_stored_request_seq(model, u) for u in uids],
    )
    for u in uids:
        assert list(static[u]) == list(dynamic[u])


def test_dynamic_mixed_users_partial_overrides(din_fitted):
    """Per-user seq lists where overrides genuinely differ from stored
    state change that user's scores while stored-state users keep the
    static result (chunked multi-user dispatch correctness)."""
    model = din_fitted
    uids = [0, 1, 2]
    static = model.recommend_user(user=uids, n_rec=6, inner_id=True)
    other_items = list(range(10, 15))
    dynamic = model.recommend_user(
        user=uids, n_rec=6, inner_id=True,
        seq=[_stored_request_seq(model, 0), other_items,
             _stored_request_seq(model, 2)],
    )
    assert list(static[0]) == list(dynamic[0])
    assert list(static[2]) == list(dynamic[2])
    # user 1's single-user dynamic call agrees with its slot in the batch
    solo = model.recommend_user(user=1, n_rec=6, inner_id=True,
                                seq=other_items)
    assert list(solo[1]) == list(dynamic[1])


def test_two_tower_user_feats_recommend(feat_builds):
    """TwoTower recommend_user(user_feats=...) recomputes the user vector
    through the tower (reference UserEmbedModels online path): empty
    overrides reproduce the static result; real overrides change it."""
    from librecommender_tpu.models import TwoTower

    train_data, *_, data_info = feat_builds
    model = TwoTower("ranking", data_info, embed_size=8, n_epochs=1,
                     batch_size=256, loss_type="softmax", hidden_units=(16,))
    model.fit(train_data, neg_sampling=False, verbose=0)
    static = model.recommend_user(user=0, n_rec=6, inner_id=True)
    dyn = model.recommend_user(user=0, n_rec=6, inner_id=True, user_feats={})
    assert list(static[0]) == list(dyn[0])
    # an unknown user with overrides still gets tower-scored recs
    cold = model.recommend_user(user=-55, n_rec=6,
                                user_feats={"sex": "m", "age": 1.0})
    assert len(cold[-55]) == 6
    # base recommend contract holds on the feats path too (ADVICE r3):
    # cold_start="popular" gives the popularity list, not the OOV tower row
    from librecommender_tpu.recommendation.cold_start import (
        popular_recommendations,
    )

    pop = model.recommend_user(user=-55, n_rec=6, cold_start="popular",
                               user_feats={"sex": "m", "age": 1.0})
    expected = popular_recommendations(data_info, inner_id=True, n_rec=6)
    expected = [data_info.id2item[i] for i in expected]
    assert list(pop[-55]) == list(expected)
    with pytest.raises(ValueError):
        model.recommend_user(user=0, n_rec=6, cold_start="bogus",
                             user_feats={"sex": "m"})
    # random_rec is honored: known user, fixed rng state -> sampled output
    # is a valid rec list (and the arg no longer silently ignored)
    rnd = model.recommend_user(user=0, n_rec=6, inner_id=True,
                               random_rec=True, user_feats={"sex": "f"})
    assert len(rnd[0]) == 6
