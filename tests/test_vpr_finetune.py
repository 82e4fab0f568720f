"""VPR fine-tuning demonstrably reduces cross-floor aliasing
(train/vpr_finetune_demo.py; round-2 verdict #3).

NT-Xent over (floor, place) labels teaches a tiny ViT encoder to amplify
the subtle per-floor appearance cue, so cross-floor false retrieval drops
and same-floor recall rises versus the random-init encoder.
"""

import numpy as np

from mlis_tpu.train.vpr_finetune_demo import (
    make_aliasing_images,
    retrieval_metrics,
    run_demo,
)


def test_aliasing_set_construction():
    images, place_ids, floors = make_aliasing_images(
        n_places=3, n_views=2, hw=(32, 48)
    )
    assert images.shape == (12, 32, 48, 3)
    assert len(set(place_ids.tolist())) == 6  # floor-specific places
    assert set(floors.tolist()) == {2, 5}
    # cross-floor same-plan images share textures: their raw pixels are
    # far more similar than different-plan pairs on the same floor
    flat = images[..., 0].reshape(12, -1)
    flat = flat - flat.mean(1, keepdims=True)
    flat /= np.linalg.norm(flat, axis=1, keepdims=True) + 1e-8
    sims = flat @ flat.T
    aliased = [sims[i, i + 6] for i in range(6)]  # same plan, other floor
    unrelated = [
        sims[a, b]
        for a in range(6)
        for b in range(a + 1, 6)
        if place_ids[a] != place_ids[b]  # same floor, different plan
    ]
    assert np.mean(aliased) > np.mean(unrelated) + 0.1


def test_finetune_reduces_cross_floor_retrieval():
    r = run_demo(steps=150)
    assert r["loss_last"] < r["loss_first"] * 0.5
    before, after = r["before"], r["after"]
    assert (
        after["cross_floor_false_rate"]
        <= before["cross_floor_false_rate"] - 0.15
    ), r
    assert after["same_floor_recall"] >= 0.9, r
    assert after["same_floor_recall"] > before["same_floor_recall"], r
