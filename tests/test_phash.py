"""Perceptual dHash: invariance/sensitivity properties on real encoded
PNGs, routing through the media table, and the banded near-dup join."""

from __future__ import annotations

import numpy as np
import pytest

from gpt4ocontentextraction_spark.functions.phash import (
    DHASH_H,
    DHASH_W,
    dhash64,
    hamming64,
)
from gpt4ocontentextraction_spark.functions.png import encode_png
from gpt4ocontentextraction_spark.operators import multimodal as M


def _structured(w=64, h=48, seed=3):
    # blocky structured image (not noise): dHash needs real gradients
    rng = np.random.RandomState(seed)
    blocks = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
    px = np.kron(blocks, np.ones((h // 6, w // 8, 1), dtype=np.uint8))
    return px.astype(np.uint8)


def test_dhash_deterministic_and_signed_range():
    px = _structured()
    a, b = dhash64(px), dhash64(px.copy())
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)


def test_dhash_brightness_invariance():
    # dHash compares neighbors, so a uniform brightness shift that does
    # not saturate leaves every comparison unchanged
    px = _structured() // 2  # keep headroom
    shifted = px + 40
    assert dhash64(px) == dhash64(shifted)


def test_dhash_small_perturbation_small_distance():
    px = _structured()
    tweaked = px.copy()
    tweaked[0:2, 0:2] ^= 255  # a few pixels in one downsample cell
    d = hamming64(dhash64(px), dhash64(tweaked))
    assert d <= 3
    # a different structured image is far away
    other = _structured(seed=9)
    assert hamming64(dhash64(px), dhash64(other)) > 10


def test_dhash_gray_and_rgb_routes():
    g = _structured()[:, :, :1]  # single channel
    assert isinstance(dhash64(g), int)
    assert isinstance(dhash64(g[:, :, 0]), int)  # 2-D input


def test_image_phash_routes_real_and_fake(spark):
    import pandas as pd

    px = _structured()
    rows = [
        ("png_a", encode_png(px)),
        ("png_b", encode_png(px)),  # identical content, new encode
        ("fake_a", M.encode_fake(7, 16, 12)),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_ref", "data"])
    )
    out = {r["media_ref"]: r["phash"] for r in M.image_phash(media).collect()}
    assert out["png_a"] == out["png_b"] == dhash64(px)
    assert isinstance(out["fake_a"], int)  # deterministic fake route
    out2 = {
        r["media_ref"]: r["phash"] for r in M.image_phash(media).collect()
    }
    assert out == out2


def test_image_neardup_banded(spark):
    import pandas as pd

    base = _structured()
    near = base.copy()
    near[0:2, 0:2] ^= 255  # hamming <= 3 from base (pinned above)
    far = _structured(seed=9)
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                ("img_base", encode_png(base)),
                ("img_near", encode_png(near)),
                ("img_far", encode_png(far)),
            ],
            columns=["media_ref", "data"],
        )
    )
    pairs = M.image_neardup(media).collect()
    got = {(r["ref_a"], r["ref_b"]) for r in pairs}
    assert got == {("img_base", "img_near")}
    (p,) = pairs
    assert p["hamming"] == hamming64(dhash64(base), dhash64(near))
    # plan: equality join on bands, never a nested loop over images
    plan = (
        M.image_neardup(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_dims_constants():
    assert (DHASH_W - 1) * DHASH_H == 64
    with pytest.raises(Exception):
        dhash64("not pixels")
