"""Multimodal plumbing tests: schema, batch-boundary integrity, and
the real (numpy) transforms layered over the stubbed decode."""

from __future__ import annotations

import numpy as np


def test_resize_dims_and_determinism(spark):
    from h3_indexer_spark.operators.multimodal import (
        resize_images,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n=50)
    out = resize_images(media, target_w=4, target_h=4).collect()
    assert len(out) == 50
    for r in out:
        assert (r.width, r.height, r.channels) == (4, 4, 3)
        assert len(r.pixels) == 4 * 4 * 3
    again = {r.media_id: bytes(r.pixels) for r in resize_images(
        media, target_w=4, target_h=4
    ).collect()}
    for r in out:
        assert bytes(r.pixels) == again[r.media_id]


def test_resize_is_nearest_neighbor_of_decode(spark):
    from h3_indexer_spark.operators.multimodal import (
        _fake_decode,
        resize_images,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n=5)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in resize_images(media, target_w=2, target_h=2).collect():
        img = _fake_decode(payloads[r.media_id])
        ys = (np.arange(2) * img.shape[0]) // 2
        xs = (np.arange(2) * img.shape[1]) // 2
        expect = img[np.ix_(ys, xs)].tobytes()
        assert bytes(r.pixels) == expect


def test_features_compose_with_similarity(spark):
    """extract_features output feeds cosine_topk_brute directly."""
    from h3_indexer_spark.operators.multimodal import (
        extract_features,
        synthesize_media_table,
    )
    from h3_indexer_spark.operators.similarity import cosine_topk_brute

    media = synthesize_media_table(spark, n=30)
    feats = extract_features(media, dim=16)
    first = feats.orderBy("media_id").first()
    top = cosine_topk_brute(
        feats, list(first.feature), k=3, vec_col="feature", id_col="media_id"
    ).collect()
    assert top[0].media_id == first.media_id
    assert abs(top[0].cosine_sim - 1.0) < 1e-6
