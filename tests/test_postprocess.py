import jax.numpy as jnp
import numpy as np

from custom_d_fine_tpu.ops.postprocess import classwise_nms_padded, topk_detections


def test_topk_detections_flat_topk_semantics():
    # 2 queries, 3 classes: scores such that top-4 flat picks span queries
    logits = jnp.asarray([[[5.0, -10.0, 2.0], [3.0, 4.0, -10.0]]])  # [1,2,3]
    boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.25, 0.25, 0.1, 0.1]]])
    out = topk_detections(logits, boxes, num_top=4, out_size=(100, 200))
    labels = np.asarray(out["labels"][0])
    scores = np.asarray(out["scores"][0])
    # order: q0c0 (5) > q1c1 (4) > q1c0 (3) > q0c2 (2)
    assert labels.tolist() == [0, 1, 0, 2]
    assert (np.diff(scores) <= 0).all()
    b = np.asarray(out["boxes"][0])
    # q0 box scaled: cx=.5*200=100 etc -> xyxy (80, 40, 120, 60)
    np.testing.assert_allclose(b[0], [80, 40, 120, 60], atol=1e-4)
    np.testing.assert_allclose(b[1], [40, 20, 60, 30], atol=1e-4)


def test_classwise_nms():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],     # overlaps box0, same class, lower score -> suppressed
        [0, 0, 10, 10],     # overlaps box0 but DIFFERENT class -> kept
        [50, 50, 60, 60],   # far away -> kept
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.asarray([0, 0, 1, 0])
    keep = np.asarray(classwise_nms_padded(boxes, scores, labels, 0.5))
    assert keep.tolist() == [True, False, True, True]


def test_nms_respects_score_order_not_index_order():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.5, 0.9])  # second box has higher score
    labels = jnp.asarray([0, 0])
    keep = np.asarray(classwise_nms_padded(boxes, scores, labels, 0.5))
    assert keep.tolist() == [False, True]


def test_fast_topk_matches_exact():
    """Two-stage TPU top-k (serving path) must return the exact top-k set:
    each chunk keeps k candidates, so no global top-k element can be lost."""
    import jax

    from custom_d_fine_tpu.ops.postprocess import fast_topk

    rng = np.random.default_rng(0)
    for B, N, k in [(1, 24000, 300), (2, 8400, 300), (1, 1000, 300),
                    (3, 512, 17)]:
        x = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
        ve, ie = jax.lax.top_k(x, k)
        vf, if_ = fast_topk(x, k)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(ve), atol=0)
        # indices may differ only on exact ties; values must be identical
        np.testing.assert_array_equal(
            np.sort(np.asarray(if_), axis=1) == np.sort(np.asarray(ie), axis=1),
            True)
