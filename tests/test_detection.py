"""detection_postprocess vs an independent numpy oracle.

Oracle reimplements the TFLite Detection_PostProcess semantics
(CenterSize decode, greedy NMS) directly in numpy, independent of the op's
lax formulation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from compute_engine_tpu.ops.detection import detection_postprocess


def _decode_np(raw, anchors, scales):
    ys, xs, hs, ws = scales
    ya, xa, ha, wa = anchors.T
    ty, tx, th, tw = raw.T
    yc = ty / ys * ha + ya
    xc = tx / xs * wa + xa
    hh = 0.5 * np.exp(th / hs) * ha
    hw = 0.5 * np.exp(tw / ws) * wa
    return np.stack([yc - hh, xc - hw, yc + hh, xc + hw], axis=-1)


def _iou_np(a, b):
    ymin = np.maximum(a[0], b[:, 0])
    xmin = np.maximum(a[1], b[:, 1])
    ymax = np.minimum(a[2], b[:, 2])
    xmax = np.minimum(a[3], b[:, 3])
    inter = np.maximum(ymax - ymin, 0) * np.maximum(xmax - xmin, 0)
    area_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
        b[:, 3] - b[:, 1], 0)
    union = area_a + area_b - inter
    return np.where(union > 0, inter / union, 0.0)


def _nms_np(boxes, scores, max_out, iou_thr, score_thr):
    live = scores.copy().astype(np.float64)
    live[live <= score_thr] = -np.inf
    kept = []
    for _ in range(max_out):
        best = int(np.argmax(live))
        if not np.isfinite(live[best]):
            break
        kept.append(best)
        sup = _iou_np(boxes[best], boxes) >= iou_thr
        sup[best] = True
        live[sup] = -np.inf
    return kept


def _case(seed, a=40, c=3):
    rng = np.random.default_rng(seed)
    anchors = np.stack([
        rng.uniform(0.1, 0.9, a), rng.uniform(0.1, 0.9, a),
        rng.uniform(0.1, 0.4, a), rng.uniform(0.1, 0.4, a)], axis=-1)
    raw = rng.normal(0, 1, (1, a, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (1, a, c)).astype(np.float32)
    return raw, scores, anchors.astype(np.float32)


SCALES = (10.0, 10.0, 5.0, 5.0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_nms_matches_oracle(seed):
    raw, scores, anchors = _case(seed)
    out_b, out_c, out_s, n = detection_postprocess(
        jnp.asarray(raw), jnp.asarray(scores), jnp.asarray(anchors),
        max_detections=10, iou_threshold=0.5, score_threshold=0.3,
        scales=SCALES)
    boxes = _decode_np(raw[0], anchors, SCALES)
    best = scores[0].max(-1)
    kept = _nms_np(boxes, best, 10, 0.5, 0.3)
    assert int(n[0]) == len(kept)
    for i, k in enumerate(kept):
        np.testing.assert_allclose(np.asarray(out_b)[0, i], boxes[k],
                                   rtol=1e-5, atol=1e-5)
        assert int(out_c[0, i]) == int(scores[0, k].argmax())
        np.testing.assert_allclose(float(out_s[0, i]), best[k], rtol=1e-5)
    # Invalid slots zeroed.
    assert np.all(np.asarray(out_s)[0, len(kept):] == 0)


def test_regular_nms_per_class():
    raw, scores, anchors = _case(3, a=30, c=4)
    out_b, out_c, out_s, n = detection_postprocess(
        jnp.asarray(raw), jnp.asarray(scores), jnp.asarray(anchors),
        max_detections=8, iou_threshold=0.5, score_threshold=0.25,
        scales=SCALES, use_regular_nms=True)
    boxes = _decode_np(raw[0], anchors, SCALES)
    cands = []
    for c in range(4):
        for k in _nms_np(boxes, scores[0, :, c], 8, 0.5, 0.25):
            cands.append((scores[0, k, c], c, k))
    cands.sort(key=lambda t: -t[0])
    cands = cands[:8]
    assert int(n[0]) == len(cands)
    for i, (s, c, k) in enumerate(cands):
        np.testing.assert_allclose(float(out_s[0, i]), s, rtol=1e-5)
        assert int(out_c[0, i]) == c
        np.testing.assert_allclose(np.asarray(out_b)[0, i], boxes[k],
                                   rtol=1e-5, atol=1e-5)


def test_int8_inputs_dequantized_inline():
    """int8 boxes/scores/anchors + (scale, zp) == float path on the
    dequantized values (the reference pass's int8 rewire)."""
    raw, scores, anchors = _case(4)
    bq, bs, bzp = raw, 0.05, 3
    sq, ss, szp = scores, 1 / 255.0, -128
    aq, as_, azp = anchors, 0.004, 0
    b_i8 = np.clip(np.round(bq / bs) + bzp, -128, 127).astype(np.int8)
    s_i8 = np.clip(np.round(sq / ss) + szp, -128, 127).astype(np.int8)
    a_i8 = np.clip(np.round(aq / as_) + azp, -128, 127).astype(np.int8)
    got = detection_postprocess(
        jnp.asarray(b_i8), jnp.asarray(s_i8), jnp.asarray(a_i8),
        max_detections=6, iou_threshold=0.5, score_threshold=0.3,
        scales=SCALES, boxes_quant=(bs, bzp), scores_quant=(ss, szp),
        anchors_quant=(as_, azp))
    want = detection_postprocess(
        jnp.asarray((b_i8.astype(np.float32) - bzp) * bs),
        jnp.asarray((s_i8.astype(np.float32) - szp) * ss),
        jnp.asarray((a_i8.astype(np.float32) - azp) * as_),
        max_detections=6, iou_threshold=0.5, score_threshold=0.3,
        scales=SCALES)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)


def test_batch_vmap():
    raw, scores, anchors = _case(5)
    raw2 = np.concatenate([raw, raw * 0.5])
    scores2 = np.concatenate([scores, scores[:, ::-1]])
    out = detection_postprocess(
        jnp.asarray(raw2), jnp.asarray(scores2), jnp.asarray(anchors),
        max_detections=5, iou_threshold=0.5, score_threshold=0.3,
        scales=SCALES)
    one = detection_postprocess(
        jnp.asarray(raw2[1:]), jnp.asarray(scores2[1:]),
        jnp.asarray(anchors), max_detections=5, iou_threshold=0.5,
        score_threshold=0.3, scales=SCALES)
    for a, b in zip(out, one):
        np.testing.assert_allclose(np.asarray(a)[1], np.asarray(b)[0],
                                   rtol=1e-6)


def test_validation_raises():
    raw, scores, anchors = _case(6)
    with pytest.raises(ValueError, match=r"boxes must be \(B, A, 4\)"):
        detection_postprocess(jnp.zeros((4, 3)), jnp.asarray(scores),
                              jnp.asarray(anchors))
    with pytest.raises(ValueError, match="scores must be"):
        detection_postprocess(jnp.asarray(raw), jnp.zeros((1, 7, 2)),
                              jnp.asarray(anchors))
    with pytest.raises(ValueError, match="anchors must be"):
        detection_postprocess(jnp.asarray(raw), jnp.asarray(scores),
                              jnp.zeros((3, 4)))
    with pytest.raises(TypeError, match="int8 but no"):
        detection_postprocess(jnp.zeros((1, 40, 4), jnp.int8),
                              jnp.asarray(scores), jnp.asarray(anchors))
    with pytest.raises(TypeError, match="!= int8"):
        detection_postprocess(jnp.asarray(raw), jnp.asarray(scores),
                              jnp.asarray(anchors), boxes_quant=(0.1, 0))
