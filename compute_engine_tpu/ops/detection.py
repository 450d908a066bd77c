"""SSD detection post-processing: box decode + NMS, int8 inputs supported.

TPU-native counterpart of the reference's DetectionPostProcess pass
(`mlir/transforms/detection_postprocess.cc:24-186`), whose job is to make
the TFLite ``TFLite_Detection_PostProcess`` custom op consume the int8
tensors a quantized SSD head produces directly (it strips the Dequantize
ops in front of the op and rewires the int8 boxes/scores/anchors straight
in). Here the op itself is provided: a jittable, static-shape
implementation of the TFLite custom op's semantics
(decode with y/x/h/w scales, fast max-class NMS or regular per-class NMS),
and the int8 fast path is native — pass int8 arrays plus ``(scale,
zero_point)`` and the dequantize happens inside the fused kernel instead
of as a separate graph op, which is exactly the rewrite the reference pass
performs.

TPU-first design notes: everything is static-shape (outputs are always
``max_detections`` long with a ``num_detections`` count), the NMS is a
``lax.fori_loop`` of vectorised IoU suppressions (no data-dependent
shapes, so XLA compiles one program), and the batch dimension is ``vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["detection_postprocess"]

_NEG_INF = -1e9


def _dequant(x, quant, name):
    """Inline dequantize: int8 array + (scale, zero_point) -> float32."""
    if quant is None:
        if x.dtype == jnp.int8:
            raise TypeError(f"{name} is int8 but no (scale, zero_point) "
                            f"was given")
        return x.astype(jnp.float32)
    if x.dtype != jnp.int8:
        raise TypeError(f"{name} has quantization params but dtype "
                        f"{x.dtype} != int8")
    scale, zero_point = quant
    return (x.astype(jnp.float32) - float(zero_point)) * float(scale)


def _decode_boxes(raw, anchors, scales):
    """TFLite CenterSize decode -> (ymin, xmin, ymax, xmax)."""
    y_scale, x_scale, h_scale, w_scale = scales
    ya, xa, ha, wa = jnp.moveaxis(anchors, -1, 0)
    ty, tx, th, tw = jnp.moveaxis(raw, -1, 0)
    ycenter = ty / y_scale * ha + ya
    xcenter = tx / x_scale * wa + xa
    half_h = 0.5 * jnp.exp(th / h_scale) * ha
    half_w = 0.5 * jnp.exp(tw / w_scale) * wa
    return jnp.stack([ycenter - half_h, xcenter - half_w,
                      ycenter + half_h, xcenter + half_w], axis=-1)


def _iou_one_vs_all(box, boxes):
    """IoU of one (4,) box against (A, 4) boxes; zero-area safe."""
    ymin = jnp.maximum(box[0], boxes[:, 0])
    xmin = jnp.maximum(box[1], boxes[:, 1])
    ymax = jnp.minimum(box[2], boxes[:, 2])
    xmax = jnp.minimum(box[3], boxes[:, 3])
    inter = (jnp.maximum(ymax - ymin, 0.0) * jnp.maximum(xmax - xmin, 0.0))
    area = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(
        box[3] - box[1], 0.0)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0)
    union = area + areas - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _nms(boxes, scores, max_out, iou_threshold, score_threshold):
    """Greedy static-shape NMS.

    Returns (indices (max_out,), valid (max_out,) bool). Invalid slots
    carry index 0 and valid=False. One ``fori_loop`` step = one selection:
    argmax over the live score vector, then a vectorised IoU suppression —
    the TFLite kernel's sort+scan is replaced by max+mask, which is what
    the VPU is good at.
    """
    live = jnp.where(scores > score_threshold, scores, _NEG_INF)

    def body(i, state):
        live, idxs, valid = state
        best = jnp.argmax(live)
        ok = live[best] > _NEG_INF / 2
        idxs = idxs.at[i].set(jnp.where(ok, best, 0))
        valid = valid.at[i].set(ok)
        iou = _iou_one_vs_all(boxes[best], boxes)
        suppress = (iou >= iou_threshold) | (
            jnp.arange(boxes.shape[0]) == best)
        live = jnp.where(ok & suppress, _NEG_INF, live)
        return live, idxs, valid

    _, idxs, valid = jax.lax.fori_loop(
        0, max_out, body,
        (live, jnp.zeros((max_out,), jnp.int32),
         jnp.zeros((max_out,), bool)))
    return idxs, valid


def _postprocess_one(raw_boxes, class_scores, anchors, *, scales,
                     max_detections, iou_threshold, score_threshold,
                     use_regular_nms, max_classes_per_detection):
    boxes = _decode_boxes(raw_boxes, anchors, scales)  # (A, 4)
    num_classes = class_scores.shape[-1]

    if use_regular_nms:
        # Per-class NMS, then global top-max_detections across classes
        # (`detection_postprocess.cc` regular path semantics).
        cand_scores, cand_classes, cand_idx = [], [], []
        for c in range(num_classes):
            s = class_scores[:, c]
            idxs, valid = _nms(boxes, s, max_detections, iou_threshold,
                               score_threshold)
            cand_scores.append(jnp.where(valid, s[idxs], _NEG_INF))
            cand_classes.append(jnp.full((max_detections,), c, jnp.int32))
            cand_idx.append(idxs)
        cand_scores = jnp.concatenate(cand_scores)
        cand_classes = jnp.concatenate(cand_classes)
        cand_idx = jnp.concatenate(cand_idx)
        top_scores, top = jax.lax.top_k(cand_scores, max_detections)
        valid = top_scores > _NEG_INF / 2
        out_boxes = boxes[cand_idx[top]]
        out_classes = cand_classes[top]
        out_scores = top_scores
    else:
        # Fast path: single NMS on the per-anchor max class score; each
        # kept anchor emits its top max_classes_per_detection classes.
        anchor_best = jnp.max(class_scores, axis=-1)  # (A,)
        idxs, valid = _nms(boxes, anchor_best, max_detections,
                           iou_threshold, score_threshold)
        k = min(max_classes_per_detection, num_classes)
        kept_scores, kept_classes = jax.lax.top_k(class_scores[idxs], k)
        out_boxes = jnp.repeat(boxes[idxs], k, axis=0)[:max_detections]
        out_classes = kept_classes.reshape(-1)[:max_detections]
        out_scores = kept_scores.reshape(-1)[:max_detections]
        valid = jnp.repeat(valid, k)[:max_detections]

    out_boxes = jnp.where(valid[:, None], out_boxes, 0.0)
    out_classes = jnp.where(valid, out_classes, 0)
    out_scores = jnp.where(valid, out_scores, 0.0)
    return out_boxes, out_classes, out_scores, jnp.sum(valid, dtype=jnp.int32)


def detection_postprocess(boxes, scores, anchors, *,
                          max_detections=10,
                          iou_threshold=0.6,
                          score_threshold=0.001,
                          scales=(10.0, 10.0, 5.0, 5.0),
                          use_regular_nms=False,
                          max_classes_per_detection=1,
                          boxes_quant=None,
                          scores_quant=None,
                          anchors_quant=None):
    """TFLite ``Detection_PostProcess`` semantics, TPU-native.

    Args:
      boxes:   (B, A, 4) encoded [ty, tx, th, tw] — float or int8.
      scores:  (B, A, C) class scores (post-sigmoid) — float or int8.
      anchors: (A, 4) [ycenter, xcenter, h, w] — float or int8.
      scales:  (y, x, h, w) decode scales.
      *_quant: optional (scale, zero_point) per int8 input; when given the
        dequantize is fused into this op (the reference pass's int8 rewire,
        `detection_postprocess.cc:24-186`).

    Returns:
      nmsed_boxes (B, max_detections, 4) [ymin, xmin, ymax, xmax],
      classes (B, max_detections) int32, scores (B, max_detections),
      num_detections (B,) int32 — the custom op's 4 outputs.
    """
    if boxes.ndim != 3 or boxes.shape[-1] != 4:
        raise ValueError(f"boxes must be (B, A, 4), got {boxes.shape}")
    if scores.ndim != 3 or scores.shape[:2] != boxes.shape[:2]:
        raise ValueError(f"scores must be (B, A, C), got {scores.shape} "
                         f"for boxes {boxes.shape}")
    if anchors.shape != (boxes.shape[1], 4):
        raise ValueError(f"anchors must be (A, 4) = ({boxes.shape[1]}, 4), "
                         f"got {anchors.shape}")
    raw_boxes = _dequant(boxes, boxes_quant, "boxes")
    class_scores = _dequant(scores, scores_quant, "scores")
    anchors_f = _dequant(anchors, anchors_quant, "anchors")

    fn = functools.partial(
        _postprocess_one, anchors=anchors_f, scales=tuple(scales),
        max_detections=int(max_detections),
        iou_threshold=float(iou_threshold),
        score_threshold=float(score_threshold),
        use_regular_nms=bool(use_regular_nms),
        max_classes_per_detection=int(max_classes_per_detection))
    return jax.vmap(fn)(raw_boxes, class_scores)
