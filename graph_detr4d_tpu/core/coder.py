"""NMS-free box decoding, fully jittable.

Parity with NMSFreeCoder (core/bbox/coders/nms_free_coder.py:17-120):
sigmoid scores -> flat top-k over query x class -> gather codes ->
denormalize -> post-center-range (+ optional score) filter.

TPU-first: the filter is a validity mask over a fixed-size top-k output
(no dynamic shapes); callers drop invalid rows on the host if needed.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.boxes import denormalize_bbox


class Detections(NamedTuple):
    bboxes: jnp.ndarray  # (max_num, 9)
    scores: jnp.ndarray  # (max_num,)
    labels: jnp.ndarray  # (max_num,) int32
    valid: jnp.ndarray  # (max_num,) bool


def nms_free_decode(
    cls_scores: jnp.ndarray,  # (Q, num_classes) logits, final layer
    bbox_preds: jnp.ndarray,  # (Q, 10) codes
    *,
    max_num: int = 300,
    post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    score_threshold: float | None = None,
) -> Detections:
    Q, num_classes = cls_scores.shape
    scores = jax.nn.sigmoid(cls_scores.astype(jnp.float32)).reshape(-1)
    top_scores, idx = jax.lax.top_k(scores, max_num)
    labels = (idx % num_classes).astype(jnp.int32)
    bbox_idx = idx // num_classes
    codes = bbox_preds[bbox_idx]
    boxes = denormalize_bbox(codes)

    pcr = jnp.asarray(post_center_range, jnp.float32)
    valid = (boxes[..., :3] >= pcr[:3]).all(-1) & (
        boxes[..., :3] <= pcr[3:]
    ).all(-1)
    if score_threshold is not None:
        valid &= top_scores > score_threshold
    return Detections(boxes, top_scores, labels, valid)


def nms_free_cls_decode(
    cls_scores: jnp.ndarray,  # (Q, num_classes+1) logits incl. background
    bbox_preds: jnp.ndarray,  # (Q, 10) codes
    *,
    max_num: int = 300,
    post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    score_threshold: float | None = None,
) -> Detections:
    """Softmax variant (NMSFreeClsCoder, nms_free_coder.py:125-233):
    per-query softmax over classes incl. background, drop background,
    take the max class per query, then a flat top-k over queries."""
    probs = jax.nn.softmax(cls_scores.astype(jnp.float32), axis=-1)[..., :-1]
    per_q_score = probs.max(-1)
    per_q_label = probs.argmax(-1).astype(jnp.int32)
    top_scores, idx = jax.lax.top_k(per_q_score, max_num)
    labels = per_q_label[idx]
    boxes = denormalize_bbox(bbox_preds[idx])

    pcr = jnp.asarray(post_center_range, jnp.float32)
    valid = (boxes[..., :3] >= pcr[:3]).all(-1) & (
        boxes[..., :3] <= pcr[3:]
    ).all(-1)
    if score_threshold is not None:
        valid &= top_scores > score_threshold
    return Detections(boxes, top_scores, labels, valid)


def decode_batch(preds: dict, **kw):
    """Decode the final decoder layer for a whole batch via vmap."""
    cls_scores = preds["all_cls_scores"][-1]
    bbox_preds = preds["all_bbox_preds"][-1]
    return jax.vmap(lambda c, b: nms_free_decode(c, b, **kw))(
        cls_scores, bbox_preds
    )
