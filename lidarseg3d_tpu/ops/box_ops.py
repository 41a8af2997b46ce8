"""Rotated-box geometry ops for the detection-legacy stack.

TPU-native replacement for det3d/ops/iou3d_nms (CUDA rotated IoU + NMS,
SURVEY.md §2.4): vectorized polygon-clipping BEV IoU and a masked iterative
NMS under `lax` control flow, all static-shape.
"""

import jax
import jax.numpy as jnp


def box_to_corners_2d(boxes):
    """[N, 5] (cx, cy, dx, dy, yaw) -> [N, 4, 2] corners (ccw)."""
    cx, cy, dx, dy, yaw = (boxes[:, i] for i in range(5))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hx, hy = dx / 2, dy / 2
    local = jnp.stack([
        jnp.stack([hx, hy], -1), jnp.stack([-hx, hy], -1),
        jnp.stack([-hx, -hy], -1), jnp.stack([hx, -hy], -1),
    ], axis=1)  # [N, 4, 2]
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=1)
    pts = jnp.einsum("nij,nkj->nki", rot, local)
    return pts + jnp.stack([cx, cy], -1)[:, None, :]


def _polygon_clip(subject, clip_half_planes):
    """Sutherland-Hodgman with fixed vertex capacity.

    subject: [V, 2] with valid count tracked implicitly by repeating the
    last vertex; clip_half_planes: [4, 3] (a, b, c) for ax+by+c >= 0.
    Returns ([V2, 2] padded polygon, count).
    """
    MAXV = 8

    def clip_one(poly_cnt, hp):
        poly, cnt = poly_cnt
        a, b, c = hp

        def body(i, state):
            out, m = state
            cur = poly[i % MAXV]
            nxt = poly[(i + 1) % jnp.maximum(cnt, 1)]
            cur_in = a * cur[0] + b * cur[1] + c >= 0
            nxt_in = a * nxt[0] + b * nxt[1] + c >= 0
            valid_edge = i < cnt
            denom = a * (nxt[0] - cur[0]) + b * (nxt[1] - cur[1])
            t = -(a * cur[0] + b * cur[1] + c) / jnp.where(
                jnp.abs(denom) < 1e-12, 1e-12, denom
            )
            inter = cur + jnp.clip(t, 0.0, 1.0) * (nxt - cur)
            # emit cur if inside
            emit_cur = valid_edge & cur_in
            out = out.at[m % MAXV].set(jnp.where(emit_cur, cur, out[m % MAXV]))
            m = m + emit_cur.astype(jnp.int32)
            # emit intersection if crossing
            emit_int = valid_edge & (cur_in ^ nxt_in)
            out = out.at[m % MAXV].set(jnp.where(emit_int, inter, out[m % MAXV]))
            m = m + emit_int.astype(jnp.int32)
            return out, m

        out0 = jnp.zeros((MAXV, 2), poly.dtype)
        out, m = jax.lax.fori_loop(0, MAXV, body, (out0, jnp.int32(0)))
        return (out, jnp.minimum(m, MAXV)), None

    (poly, cnt), _ = jax.lax.scan(clip_one, (subject, jnp.int32(4)),
                                  clip_half_planes)
    return poly, cnt


def _poly_area(poly, cnt):
    MAXV = poly.shape[0]
    idx = jnp.arange(MAXV)
    nxt = (idx + 1) % jnp.maximum(cnt, 1)
    valid = idx < cnt
    x, y = poly[:, 0], poly[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    return jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0))) / 2.0


def _edges_to_half_planes(corners):
    """[4, 2] ccw corners -> [4, 3] inward half-planes."""
    nxt = jnp.roll(corners, -1, axis=0)
    d = nxt - corners
    a = -d[:, 1]
    b = d[:, 0]
    c = -(a * corners[:, 0] + b * corners[:, 1])
    return jnp.stack([a, b, c], axis=1)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated BEV IoU matrix [Na, Nb] for [N, 5] (cx, cy, dx, dy, yaw)."""
    ca = box_to_corners_2d(boxes_a)
    cb = box_to_corners_2d(boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]

    def pair(c1, c2):
        MAXV = 8
        subject = jnp.concatenate([c1, jnp.broadcast_to(c1[-1:], (MAXV - 4, 2))])
        poly, cnt = _polygon_clip(subject, _edges_to_half_planes(c2))
        return _poly_area(poly, cnt)

    inter = jax.vmap(lambda c1: jax.vmap(lambda c2: pair(c1, c2))(cb))(ca)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_bev(boxes, scores, iou_threshold=0.5, max_out=128):
    """Rotated NMS: returns (indices [max_out], valid mask [max_out]).

    Masked iterative argmax (cf. iou3d_nms_kernel.cu) — static shapes.
    """
    iou = boxes_iou_bev(boxes, boxes)

    def body(i, state):
        alive, picked, pmask = state
        score_masked = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(score_masked)
        ok = score_masked[j] > -jnp.inf
        picked = picked.at[i].set(jnp.where(ok, j, -1))
        pmask = pmask.at[i].set(ok)
        suppress = iou[j] > iou_threshold
        alive = alive & ~suppress & ~(jnp.arange(len(scores)) == j)
        alive = alive & ok  # once empty, stay empty
        return alive, picked, pmask

    n = boxes.shape[0]
    alive0 = jnp.ones((n,), bool)
    picked0 = jnp.full((max_out,), -1, jnp.int32)
    pmask0 = jnp.zeros((max_out,), bool)
    _, picked, pmask = jax.lax.fori_loop(
        0, min(max_out, n), body, (alive0, picked0, pmask0)
    )
    return picked, pmask


def circle_nms(centers, scores, min_radius, max_out=83):
    """CenterPoint circle NMS: suppress by SQUARED center distance
    <= min_radius (the reference compares dist^2 against the raw threshold,
    core/utils/circle_nms_jit.py:25-26 — semantics kept verbatim).

    centers: [N, 2]; returns (indices [max_out], valid [max_out])."""
    d2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)

    def body(i, state):
        alive, picked, pmask = state
        score_masked = jnp.where(alive, scores, -jnp.inf)
        j = jnp.argmax(score_masked)
        ok = score_masked[j] > -jnp.inf
        picked = picked.at[i].set(jnp.where(ok, j, -1))
        pmask = pmask.at[i].set(ok)
        suppress = d2[j] <= min_radius
        alive = alive & ~suppress & ~(jnp.arange(len(scores)) == j)
        alive = alive & ok
        return alive, picked, pmask

    n = centers.shape[0]
    state0 = (jnp.ones((n,), bool), jnp.full((max_out,), -1, jnp.int32),
              jnp.zeros((max_out,), bool))
    _, picked, pmask = jax.lax.fori_loop(0, min(max_out, n), body, state0)
    return picked, pmask


def boxes_iou_3d(boxes_a, boxes_b):
    """3D IoU matrix [Na, Nb] for [N, 7] (x, y, z, dx, dy, dz, yaw).

    Rotated BEV intersection area x z-overlap / volume union — the TPU
    equivalent of det3d.ops.iou3d_nms boxes_iou3d_gpu used by the RoI
    target assigner (roi_heads/target_assigner/proposal_target_layer.py).
    z convention: box center z, extent dz (overlap on [z - dz/2, z + dz/2]).
    """
    bev_a = boxes_a[:, [0, 1, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 1, 3, 4, 6]]
    ca = box_to_corners_2d(bev_a)
    cb = box_to_corners_2d(bev_b)

    def pair(c1, c2):
        MAXV = 8
        subject = jnp.concatenate([c1, jnp.broadcast_to(c1[-1:], (MAXV - 4, 2))])
        poly, cnt = _polygon_clip(subject, _edges_to_half_planes(c2))
        return _poly_area(poly, cnt)

    inter_bev = jax.vmap(lambda c1: jax.vmap(lambda c2: pair(c1, c2))(cb))(ca)
    za0 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za1 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb0 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb1 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.maximum(
        jnp.minimum(za1[:, None], zb1[None, :])
        - jnp.maximum(za0[:, None], zb0[None, :]), 0.0)
    inter = inter_bev * zo
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    union = vol_a[:, None] + vol_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def rotate_points_along_z(points, angle):
    """points [..., 3 or more], angle [...] (broadcast over the leading
    dims): rotate the xy plane by +angle around z (center_utils
    rotate_points_along_z semantics)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    return jnp.concatenate(
        [jnp.stack([x, y], -1), points[..., 2:]], axis=-1)
