"""Rotated IoU + NMS vs shapely-free numpy oracles."""

import numpy as np
import jax.numpy as jnp

from lidarseg3d_tpu.ops import box_ops as B


def test_axis_aligned_iou_matches_numpy():
    # yaw = 0 boxes reduce to axis-aligned IoU
    rng = np.random.default_rng(0)
    a = np.concatenate([rng.uniform(-5, 5, (8, 2)), rng.uniform(1, 4, (8, 2)),
                        np.zeros((8, 1))], 1).astype(np.float32)
    b = np.concatenate([rng.uniform(-5, 5, (6, 2)), rng.uniform(1, 4, (6, 2)),
                        np.zeros((6, 1))], 1).astype(np.float32)
    got = np.asarray(B.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))

    def aabb_iou(p, q):
        ax1, ay1 = p[0] - p[2] / 2, p[1] - p[3] / 2
        ax2, ay2 = p[0] + p[2] / 2, p[1] + p[3] / 2
        bx1, by1 = q[0] - q[2] / 2, q[1] - q[3] / 2
        bx2, by2 = q[0] + q[2] / 2, q[1] + q[3] / 2
        iw = max(0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        return inter / (p[2] * p[3] + q[2] * q[3] - inter)

    want = np.array([[aabb_iou(p, q) for q in b] for p in a])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotated_identical_boxes():
    box = np.array([[1.0, 2.0, 3.0, 1.5, 0.7]], np.float32)
    iou = float(B.boxes_iou_bev(jnp.asarray(box), jnp.asarray(box))[0, 0])
    assert abs(iou - 1.0) < 1e-4


def test_rotation_invariance():
    # IoU of two boxes is invariant under joint rotation
    rng = np.random.default_rng(1)
    a = np.array([[0.0, 0.0, 4.0, 2.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.5, 3.0, 2.0, 0.4]], np.float32)
    base = float(B.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
    for theta in (0.3, 1.1, 2.0):
        c, s = np.cos(theta), np.sin(theta)
        R = np.array([[c, -s], [s, c]])

        def rot(x):
            y = x.copy()
            y[0, :2] = R @ x[0, :2]
            y[0, 4] += theta
            return y

        got = float(B.boxes_iou_bev(jnp.asarray(rot(a)), jnp.asarray(rot(b)))[0, 0])
        assert abs(got - base) < 1e-3, (theta, got, base)


def test_nms_suppression():
    boxes = np.array([
        [0, 0, 2, 2, 0.0],
        [0.1, 0.1, 2, 2, 0.0],   # overlaps box 0
        [10, 10, 2, 2, 0.0],     # far away
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, mask = B.nms_bev(jnp.asarray(boxes), jnp.asarray(scores),
                          iou_threshold=0.5, max_out=3)
    idx, mask = np.asarray(idx), np.asarray(mask)
    kept = idx[mask]
    assert list(kept) == [0, 2]
