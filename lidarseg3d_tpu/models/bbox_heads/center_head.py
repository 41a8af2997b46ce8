"""CenterPoint detection head (CenterHead).

Re-implements the core of /root/reference/det3d/models/bbox_heads/
center_head.py:168 (single-frame, no DCN / two-stage): shared conv, per-task
separable heads (reg/height/dim/rot/hm), penalty-reduced focal loss on
gaussian heatmaps, masked L1 regression at ground-truth centers, and a
top-K + rotated-NMS decoder built on ops/box_ops.

Targets (heatmaps/ind/mask/cat/anno_box) are produced on the host by
``lidarseg3d_tpu.core.center_targets.assign_center_targets`` (the reference
builds them in the AssignLabel pipeline stage).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import box_ops
from ..layers import MaskedBatchNorm
from ..registry import HEADS


class SepHead(nn.Module):
    heads: dict  # name -> (out_channels, num_conv)
    head_conv: int = 64

    @nn.compact
    def __call__(self, x, train):
        out = {}
        for name, (c_out, num_conv) in dict(self.heads).items():
            y = x
            for _ in range(int(num_conv) - 1):
                y = nn.Conv(self.head_conv, (3, 3),
                            padding=((1, 1), (1, 1)))(y)
                y = MaskedBatchNorm()(y, train=train)
                y = jax.nn.relu(y)
            bias_init = (
                nn.initializers.constant(-2.19) if name == "hm"
                else nn.initializers.zeros
            )
            out[name] = nn.Conv(int(c_out), (3, 3), padding=((1, 1), (1, 1)),
                                bias_init=bias_init)(y)
        return out


def deform_conv2d(x, offset, weights, deformable_groups=4):
    """DCN v1 deformable conv (NHWC, stride 1, 3x3).

    TPU-native replacement for det3d/ops/dcn DeformConv: per-tap learned
    offsets, bilinear sampling gathered in one vectorized pass, MXU matmul
    accumulation over taps.

    x: [B, H, W, C]; offset: [B, H, W, G*K*2] ((dy, dx) per tap per group);
    weights: [K, C, Cout]. C must be divisible by deformable_groups.
    """
    B, H, W, C = x.shape
    K = weights.shape[0]
    k = int(round(K ** 0.5))
    G = deformable_groups
    Cg = C // G
    off = offset.reshape(B, H, W, G, K, 2)
    base = jnp.asarray(
        [(dy - k // 2, dx - k // 2) for dy in range(k) for dx in range(k)],
        x.dtype,
    )  # [K, 2]
    yy = jnp.arange(H, dtype=x.dtype)[None, :, None, None, None]
    xx = jnp.arange(W, dtype=x.dtype)[None, None, :, None, None]
    py = yy + base[None, None, None, None, :, 0] + off[..., 0]  # [B,H,W,G,K]
    px = xx + base[None, None, None, None, :, 1] + off[..., 1]

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    xg = x.reshape(B, H, W, G, Cg)

    def corner(yi, xi):
        # zero padding outside the map (torch DCN semantics)
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = yc * W + xc  # [B, H, W, G, K]
        outs = []
        for g in range(G):  # per-group gather keeps memory at HW*K*Cg
            flat_g = xg[..., g, :].reshape(B, H * W, Cg)
            idx_g = idx[..., g, :].reshape(B, -1)  # [B, HWK]
            got = jnp.take_along_axis(
                flat_g,
                jnp.broadcast_to(idx_g[..., None], (B, idx_g.shape[1], Cg)),
                axis=1,
            ).reshape(B, H, W, 1, K, Cg)
            outs.append(got)
        out = jnp.concatenate(outs, axis=3)  # [B, H, W, G, K, Cg]
        return out * inb[..., None].astype(x.dtype)

    s00 = corner(y0, x0)
    s01 = corner(y0, x0 + 1)
    s10 = corner(y0 + 1, x0)
    s11 = corner(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    sampled = (
        s00 * (1 - wy) * (1 - wx) + s01 * (1 - wy) * wx
        + s10 * wy * (1 - wx) + s11 * wy * wx
    )  # [B, H, W, G, K, Cg]
    sampled = jnp.moveaxis(sampled, 4, 3).reshape(B, H, W, K, C)
    return jnp.einsum("bhwkc,kco->bhwo", sampled, weights,
                      preferred_element_type=jnp.float32).astype(x.dtype)


class FeatureAdaption(nn.Module):
    """DCN v1 feature adaption (center_head.py:24-62): 1x1 offset conv
    (zero-initialized) -> deformable 3x3 -> relu."""

    out_channels: int
    kernel_size: int = 3
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x, train):
        K = self.kernel_size ** 2
        offset = nn.Conv(
            self.deformable_groups * K * 2, (1, 1),
            kernel_init=nn.initializers.zeros,
        )(x)
        w = self.param(
            "deform_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (K, x.shape[-1], self.out_channels),
        )
        y = deform_conv2d(x, offset, w, self.deformable_groups)
        return jax.nn.relu(y)


class DCNSepHead(nn.Module):
    """Separate DCN-adapted features for classification vs regression
    (center_head.py:112-178)."""

    heads: dict
    num_cls: int
    head_conv: int = 64

    @nn.compact
    def __call__(self, x, train):
        c = x.shape[-1]
        x_cls = FeatureAdaption(c)(x, train)
        x_reg = FeatureAdaption(c)(x, train)
        y = nn.Conv(self.head_conv, (3, 3), padding=((1, 1), (1, 1)))(x_cls)
        y = MaskedBatchNorm()(y, train=train)
        y = jax.nn.relu(y)
        hm = nn.Conv(self.num_cls, (3, 3), padding=((1, 1), (1, 1)),
                     bias_init=nn.initializers.constant(-2.19))(y)
        heads = {k: v for k, v in dict(self.heads).items() if k != "hm"}
        out = SepHead(heads, head_conv=self.head_conv)(x_reg, train)
        out["hm"] = hm
        return out


def fast_focal_loss(pred_hm, gt_hm, ind, mask, cat):
    """Penalty-reduced focal loss (CornerNet/CenterNet style).

    pred_hm: [B, H, W, C] sigmoided; gt_hm: same; ind: [B, M] flat positions;
    mask: [B, M]; cat: [B, M] class of each object."""
    eps = 1e-4
    pred_hm = jnp.clip(pred_hm, eps, 1 - eps)
    neg_weights = jnp.power(1 - gt_hm, 4)
    neg_loss = jnp.log(1 - pred_hm) * jnp.power(pred_hm, 2) * neg_weights
    # exclude exact-center positives from the negative term via gt==1 mask
    is_pos = (gt_hm >= 1.0 - 1e-6).astype(pred_hm.dtype)
    neg_loss = jnp.sum(neg_loss * (1 - is_pos))

    B, H, W, C = pred_hm.shape
    flat = pred_hm.reshape(B, H * W, C)
    picked = jnp.take_along_axis(
        flat, ind[..., None].astype(jnp.int32), axis=1
    )  # [B, M, C]
    pos = jnp.take_along_axis(
        picked, cat[..., None].astype(jnp.int32), axis=2
    )[..., 0]  # [B, M]
    mf = mask.astype(pred_hm.dtype)
    pos_loss = jnp.sum(jnp.log(pos) * jnp.power(1 - pos, 2) * mf)
    num_pos = jnp.maximum(jnp.sum(mf), 1.0)
    return -(pos_loss + neg_loss) / num_pos


def reg_loss(pred, target, ind, mask):
    """Masked L1 at object centers; pred [B, H, W, D], target [B, M, D]."""
    B, H, W, D = pred.shape
    flat = pred.reshape(B, H * W, D)
    picked = jnp.take_along_axis(
        flat, jnp.broadcast_to(ind[..., None], (B, ind.shape[1], D)).astype(
            jnp.int32), axis=1,
    )
    mf = mask[..., None].astype(pred.dtype)
    loss = jnp.abs(picked - target) * mf
    return jnp.sum(loss, axis=(0, 1)) / jnp.maximum(jnp.sum(mf), 1.0)


@HEADS.register_module
class CenterHead(nn.Module):
    in_channels: int = 512
    tasks: tuple = ()  # tuple of dict(num_class=, class_names=[...])
    weight: float = 0.25  # loc loss weight
    code_weights: tuple = (1.0,) * 8
    common_heads: dict = None  # e.g. {reg:(2,2), height:(1,2), ...}
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    dcn_head: bool = False  # DCN feature-adaption variant (center_head.py:219)
    dataset: str = "waymo"
    logger: object = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, C] BEV features -> list of per-task pred dicts."""
        y = nn.Conv(self.share_conv_channel, (3, 3),
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        y = MaskedBatchNorm()(y, train=train)
        y = jax.nn.relu(y)
        rets = []
        for task in self.tasks:
            heads = dict(self.common_heads or {
                "reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2),
            })
            if self.dcn_head:
                rets.append(DCNSepHead(heads, int(task["num_class"]))(
                    y, train))
            else:
                heads["hm"] = (int(task["num_class"]), self.num_hm_conv)
                rets.append(SepHead(heads)(y, train))
        return rets

    def get_loss(self, rets, targets):
        """targets: per-task dicts with hm [B,H,W,C], ind/mask/cat [B,M],
        anno_box [B,M,D] (assign_center_targets). With a 'vel' head the
        prediction order is reg/height/dim/vel/rot (center_head.py:261-263);
        a 10-dim velocity target against a vel-less head drops cols 6:8
        (reference's `remove vel target`, center_head.py:267)."""
        total = 0.0
        ldict = {}
        for ti, (ret, tgt) in enumerate(zip(rets, targets)):
            hm = jax.nn.sigmoid(ret["hm"])
            hm_loss = fast_focal_loss(hm, tgt["hm"], tgt["ind"], tgt["mask"],
                                      tgt["cat"])
            parts = [ret["reg"], ret["height"], ret["dim"]]
            if "vel" in ret:
                parts.append(ret["vel"])
            parts.append(ret["rot"])
            box_pred = jnp.concatenate(parts, axis=-1)
            target = tgt["anno_box"]
            if "vel" not in ret and target.shape[-1] == 10:
                target = target[..., [0, 1, 2, 3, 4, 5, 8, 9]]
            loc = reg_loss(box_pred, target, tgt["ind"], tgt["mask"])
            cw = jnp.asarray(self.code_weights[: loc.shape[0]])
            loc_loss = jnp.sum(loc * cw)
            total = total + hm_loss + self.weight * loc_loss
            ldict[f"task{ti}_hm_loss"] = hm_loss
            ldict[f"task{ti}_loc_loss"] = loc_loss
        return total, ldict

    @staticmethod
    def _double_flip_maps(ret):
        """Merge a group-of-4 double-flip batch back to one prediction.

        Rows are ordered (orig, yflip: y=-y, xflip: x=-x, xyflip) — the
        reference's DoubleFlip pipeline stage + test-time merge
        (/root/reference/det3d/datasets/pipelines/test_aug.py:8-32,
        models/bbox_heads/center_head.py:301-380). Maps are NHWC with H
        the BEV y axis: un-flip each variant's map, fix the
        sign/sub-cell-offset channels, and average in probability space
        (hm after sigmoid, dim after exp, rot as (sin, cos) components).

        Returns (hm, height, dim, reg, rots, rotc, vel) at batch B/4.
        """
        def grp(t):
            B = t.shape[0]
            assert B % 4 == 0, f"double_flip batch must be 4*frames, got {B}"
            return t.reshape(B // 4, 4, *t.shape[1:])

        def unflip(t):
            return (t[:, 0], jnp.flip(t[:, 1], 1), jnp.flip(t[:, 2], 2),
                    jnp.flip(t[:, 3], (1, 2)))

        hm = jnp.mean(jnp.stack(unflip(grp(jax.nn.sigmoid(ret["hm"]))), 1), 1)
        height = jnp.mean(
            jnp.stack(unflip(grp(ret["height"])), 1), 1)
        dim = jnp.mean(jnp.stack(unflip(grp(jnp.exp(ret["dim"]))), 1), 1)

        r0, r1, r2, r3 = unflip(grp(ret["reg"]))
        r1 = jnp.concatenate([r1[..., :1], 1.0 - r1[..., 1:2]], -1)
        r2 = jnp.concatenate([1.0 - r2[..., :1], r2[..., 1:2]], -1)
        r3 = 1.0 - r3
        reg = (r0 + r1 + r2 + r3) / 4.0

        s0, s1, s2, s3 = unflip(grp(ret["rot"][..., 0:1]))
        c0, c1, c2, c3 = unflip(grp(ret["rot"][..., 1:2]))
        rots = (s0 + s1 - s2 - s3) / 4.0
        rotc = (c0 - c1 + c2 - c3) / 4.0

        vel = None
        if "vel" in ret:
            v0, v1, v2, v3 = unflip(grp(ret["vel"]))
            flip_x = jnp.asarray([-1.0, 1.0])
            flip_y = jnp.asarray([1.0, -1.0])
            vel = (v0 + v1 * flip_y + v2 * flip_x - v3) / 4.0
        return hm, height, dim, reg, rots, rotc, vel

    @staticmethod
    def decode(rets, voxel_size, pc_range, out_factor=8, k=100,
               score_threshold=0.1, nms_iou=0.5, max_out=83,
               nms_type="rotated", min_radius=None, double_flip=False):
        """Per-task top-K decode + BEV NMS.

        nms_type: "rotated" (iou3d semantics) or "circle" (CenterPoint
        circle_nms, center-distance gate; reference center_head.py:473-476
        with per-task min_radius from test_cfg). With a 'vel' head, each
        task dict additionally carries velocity [B, max_out, 2]
        (center_head.py:403-417). double_flip: the batch holds groups of 4
        flip variants per frame; merge them first (test_aug.py TTA).

        Returns list of dicts(box3d [max_out, 7], scores, labels, valid
        [, velocity])."""
        outs = []
        for ti, ret in enumerate(rets):
            if double_flip:
                (hm, height_m, dim_m, reg_m, rots_m, rotc_m,
                 vel_m) = CenterHead._double_flip_maps(ret)
            else:
                hm = jax.nn.sigmoid(ret["hm"])
                height_m = ret["height"]
                dim_m = jnp.exp(ret["dim"])
                reg_m = ret["reg"]
                rots_m = ret["rot"][..., 0:1]
                rotc_m = ret["rot"][..., 1:2]
                vel_m = ret.get("vel")
            B, H, W, C = hm.shape
            flat = hm.reshape(B, H * W * C)
            scores, idx = jax.lax.top_k(flat, k)
            cls = idx % C
            pos = idx // C
            ys = (pos // W).astype(jnp.float32)
            xs = (pos % W).astype(jnp.float32)

            def pick(t):
                f = t.reshape(B, H * W, t.shape[-1])
                return jnp.take_along_axis(
                    f, jnp.broadcast_to(pos[..., None],
                                        (B, k, t.shape[-1])), axis=1)

            reg = pick(reg_m)
            height = pick(height_m)[..., 0]
            dim = pick(dim_m)
            rot_s = pick(rots_m)
            rot_c = pick(rotc_m)
            yaw = jnp.arctan2(rot_s[..., 0], rot_c[..., 0])
            x = (xs + reg[..., 0]) * out_factor * voxel_size[0] + pc_range[0]
            y = (ys + reg[..., 1]) * out_factor * voxel_size[1] + pc_range[1]
            boxes7 = jnp.stack(
                [x, y, height, dim[..., 0], dim[..., 1], dim[..., 2], yaw],
                axis=-1,
            )
            vel = pick(vel_m) if vel_m is not None else None

            radius = None
            if nms_type == "circle":
                radius = (min_radius[ti] if isinstance(
                    min_radius, (list, tuple)) else min_radius)

            def one(b7, sc):
                if nms_type == "circle":
                    sel, valid = box_ops.circle_nms(
                        b7[:, :2], sc, radius, max_out)
                else:
                    bev = jnp.stack(
                        [b7[:, 0], b7[:, 1], b7[:, 3], b7[:, 4], b7[:, 6]],
                        -1)
                    sel, valid = box_ops.nms_bev(bev, sc, nms_iou, max_out)
                sel_c = jnp.clip(sel, 0, k - 1)
                return (b7[sel_c], sc[sel_c],
                        valid & (sc[sel_c] > score_threshold), sel_c)

            b, s, v, sel = jax.vmap(one)(boxes7, scores)
            labels = jnp.take_along_axis(cls, sel, axis=1)
            out = {"box3d": b, "scores": s, "labels": labels, "valid": v}
            if vel is not None:
                out["velocity"] = jnp.take_along_axis(
                    vel, jnp.broadcast_to(sel[..., None], (B, max_out, 2)),
                    axis=1)
            outs.append(out)
        return outs
