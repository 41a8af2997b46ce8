"""Golden cross-framework MSeg3D forward parity (round-2 VERDICT item 1a).

Two layers of evidence, both at reference-parity settings
(OUTPUT_SITES="union", OOV_COMPLETION="pseudo_camera"):

1. ``test_hrnet_matches_reference_golden``: our flax HRNet loaded through
   tools/convert_hrnet_checkpoint reproduces a RECORDED float64 forward of
   the REFERENCE torch HRNet module (tools/parity/record_golden_hrnet.py runs
   /root/reference/det3d/models/img_backbones/hrnet.py with mmcv stubbed;
   the npz stores the mmcv-layout state_dict, input, and outputs).

2. ``test_flagship_matches_float64_oracle``: the full SegMSeg3DNet
   forward (train=False) — camera branch from the same recorded HRNet
   weights, FCN head, ImprovedMeanVFE, union-site UNet, 3-NN devox,
   grid-sample fusion, mimic completion, GF-Phase, SF-Phase transformer —
   matches an independent float64 oracle (torch dense convs + numpy
   linear algebra) evaluated on the flax model's own weights. Reference
   dataflow: det3d/models/detectors/seg_mseg3d_net.py:47-147,
   point_seg_mseg3d_head.py:240-371, context_module.py:56-372,
   fcn_mseg3d_head.py:155-181, voxel_encoder.py:63-124.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full tier only (pytest -m "")
import torch

from lidarseg3d_tpu.models import build_detector, build_img_backbone
from lidarseg3d_tpu.ops import sparse as sp

from tests.test_golden_unet import (
    torch_w, t_subm, t_strided, t_inverse, union_mask, gather_sites,
)

DATA = os.path.join(os.path.dirname(__file__), "data")

# must match tools/parity/record_golden_hrnet.py
TINY_HRNET = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)

B, NCAM, IMH, IMW = 2, 2, 32, 64
NCLS = 8
PCR = [-4.0, -4.0, -1.0, 4.0, 4.0, 1.0]
VSZ = [0.5, 0.5, 0.25]  # 16x16 BEV, 8(+1) z: small enough for dense oracle
NPTS, VCAP = 260, 320


@pytest.fixture(scope="module")
def hrnet_npz():
    return np.load(os.path.join(DATA, "golden_hrnet_tiny.npz"))


def load_golden_hrnet_variables(npz):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_hrnet_checkpoint import convert

    sd = {k[3:]: np.asarray(npz[k], np.float32)
          for k in npz.files if k.startswith("sd/")}
    return convert(sd, TINY_HRNET)


def test_hrnet_matches_reference_golden(hrnet_npz):
    out = load_golden_hrnet_variables(hrnet_npz)
    model = build_img_backbone(dict(type="HRNet", extra=TINY_HRNET))
    x = jnp.asarray(
        hrnet_npz["input_nchw"].transpose(0, 2, 3, 1).astype(np.float32))
    ys = model.apply(
        {"params": out["params"], "batch_stats": out["batch_stats"]},
        x, train=False)
    for i, y in enumerate(ys):
        want = hrnet_npz[f"out{i}"].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(y), want, rtol=2e-4, atol=2e-4,
            err_msg=f"HRNet output scale {i}")


# ---------------------------------------------------------------------------
# full-flagship oracle
# ---------------------------------------------------------------------------


def model_cfg():
    return dict(
        type="SegMSeg3DNet",
        img_backbone=dict(type="HRNet", extra=TINY_HRNET, frozen_stages=-1),
        img_head=dict(
            type="FCNMSeg3DHead", in_channels=(4, 8, 16, 32),
            in_index=(0, 1, 2, 3), channels=12, num_convs=1,
            num_classes=NCLS, ignore_index=0, loss_weight=0.5,
            concat_input=False,
        ),
        reader=dict(type="ImprovedMeanVoxelFeatureExtractor",
                    num_input_features=4),
        backbone=dict(type="UNetSCN3D", num_input_features=12,
                      point_cloud_range=PCR, voxel_size=VSZ,
                      model_cfg=dict(SCALING_RATIO=1, OUTPUT_SITES="union",
                                     DOWN_CAPACITY_RATIOS=(1.0, 1.0, 1.0))),
        point_head=dict(
            type="PointSegMSeg3DHead", class_agnostic=False, num_class=NCLS,
            model_cfg=dict(
                VOXEL_IN_DIM=16, VOXEL_CLS_FC=[16], VOXEL_ALIGN_DIM=16,
                IMAGE_IN_DIM=12, IMAGE_ALIGN_DIM=16, GEO_FUSED_DIM=16,
                OUT_CLS_FC=[16, 16], IGNORED_LABEL=0, DP_RATIO=0.25,
                MIMIC_FC=[16, 16],
                OOV_COMPLETION="pseudo_camera",
                SFPhase_CFG=dict(embeddings_proj_kernel_size=1, d_model=16,
                                 n_head=4, n_layer=2, n_ffn=32, drop_ratio=0,
                                 activation="relu", pre_norm=False),
            ),
        ),
    )


def make_example(npz, seed=5):
    from lidarseg3d_tpu.core.voxelize import VoxelGenerator
    from lidarseg3d_tpu.datasets.batching import collate_segnet

    rng = np.random.default_rng(seed)
    vg = VoxelGenerator(VSZ, PCR, max_num_points=5, max_voxels=VCAP)
    frames = []
    for _ in range(B):
        pts = np.stack([rng.uniform(-3.9, 3.9, NPTS),
                        rng.uniform(-3.9, 3.9, NPTS),
                        rng.uniform(-0.9, 0.9, NPTS),
                        rng.uniform(0, 1, NPTS)], 1).astype(np.float32)
        voxels, coords, npts = vg.generate(pts)
        frames.append({
            "voxels": voxels, "coordinates": coords,
            "num_points_per_voxel": npts, "points": pts,
            "voxel_sem_labels": np.zeros(len(coords), np.int32),
            "point_sem_labels": np.zeros(NPTS, np.int32),
        })
    batch = collate_segnet(frames, max_voxels=VCAP, max_points=NPTS)
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}

    grid = np.round((np.asarray(PCR[3:]) - np.asarray(PCR[:3]))
                    / np.asarray(VSZ)).astype(int)
    ex["input_shape"] = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    # images fixed to the recorded HRNet input
    imgs = npz["input_nchw"].transpose(0, 2, 3, 1).astype(np.float32)
    ex["images"] = jnp.asarray(imgs.reshape(B, NCAM, IMH, IMW, 3))
    valid = (rng.random((B, NPTS)) < 0.6).astype(np.float32)
    cuv = np.stack([
        valid,
        rng.choice([-1.0, 1.0], (B, NPTS)),
        rng.uniform(-1, 1, (B, NPTS)),
        rng.uniform(-1, 1, (B, NPTS)),
    ], -1).astype(np.float32)
    ex["points_cuv"] = jnp.asarray(cuv)
    return ex


# ---- float64 oracle pieces ----


def o_linear(x, p, f64=np.float64):
    w = np.asarray(p["kernel"], f64)
    y = x @ w
    if "bias" in p:
        y = y + np.asarray(p["bias"], f64)
    return y


def o_bn_eval(x, p, s, eps=1e-5):
    mean = np.asarray(s["mean"], np.float64)
    var = np.asarray(s["var"], np.float64)
    return ((x - mean) / np.sqrt(var + eps)) * np.asarray(
        p["scale"], np.float64) + np.asarray(p["bias"], np.float64)


def o_mlp_head(x, pp, ss, fcs, eps=1e-5):
    """MLPHead: [Linear(no bias)+BN+ReLU]*len(fcs) + Linear(bias)."""
    for i in range(len(fcs)):
        x = o_linear(x, pp[f"TorchLinear_{i}"])
        x = o_bn_eval(x, pp[f"MaskedBatchNorm_{i}"],
                      ss[f"MaskedBatchNorm_{i}"], eps)
        x = np.maximum(x, 0.0)
    return o_linear(x, pp[f"TorchLinear_{len(fcs)}"])


def o_improved_mean_vfe(voxels, num_points):
    """voxel_encoder.py:63-124 descriptor in float64."""
    v = voxels.astype(np.float64)  # [B, V, P, 4]
    P = v.shape[2]
    nv = np.maximum(num_points, 1).astype(np.float64)[..., None]
    mean = v.sum(2) / nv
    pm = (v.sum(-1) != 0).astype(np.float64)  # [B, V, P]
    xyz = v[..., :3]
    big = (1.0 - pm)[..., None] * 1e5
    vmax = np.max(xyz - big, axis=2)
    vmin = np.min(xyz + big, axis=2)
    density = pm.sum(-1, keepdims=True) / P
    norm = np.linalg.norm((xyz - mean[..., None, :3]) * pm[..., None], axis=-1)
    std = (norm.sum(2) / nv[..., 0])[..., None]
    return np.concatenate(
        [mean[..., :3], vmax, vmin, mean[..., 3:], density, std], -1)


def t_bn_eval(x, p, s, eps=1e-3):
    """NCZYX/NCHW dense BN in eval mode (running stats)."""
    sh = (1, -1) + (1,) * (x.dim() - 2)
    mean = torch.tensor(np.asarray(s["mean"], np.float64)).view(sh)
    var = torch.tensor(np.asarray(s["var"], np.float64)).view(sh)
    scale = torch.tensor(np.asarray(p["scale"], np.float64)).view(sh)
    bias = torch.tensor(np.asarray(p["bias"], np.float64)).view(sh)
    return (x - mean) / torch.sqrt(var + eps) * scale + bias


def t_conv_bn_relu_eval(x, out_mask, p, s, kind, stride=(2, 2, 2),
                        pad=(1, 1, 1)):
    conv_key = next(k for k in p if "Conv3d" in k)
    pc = p[conv_key]
    kern = np.asarray(pc["kernel"])
    cin, cout = kern.shape[-2], kern.shape[-1]
    w = torch_w((3, 3, 3), cin, cout, pc)
    if kind == "subm":
        out = t_subm(x, out_mask, w)
    elif kind == "spconv":
        out = t_strided(x, out_mask, w, stride, pad)
    else:
        out = t_inverse(x, out_mask, w, stride, pad)
    out = t_bn_eval(out, p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"])
    return torch.relu(out) * out_mask


def t_basic_block_eval(x, mask, p, s):
    identity = x
    k = np.asarray(p["SubMConv3d_0"]["kernel"])
    w0 = torch_w((3, 3, 3), k.shape[1], k.shape[2], p["SubMConv3d_0"])
    f = t_subm(x, mask, w0)
    f = torch.relu(t_bn_eval(f, p["MaskedBatchNorm_0"],
                             s["MaskedBatchNorm_0"])) * mask
    k1 = np.asarray(p["SubMConv3d_1"]["kernel"])
    w1 = torch_w((3, 3, 3), k1.shape[1], k1.shape[2], p["SubMConv3d_1"])
    f = t_subm(f, mask, w1)
    f = t_bn_eval(f, p["MaskedBatchNorm_1"], s["MaskedBatchNorm_1"]) * mask
    return torch.relu(f + identity) * mask


def o_unet_eval(dense_np, act_mask, P, S, R=1):
    """UNetSCN3D forward (train=False) on a dense float64 grid; returns
    the x_up1 dense volume. P/S: params/batch_stats of backbone_mod."""
    x0 = torch.tensor(dense_np.transpose(0, 4, 1, 2, 3), dtype=torch.float64)
    m1 = act_mask
    m2 = union_mask(m1, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    m3 = union_mask(m2, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    m4 = union_mask(m3, (3, 3, 3), (2, 2, 2), (0, 1, 1))

    def cbr(i):
        return P[f"SparseConvBNReLU_{i}"], S[f"SparseConvBNReLU_{i}"]

    def blk(i):  # decoder lateral blocks (unscanned)
        return P[f"SparseBasicBlock_{i}"], S[f"SparseBasicBlock_{i}"]

    def enc_blk(stage, j):  # encoder pairs are nn.scan-stacked
        pick = lambda t: jax.tree.map(
            lambda a: np.asarray(a)[j],
            t[f"SparseBasicBlockStack_{stage}"]["blocks"][
                "SparseBasicBlock_0"])
        return pick(P), pick(S)

    x = t_conv_bn_relu_eval(x0, m1, *cbr(0), kind="subm")
    xc1 = t_basic_block_eval(x, m1, *enc_blk(0, 0))
    xc1 = t_basic_block_eval(xc1, m1, *enc_blk(0, 1))
    x = t_conv_bn_relu_eval(xc1, m2, *cbr(1), kind="spconv")
    xc2 = t_basic_block_eval(x, m2, *enc_blk(1, 0))
    xc2 = t_basic_block_eval(xc2, m2, *enc_blk(1, 1))
    x = t_conv_bn_relu_eval(xc2, m3, *cbr(2), kind="spconv")
    xc3 = t_basic_block_eval(x, m3, *enc_blk(2, 0))
    xc3 = t_basic_block_eval(xc3, m3, *enc_blk(2, 1))
    x = t_conv_bn_relu_eval(xc3, m4, *cbr(3), kind="spconv", pad=(0, 1, 1))
    xc4 = t_basic_block_eval(x, m4, *enc_blk(3, 0))
    xc4 = t_basic_block_eval(xc4, m4, *enc_blk(3, 1))

    def ur(x_lat, x_bot, mask, pblk, sblk, pmid, smid, c_mid):
        xt = t_basic_block_eval(x_lat, mask, pblk, sblk)
        cat = torch.cat([x_bot, xt], dim=1)
        xm = t_conv_bn_relu_eval(cat, mask, pmid, smid, kind="subm")
        red = cat.view(1, c_mid, cat.shape[1] // c_mid, *cat.shape[2:]).sum(2)
        return (xm + red) * mask

    f4 = ur(xc4, xc4, m4, *blk(0), *cbr(4), c_mid=64 * R)
    up4 = t_conv_bn_relu_eval(f4, m3, *cbr(5), kind="inverseconv",
                              pad=(0, 1, 1))
    f3 = ur(xc3, up4, m3, *blk(1), *cbr(6), c_mid=64 * R)
    up3 = t_conv_bn_relu_eval(f3, m2, *cbr(7), kind="inverseconv")
    f2 = ur(xc2, up3, m2, *blk(2), *cbr(8), c_mid=32 * R)
    up2 = t_conv_bn_relu_eval(f2, m1, *cbr(9), kind="inverseconv")
    f1 = ur(xc1, up2, m1, *blk(3), *cbr(10), c_mid=16 * R)
    return t_conv_bn_relu_eval(f1, m1, *cbr(11), kind="subm")


def o_fcn_head(hrnet_outs_nchw, P, S, channels=12):
    """FCNMSeg3DHead: resize-concat + 1 ConvBNReLU + conv_seg + SFAM."""
    tgt = torch.tensor(hrnet_outs_nchw[0], dtype=torch.float64)
    ups = [tgt]
    for o in hrnet_outs_nchw[1:]:
        t = torch.tensor(o, dtype=torch.float64)
        ups.append(torch.nn.functional.interpolate(
            t, size=tgt.shape[2:], mode="bilinear", align_corners=False))
    x = torch.cat(ups, dim=1)
    pc = P["ConvBNReLU_0"]
    w = np.asarray(pc["Conv_0"]["kernel"], np.float64)  # HWIO
    wt = torch.tensor(w.transpose(3, 2, 0, 1))
    f = torch.nn.functional.conv2d(x, wt, padding=1)
    f = torch.relu(t_bn_eval(f, pc["MaskedBatchNorm_0"],
                             S["ConvBNReLU_0"]["MaskedBatchNorm_0"],
                             eps=1e-5))
    pseg = P["Conv_0"]
    ws = torch.tensor(
        np.asarray(pseg["kernel"], np.float64).transpose(3, 2, 0, 1))
    bs = torch.tensor(np.asarray(pseg["bias"], np.float64))
    logits = torch.nn.functional.conv2d(f, ws, bs)
    # SFAM: softmax over ALL pixels of all cams per frame
    fe = f.permute(0, 2, 3, 1).numpy()  # [B*ncam, h, w, C]
    lg = logits.permute(0, 2, 3, 1).numpy()
    BN_, h, w_, C = fe.shape
    fb = fe.reshape(B, -1, C)
    pb = lg.reshape(B, -1, NCLS)
    pb = np.exp(pb - pb.max(1, keepdims=True))
    pb = pb / pb.sum(1, keepdims=True)
    emb = np.einsum("bpc,bpe->bce", pb, fb)
    return fe, lg, emb


def o_grid27_interpolate(pts, pvalid, coords, nvox, feats, vsz, pcr):
    """grid-27 3-NN inverse-distance interpolation (numpy float64)."""
    Bv, V, C = feats.shape
    out = np.zeros((Bv, pts.shape[1], C))
    vs = np.asarray(vsz, np.float64)
    org = np.asarray(pcr[:3], np.float64)
    for b in range(Bv):
        n = int(nvox[b])
        lut = {tuple(c): i for i, c in enumerate(coords[b][:n])}
        centers = (coords[b][:n].astype(np.float64)[:, ::-1] + 0.5) * vs + org
        for i in range(pts.shape[1]):
            if not pvalid[b, i]:
                continue
            p = pts[b, i].astype(np.float64)
            cz = np.floor((p - org) / vs).astype(int)[::-1]
            cand = []
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        j = lut.get((cz[0] + dz, cz[1] + dy, cz[2] + dx))
                        if j is not None:
                            d2 = np.sum((p - centers[j]) ** 2)
                            cand.append((d2, j))
            cand.sort(key=lambda t: t[0])
            cand = cand[:3]
            if not cand:
                continue
            rec = np.array([1.0 / (d + 1e-8) for d, _ in cand])
            wgt = rec / rec.sum()
            for w, (_, j) in zip(wgt, cand):
                out[b, i] += w * feats[b, j]
    return out


def o_grid_sample(f5, cuv):
    """bilinear align_corners=True sampling, [B, ncam, H, W, C] float64."""
    Bv, ncam, H, W, C = f5.shape
    N = cuv.shape[1]
    out = np.zeros((Bv, N, C))
    for b in range(Bv):
        for i in range(N):
            if cuv[b, i, 0] <= 0.5:
                continue
            cam = int(round((cuv[b, i, 1] + 1) * 0.5 * (ncam - 1))) \
                if ncam > 1 else 0
            v = (cuv[b, i, 2] + 1) * 0.5 * (H - 1)
            u = (cuv[b, i, 3] + 1) * 0.5 * (W - 1)
            v0 = int(np.clip(np.floor(v), 0, H - 1))
            u0 = int(np.clip(np.floor(u), 0, W - 1))
            v1 = min(v0 + 1, H - 1)
            u1 = min(u0 + 1, W - 1)
            wv, wu = v - v0, u - u0
            out[b, i] = (
                f5[b, cam, v0, u0] * (1 - wv) * (1 - wu)
                + f5[b, cam, v0, u1] * (1 - wv) * wu
                + f5[b, cam, v1, u0] * wv * (1 - wu)
                + f5[b, cam, v1, u1] * wv * wu
            )
    return out


def o_layernorm(x, p, eps=1e-5):  # torch nn.LayerNorm default
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(
        p["scale"], np.float64) + np.asarray(p["bias"], np.float64)


def o_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def o_mhdpa(x, p, n_head):
    """flax MultiHeadDotProductAttention self-attention (float64)."""
    E = x.shape[-1]
    dh = E // n_head
    def proj(name):
        w = np.asarray(p[name]["kernel"], np.float64)  # [E, H, dh]
        b = np.asarray(p[name]["bias"], np.float64)  # [H, dh]
        return np.einsum("bme,ehd->bmhd", x, w) + b
    q, k, v = proj("query"), proj("key"), proj("value")
    att = o_softmax(
        np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(dh), axis=-1)
    o = np.einsum("bhnm,bmhd->bnhd", att, v)
    wo = np.asarray(p["out"]["kernel"], np.float64)  # [H, dh, E]
    return np.einsum("bnhd,hde->bne", o, wo) + np.asarray(
        p["out"]["bias"], np.float64)


def o_cross_attention(q_in, mem, p, n_head):
    """BatchedPointCrossAttention (4 TorchLinears)."""
    E = q_in.shape[-1]
    dh = E // n_head
    q = o_linear(q_in, p["TorchLinear_0"])
    k = o_linear(mem, p["TorchLinear_1"])
    v = o_linear(mem, p["TorchLinear_2"])
    q = q.reshape(*q.shape[:2], n_head, dh)
    k = k.reshape(*k.shape[:2], n_head, dh)
    v = v.reshape(*v.shape[:2], n_head, dh)
    att = o_softmax(
        np.einsum("bnhd,bmhd->bhnm", q, k) * dh ** -0.5, axis=-1)
    o = np.einsum("bhnm,bmhd->bnhd", att, v).reshape(*q_in.shape[:2], E)
    return o_linear(o, p["TorchLinear_3"])


def o_sffm(geo, emb_cam, emb_lidar, P, n_layer=2, n_head=4):
    tgt = o_linear(geo, P["TorchLinear_0"])
    e1 = o_linear(emb_cam, P["TorchLinear_1"])
    e2 = o_linear(emb_lidar, P["TorchLinear_2"])
    mem = np.concatenate([e1, e2], axis=1)
    stacked = P["SFFMDecoderLayer_0"]  # nn.scan: leading n_layer axis
    for li in range(n_layer):
        L = jax.tree.map(lambda a: np.asarray(a)[li], stacked)
        m2 = o_mhdpa(mem, L["MultiHeadDotProductAttention_0"], n_head)
        mem = o_layernorm(mem + m2, L["LayerNorm_0"])
        t2 = o_cross_attention(tgt, mem, L["BatchedPointCrossAttention_0"],
                               n_head)
        tgt = o_layernorm(tgt + t2, L["LayerNorm_1"])
        # flax autonames by CONSTRUCTOR order: the outer (down-proj) Linear
        # is TorchLinear_0, the inner (up-proj) is TorchLinear_1
        t2 = o_linear(np.maximum(o_linear(tgt, L["TorchLinear_1"]), 0.0),
                      L["TorchLinear_0"])
        tgt = o_layernorm(tgt + t2, L["LayerNorm_2"])
    return o_layernorm(tgt, P["LayerNorm_0"])


def test_flagship_matches_float64_oracle(hrnet_npz):
    ex = make_example(hrnet_npz)
    model = build_detector(model_cfg())

    prev = sp.PALLAS_MODE
    try:
        sp.set_pallas_mode("off")
        variables = model.init(jax.random.PRNGKey(11), ex, train=False)
        # graft the recorded HRNet weights into the flagship
        hv = load_golden_hrnet_variables(hrnet_npz)
        params = jax.device_get(variables["params"])
        bstats = jax.device_get(variables["batch_stats"])
        params = jax.tree.map(np.asarray, params)
        params = dict(params)
        params["img_backbone_mod"] = hv["params"]
        bstats = dict(bstats)
        bstats["img_backbone_mod"] = hv["batch_stats"]
        variables = {"params": params, "batch_stats": bstats}
        ret, bat = model.apply(variables, ex, train=False)
    finally:
        sp.set_pallas_mode(prev)

    P = jax.tree.map(np.asarray, params)
    S = jax.tree.map(np.asarray, bstats)

    # ---- oracle camera branch ----
    hr_outs = [hrnet_npz[f"out{i}"] for i in range(4)]
    img_feats, img_logits, cam_emb = o_fcn_head(
        hr_outs, P["img_head_mod"], S["img_head_mod"])
    np.testing.assert_allclose(
        np.asarray(ret["image_logits"]), img_logits, rtol=2e-4, atol=2e-4,
        err_msg="image_logits")

    # ---- oracle lidar branch ----
    vox = np.asarray(ex["voxels"])
    npv = np.asarray(ex["num_points"])
    coords = np.asarray(ex["coordinates"])
    nvox = np.asarray(ex["num_voxels"])
    vfe = o_improved_mean_vfe(vox, npv)
    np.testing.assert_allclose(
        np.asarray(bat["conv_point_features"]).shape[-1], 16)

    Z, Y, X = ex["input_shape"]
    up1_sites = []
    for b in range(B):
        dense = np.zeros((1, Z, Y, X, 12))
        n = int(nvox[b])
        act = coords[b][:n]
        dense[0, act[:, 0], act[:, 1], act[:, 2]] = vfe[b, :n]
        m1 = torch.zeros((1, 1, Z, Y, X), dtype=torch.float64)
        m1[0, 0, act[:, 0], act[:, 1], act[:, 2]] = 1.0
        up1 = o_unet_eval(dense, m1, P["backbone_mod"], S["backbone_mod"])
        d = up1[0].permute(1, 2, 3, 0).numpy()
        up1_sites.append(d[act[:, 0], act[:, 1], act[:, 2]])

    # flax voxel features at active sites
    for b in range(B):
        n = int(nvox[b])
        got = np.asarray(bat["conv_point_features"])[b, :n]
        np.testing.assert_allclose(got, up1_sites[b], rtol=3e-4, atol=3e-4,
                                   err_msg=f"conv_point_features b={b}")

    # ---- oracle fusion head ----
    Ph = P["point_head_mod"]
    Sh = S["point_head_mod"]
    feats = np.zeros((B, VCAP, 16))
    for b in range(B):
        n = int(nvox[b])
        feats[b, :n] = up1_sites[b]
    vmask = np.arange(VCAP)[None, :] < nvox[:, None]

    voxel_logits = o_mlp_head(
        feats, Ph["MLPHead_0"], Sh["MLPHead_0"], fcs=[16])
    # zero padded rows' logits like the flax masked path would for valid use
    pts = np.asarray(ex["points"])[..., :3]
    pvalid = np.asarray(ex["point_valid"])
    p_lidar0 = o_grid27_interpolate(
        pts, pvalid, coords, nvox, feats, VSZ, PCR)
    p_lidar = o_linear(p_lidar0, Ph["TorchLinear_0"])
    p_lidar = o_bn_eval(p_lidar, Ph["MaskedBatchNorm_0"],
                        Sh["MaskedBatchNorm_0"], eps=1e-6)
    p_lidar = np.maximum(p_lidar, 0.0)

    cuv = np.asarray(ex["points_cuv"])
    in_view = (cuv[..., 0] > 0.5) & pvalid
    f5 = img_feats.reshape(B, NCAM, *img_feats.shape[1:])
    p_cam0 = o_grid_sample(f5.astype(np.float64), cuv)
    p_cam = o_linear(p_cam0, Ph["TorchLinear_1"])
    p_cam = o_bn_eval(p_cam, Ph["MaskedBatchNorm_1"],
                      Sh["MaskedBatchNorm_1"], eps=1e-6)
    p_cam = np.maximum(p_cam, 0.0)

    p_pcam = o_mlp_head(p_lidar, Ph["MLPHead_1"], Sh["MLPHead_1"],
                        fcs=[16, 16])
    p_ccam = np.where(in_view[..., None], p_cam, p_pcam)
    p_ccam = p_ccam * pvalid[..., None]

    geo = o_linear(np.concatenate([p_lidar, p_ccam], -1),
                   Ph["TorchLinear_2"])
    geo = o_bn_eval(geo, Ph["MaskedBatchNorm_2"], Sh["MaskedBatchNorm_2"],
                    eps=1e-5)
    geo = np.maximum(geo, 0.0)

    # lidar semantic embeddings over valid voxels
    masked = np.where(vmask[..., None], voxel_logits, -np.inf)
    probs = o_softmax(masked, axis=1)
    lidar_emb = np.einsum("bvc,bve->bce", probs, feats)

    fused = o_sffm(geo, cam_emb, lidar_emb,
                   Ph["SemanticFeatureFusionModule_0"])
    out_logits = o_linear(fused, Ph["TorchLinear_3"])

    got = np.asarray(ret["out_logits"])
    # compare on valid points only (padded rows carry garbage by design)
    np.testing.assert_allclose(
        np.where(pvalid[..., None], got, 0.0),
        np.where(pvalid[..., None], out_logits, 0.0),
        rtol=5e-4, atol=5e-4, err_msg="out_logits")

    vgot = np.asarray(ret["voxel_logits"])
    np.testing.assert_allclose(
        np.where(vmask[..., None], vgot, 0.0),
        np.where(vmask[..., None], voxel_logits, 0.0),
        rtol=3e-4, atol=3e-4, err_msg="voxel_logits")
