"""Golden full-backbone parity: UNetSCN3D vs a torch DENSE-conv oracle.

VERDICT round-1 item 4: anchor the sparse UNet numerics end to end, not just
per-module. The oracle rebuilds the exact UNet dataflow
(/root/reference/det3d/models/backbones/scn_unet.py:73-249) with
torch.float64 dense ops on a tiny grid:

- submanifold conv  -> Conv3d(stride 1, pad k//2) masked to the site set
- strided conv      -> Conv3d(stride 2) onto the spconv UNION site set
                       (the repo runs with OUTPUT_SITES="union" here, so
                       site sets match spconv semantics exactly)
- inverse conv      -> ConvTranspose3d cropped to the target grid, masked
                       to the stored site set
- MaskedBatchNorm   -> per-channel biased stats over ACTIVE sites only
- UR decoder        -> concat + subm + channel-group-sum shortcut

Weights are copied from the initialized flax params, so any layout or
semantics drift in the sparse stack (rulebooks, rank tables, fused kernel,
BN masking, residuals) breaks this test.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import torch

from lidarseg3d_tpu.ops import sparse as sp
from lidarseg3d_tpu.models.backbones.unet_scn import UNetSCN3D

from tests.test_sparse_conv import make_random_sparse

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the default tier (VERDICT r4 item 3)


SHAPE = (16, 12, 12)  # deep enough that the stage-4 (pad 0) z-conv fits
# capacity must exceed every stage's UNION site count (stage-2 grid has 288
# cells) or truncation desyncs the site sets from the dense oracle
VCAP = 512
CIN = 6
R = 1
BN_EPS, BN_MOM = 1e-3, 0.01


def torch_w(k, cin, cout, params):
    """flax [K, Cin, Cout] -> torch Conv3d weight [Cout, Cin, kz, ky, kx]."""
    w = np.asarray(params["kernel"])
    kz, ky, kx = k
    return torch.tensor(
        w.reshape(kz, ky, kx, cin, cout).transpose(4, 3, 0, 1, 2),
        dtype=torch.float64,
    )


def t_subm(x, mask, w):
    pad = tuple(s // 2 for s in w.shape[2:])
    out = torch.nn.functional.conv3d(x, w, padding=pad)
    return out * mask


def _asym_conv(x, w, stride, pad, oshape):
    """Strided conv whose output covers the FULL ceil-division grid: torch
    omits far-edge outputs whose kernel overhangs the input, spconv keeps
    them, so pad the input asymmetrically on the right."""
    ks = w.shape[2:]
    pads = []
    for d in range(3):
        extra = ((oshape[d] - 1) * stride[d] + ks[d] - 1 - pad[d]
                 - (x.shape[2 + d] - 1))
        pads.append((pad[d], pad[d] + max(0, extra)))
    x = torch.nn.functional.pad(
        x, [pads[2][0], pads[2][1], pads[1][0], pads[1][1],
            pads[0][0], pads[0][1]])
    out = torch.nn.functional.conv3d(x, w, stride=stride)
    return out[..., : oshape[0], : oshape[1], : oshape[2]]


def t_strided(x, out_mask, w, stride, pad):
    return _asym_conv(x, w, stride, pad, out_mask.shape[2:]) * out_mask


def t_inverse(x_low, tgt_mask, w, stride, pad):
    """our inverse conv: out[t] = sum_k x[(t + p - k)/s] W[k] (exact div).

    conv_transpose3d with padding=p crops BOTH ends of the full transpose,
    losing far-edge targets that legitimately gather an in-range source —
    so run the full transpose (padding=0) and slice [p : p+tshape]."""
    wt = w.permute(1, 0, 2, 3, 4)  # [Cin, Cout, k]
    full = torch.nn.functional.conv_transpose3d(x_low, wt, stride=stride)
    tshape = tgt_mask.shape[2:]
    out = full[..., pad[0]: pad[0] + tshape[0],
               pad[1]: pad[1] + tshape[1],
               pad[2]: pad[2] + tshape[2]]
    padding = [0, tshape[2] - out.shape[-1], 0, tshape[1] - out.shape[-2],
               0, tshape[0] - out.shape[-3]]
    out = torch.nn.functional.pad(out, padding)
    return out * tgt_mask


def t_bn_relu(x, mask, scale, bias, relu=True):
    n = mask.sum()
    mean = (x * mask).sum(dim=(0, 2, 3, 4)) / n
    xc = (x - mean[None, :, None, None, None]) * mask
    var = (xc * xc).sum(dim=(0, 2, 3, 4)) / n
    inv = 1.0 / torch.sqrt(var + BN_EPS)
    s = torch.tensor(np.asarray(scale), dtype=torch.float64)
    b = torch.tensor(np.asarray(bias), dtype=torch.float64)
    out = xc * (inv * s)[None, :, None, None, None] + (
        b[None, :, None, None, None] * mask)
    if relu:
        out = torch.relu(out)
    return out * mask


def union_mask(mask, kernel, stride, pad):
    """spconv union output sites = occupancy conv > 0."""
    ones = torch.ones((1, 1) + tuple(kernel), dtype=torch.float64)
    oshape = tuple(-(-d // s) for d, s in zip(mask.shape[2:], stride))
    occ = _asym_conv(mask, ones, stride, pad, oshape)
    return (occ > 0).to(torch.float64)


def t_conv_bn_relu(x, out_mask, p, kind, stride=(2, 2, 2), pad=(1, 1, 1)):
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
    bnp = p["MaskedBatchNorm_0"]
    return t_bn_relu(out, out_mask, bnp["scale"], bnp["bias"])


def t_basic_block(x, mask, p):
    identity = x
    K = np.asarray(p["SubMConv3d_0"]["kernel"]).shape[0]
    cin = np.asarray(p["SubMConv3d_0"]["kernel"]).shape[1]
    cout = np.asarray(p["SubMConv3d_0"]["kernel"]).shape[2]
    w0 = torch_w((3, 3, 3), cin, cout, p["SubMConv3d_0"])
    f = t_subm(x, mask, w0)
    f = t_bn_relu(f, mask, p["MaskedBatchNorm_0"]["scale"],
                  p["MaskedBatchNorm_0"]["bias"])
    w1 = torch_w((3, 3, 3), cout, cout, p["SubMConv3d_1"])
    f = t_subm(f, mask, w1)
    f = t_bn_relu(f, mask, p["MaskedBatchNorm_1"]["scale"],
                  p["MaskedBatchNorm_1"]["bias"], relu=False)
    return torch.relu(f + identity) * mask


def gather_sites(dense, struct):
    """dense [1, C, Z, Y, X] -> [n, C] at the structure's active coords."""
    c = np.asarray(struct.coords)[0][: int(struct.num_voxels[0])]
    d = dense[0].permute(1, 2, 3, 0).numpy()
    return d[c[:, 0], c[:, 1], c[:, 2]]


def test_unet_matches_torch_dense_oracle():
    rng = np.random.default_rng(3)
    coords, feats, nums, dense_np = make_random_sparse(
        rng, 1, VCAP, SHAPE, CIN, density=0.08)
    struct = sp.build_structure(jnp.asarray(coords), jnp.asarray(nums), SHAPE)
    st = sp.SparseTensor(structure=struct, features=jnp.asarray(feats))

    model = UNetSCN3D(
        num_input_features=CIN, point_cloud_range=(0, 0, 0, 1, 1, 1),
        voxel_size=(0.1, 0.1, 0.1),
        model_cfg=dict(SCALING_RATIO=R, OUTPUT_SITES="union",
                       DOWN_CAPACITY_RATIOS=(1.0, 1.0, 1.0)),
    )
    prev = sp.PALLAS_MODE
    try:
        sp.set_pallas_mode("off")
        variables = model.init(jax.random.PRNGKey(7), st, train=False)
        out, _ = model.apply(variables, st, train=True,
                             mutable=["batch_stats"])
    finally:
        sp.set_pallas_mode(prev)
    P = jax.tree.map(np.asarray, variables["params"])

    # ---- torch float64 dense oracle ----
    x0 = torch.tensor(
        dense_np.transpose(0, 4, 1, 2, 3), dtype=torch.float64)
    m1 = torch.zeros((1, 1) + SHAPE, dtype=torch.float64)
    act = coords[0][: nums[0]]
    m1[0, 0, act[:, 0], act[:, 1], act[:, 2]] = 1.0

    m2 = union_mask(m1, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    m3 = union_mask(m2, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    m4 = union_mask(m3, (3, 3, 3), (2, 2, 2), (0, 1, 1))

    def cbr(i):
        return P[f"SparseConvBNReLU_{i}"]

    def enc_blk(stage, j):
        """Encoder blocks are nn.scan-stacked (SparseBasicBlockStack):
        select block j's slice of the stage's [2, ...] stacked params."""
        sub = P[f"SparseBasicBlockStack_{stage}"]["blocks"][
            "SparseBasicBlock_0"]
        return jax.tree.map(lambda a: np.asarray(a)[j], sub)

    x = t_conv_bn_relu(x0, m1, cbr(0), "subm")
    xc1 = t_basic_block(x, m1, enc_blk(0, 0))
    xc1 = t_basic_block(xc1, m1, enc_blk(0, 1))

    x = t_conv_bn_relu(xc1, m2, cbr(1), "spconv", (2, 2, 2), (1, 1, 1))
    xc2 = t_basic_block(x, m2, enc_blk(1, 0))
    xc2 = t_basic_block(xc2, m2, enc_blk(1, 1))

    x = t_conv_bn_relu(xc2, m3, cbr(2), "spconv", (2, 2, 2), (1, 1, 1))
    xc3 = t_basic_block(x, m3, enc_blk(2, 0))
    xc3 = t_basic_block(xc3, m3, enc_blk(2, 1))

    x = t_conv_bn_relu(xc3, m4, cbr(3), "spconv", (2, 2, 2), (0, 1, 1))
    xc4 = t_basic_block(x, m4, enc_blk(3, 0))
    xc4 = t_basic_block(xc4, m4, enc_blk(3, 1))

    def ur(x_lat, x_bot, mask, pblk, pmid, c_mid):
        xt = t_basic_block(x_lat, mask, pblk)
        cat = torch.cat([x_bot, xt], dim=1)
        xm = t_conv_bn_relu(cat, mask, pmid, "subm")
        red = cat.view(1, c_mid, cat.shape[1] // c_mid, *cat.shape[2:]).sum(2)
        return (xm + red) * mask

    # decoder lateral blocks stay unscanned: SparseBasicBlock_0..3
    f4 = ur(xc4, xc4, m4, P["SparseBasicBlock_0"], cbr(4), 64 * R)
    up4 = t_conv_bn_relu(f4, m3, cbr(5), "inverseconv", (2, 2, 2), (0, 1, 1))
    f3 = ur(xc3, up4, m3, P["SparseBasicBlock_1"], cbr(6), 64 * R)
    up3 = t_conv_bn_relu(f3, m2, cbr(7), "inverseconv", (2, 2, 2), (1, 1, 1))
    f2 = ur(xc2, up3, m2, P["SparseBasicBlock_2"], cbr(8), 32 * R)
    up2 = t_conv_bn_relu(f2, m1, cbr(9), "inverseconv", (2, 2, 2), (1, 1, 1))
    f1 = ur(xc1, up2, m1, P["SparseBasicBlock_3"], cbr(10), 16 * R)
    up1 = t_conv_bn_relu(f1, m1, cbr(11), "subm")

    # ---- compare every decoder stage at the stored site sets ----
    ms = out["multi_scale_3d_features"]
    for name, st_out, dense_ref in [
        ("x_conv4", ms["x_conv4"], xc4),
        ("x_up4", ms["x_conv3"], up4),
        ("x_up3", ms["x_conv2"], up3),
        ("x_up2", ms["x_conv1"], up2),
    ]:
        n = int(st_out.structure.num_voxels[0])
        got = np.asarray(st_out.features)[0, :n]
        want = gather_sites(dense_ref, st_out.structure)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=name)
    n = int(struct.num_voxels[0])
    got = np.asarray(out["conv_point_features"])[0, :n]
    want = gather_sites(up1, struct)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                               err_msg="conv_point_features (x_up1)")
