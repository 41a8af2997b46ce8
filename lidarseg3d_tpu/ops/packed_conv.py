"""Output-pixel-packed GEMM formulation of small-channel 3x3 convs.

Why: the MXU consumes 128x128 tiles; XLA's native conv lowering for HRNet's
thin branches (C_out=18/36, /root/reference/configs/*/MSeg3D/hrnet_cfg.py)
leaves >85% of the lane dim idle — measured 2.3 TFLOP/s on the stage-3
branch convs vs 49 TFLOP/s on the well-shaped C=64/256 stage-1 bottlenecks
(tools/bench/mb_hrnet_stages.py, v5e).

Fix: pack ``po`` consecutive output pixels (along W) into the matmul's N
dim. One GEMM computes a [po, C_out] block per row from the shared
3 x (po+2) x C_in input window:

    N = po * C_out   (po = 128 // C_out -> N ~ 128, full lanes)
    K = 3 * (po+2) * C_in

The packed weight matrix holds each output pixel's 3x3xC_in filter in its
own N-slice (structural zeros elsewhere, 3/(po+2) useful density), so the
formulation trades (po+2)/3 x more streamed MACs for ~8x better tile
occupancy. The math per output is EXACTLY the reference conv's dot
products (same padding, same taps; only fp reassociation differs).

Patch extraction is pure data movement (two strided slices + reshapes —
NOT conv_general_dilated_patches, whose identity-kernel conv costs more
FLOPs than the conv being replaced).

MEASURED RESULT (v5e, bf16, HRNet-w18 semnusc branch shapes, amortized
fori_loop harness, 2026-08): **falsified at the XLA level** — packed is
SLOWER than the native conv at every branch shape:

    6x160x240 C18->18 po=7: native 0.384 ms, packed 0.647 ms (0.59x)
    6x80x120  C36->36 po=3: native 0.128 ms, packed 0.222 ms (0.58x)
    6x20x30  C144->144 po=1 falls back to native by construction

Decomposition shows patch extraction alone costs 0.167 ms at the C18
shape, and the [33.6k, 486]x[486, 126] GEMM does not reach a throughput
that amortizes the 3x structural-zero stream. Kept as a documented
negative result + as the exact-math packing spec for a future Pallas
kernel that fuses extraction into the GEMM in VMEM (the remaining way
to beat XLA's channel-padded lowering for C_out <= 36).
"""

import jax
import jax.numpy as jnp
import numpy as np


def pick_po(c_out, c_in=None, max_po=8):
    """Output pixels per GEMM row: fill the 128-lane dim, capped so the
    structural-zero overhead (po+2)/3 stays profitable."""
    po = max(1, min(int(max_po), 128 // int(c_out)))
    return po


def pack_weights(w, po):
    """[3, 3, Cin, Cout] -> [3*(po+2)*Cin, po*Cout] packed weight matrix.

    K-order (dy, col, ci) matches _extract_patches' flatten order; the
    N-slice of output pixel p holds w at window columns p..p+2 (kw =
    col - p) and zeros elsewhere.
    """
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    cols = po + 2
    # T[p, dy, col, ci, co] = w[dy, col - p, ci, co] (0 <= col-p < 3)
    T = jnp.zeros((po, 3, cols, cin, cout), w.dtype)
    for p in range(po):
        T = T.at[p, :, p:p + 3].set(w)
    # -> [dy, col, ci, p, co] -> [K, N]
    T = T.transpose(1, 2, 3, 0, 4)
    return T.reshape(3 * cols * cin, po * cout)


def _extract_patches(x, po):
    """x: [B, H, W, C] (unpadded) -> [B, H, Wb, 3*(po+2)*C] windows.

    Window (b, h, wb) covers padded rows h..h+2 and padded cols
    po*wb .. po*wb+po+1 (same zero padding as a stride-1 3x3 conv).
    """
    B, H, W, C = x.shape
    Wb = -(-W // po)
    Wp = Wb * po
    # zero pad: 1 row top/bottom; 1 col left, (Wp - W) + 1 + po right (the
    # trailing +po lets the "next two columns" slice stay in bounds)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W + 1 + po), (0, 0)))
    # body: each block's first po columns; next2: the following 2 columns
    body = xp[:, :, :Wp].reshape(B, H + 2, Wb, po, C)
    nxt = xp[:, :, po:po + Wp].reshape(B, H + 2, Wb, po, C)[:, :, :, :2]
    win = jnp.concatenate([body, nxt], axis=3)  # [B, H+2, Wb, po+2, C]
    rows = [win[:, dy:dy + H] for dy in range(3)]
    pat = jnp.stack(rows, axis=3)  # [B, H, Wb, 3, po+2, C]
    return pat.reshape(B, H, Wb, 3 * (po + 2) * C)


def packed_conv3x3(x, w, po=None, out_dtype=None):
    """Stride-1 same-padding NHWC 3x3 conv via the packed GEMM.

    x: [B, H, W, Cin]; w: [3, 3, Cin, Cout]. Returns [B, H, W, Cout].
    Numerically the same conv (fp reassociation aside).
    """
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    if po is None:
        po = pick_po(cout, cin)
    if po <= 1:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Wb = -(-W // po)
    pat = _extract_patches(x, po)  # [B, H, Wb, K]
    wp = pack_weights(w.astype(x.dtype), po)  # [K, po*Cout]
    y = jnp.einsum(
        "bhwk,kn->bhwn", pat, wp,
        preferred_element_type=out_dtype or x.dtype)
    y = y.reshape(B, H, Wb * po, cout)[:, :, :W]
    return y.astype(x.dtype)
