"""Detection-stack modules: SpMiddleResNetFHD middle encoder + RPN neck."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarseg3d_tpu.models import build_backbone, build_neck
from lidarseg3d_tpu.ops import sparse as sp


def test_spmiddle_resnet_fhd_bev_shape():
    rng = np.random.default_rng(0)
    B, Vc, shape, Cin = 2, 256, (17, 32, 32), 5  # (Z+1, Y, X)
    coords = np.full((B, Vc, 3), -1, np.int32)
    feats = np.zeros((B, Vc, Cin), np.float32)
    nums = np.zeros((B,), np.int32)
    for b in range(B):
        n = 200
        lin = np.sort(rng.choice(16 * 32 * 32, n, replace=False))
        z, rem = lin // (32 * 32), lin % (32 * 32)
        coords[b, :n] = np.stack([z, rem // 32, rem % 32], 1)
        feats[b, :n] = rng.standard_normal((n, Cin)).astype(np.float32)
        nums[b] = n
    st = sp.SparseTensor(
        structure=sp.build_structure(jnp.asarray(coords), jnp.asarray(nums),
                                     shape),
        features=jnp.asarray(feats),
    )
    m = build_backbone(dict(type="SpMiddleResNetFHD", num_input_features=5))
    variables = m.init(jax.random.PRNGKey(0), st, train=False)
    bev = m.apply(variables, st, train=False)
    # z: 17 -> 9 -> 5 -> 3 -> 2 ; y/x: 32 -> 16 -> 8 -> 4 (ceil halving)
    assert bev.shape == (B, 4, 4, 2 * 128)
    assert np.isfinite(np.asarray(bev)).all()


def test_rpn_neck_shapes():
    m = build_neck(dict(
        type="RPN", layer_nums=(2, 2), ds_layer_strides=(1, 2),
        ds_num_filters=(32, 64), us_layer_strides=(1, 2),
        us_num_filters=(64, 64), num_input_features=48,
    ))
    x = jnp.ones((2, 16, 16, 48))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 16, 16, 128)
    assert np.isfinite(np.asarray(y)).all()
