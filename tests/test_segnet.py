"""End-to-end SegNet smoke tests on tiny synthetic scans (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarseg3d_tpu.core.voxelize import (
    VoxelGenerator,
    encode_compact_value_labels,
)
from lidarseg3d_tpu.datasets.batching import collate_segnet
from lidarseg3d_tpu.models import build_detector


PCR = [-4.0, -4.0, -1.0, 4.0, 4.0, 1.0]
VSZ = [0.2, 0.2, 0.2]
NCLS = 6


def make_frame(rng, n=800):
    pts = np.stack(
        [
            rng.uniform(-4, 4, n),
            rng.uniform(-4, 4, n),
            rng.uniform(-1, 1, n),
            rng.uniform(0, 1, n),
        ],
        1,
    ).astype(np.float32)
    labels = rng.integers(0, NCLS, size=n).astype(np.int32)
    vg = VoxelGenerator(VSZ, PCR, max_num_points=5, max_voxels=2000)
    pts_lab = np.concatenate([pts, labels[:, None].astype(np.float32) + 1], 1)
    voxels, coords, npts = vg.generate(pts_lab)
    vlabels = encode_compact_value_labels(voxels[:, :, 4].astype(np.int64))
    return {
        "voxels": voxels[:, :, :4],
        "coordinates": coords,
        "num_points_per_voxel": npts,
        "points": pts,
        "voxel_sem_labels": vlabels.astype(np.int32),
        "point_sem_labels": labels,
    }, vg


def make_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    frames, vg = [], None
    for _ in range(B):
        fr, vg = make_frame(rng)
        frames.append(fr)
    batch = collate_segnet(frames, max_voxels=1200, max_points=900)
    gs = vg.grid_size  # xyz
    input_shape = (int(gs[2]) + 1, int(gs[1]), int(gs[0]))
    return batch, input_shape


def model_cfg():
    return dict(
        type="SegNet",
        reader=dict(
            type="TransformerVoxelFeatureExtractor",
            num_input_features=4,
            num_compressed_features=16,
            num_embed=32,
            num_head=4,
            num_layers=2,
        ),
        backbone=dict(
            type="UNetSCN3D",
            num_input_features=16,
            ds_factor=8,
            us_factor=8,
            point_cloud_range=PCR,
            voxel_size=VSZ,
            model_cfg=dict(SCALING_RATIO=1),
        ),
        point_head=dict(
            type="PointSegBatchlossHead",
            class_agnostic=False,
            num_class=NCLS,
            model_cfg=dict(
                CONV_IN_DIM=16,
                CONV_CLS_FC=[32],
                CONV_ALIGN_DIM=32,
                OUT_CLS_FC=[32, 32],
                IGNORED_LABEL=0,
            ),
        ),
    )


def to_device(batch, input_shape):
    ex = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in ("metadata",)
    }
    ex["input_shape"] = input_shape
    return ex


@pytest.fixture(scope="module")
def model_and_vars():
    batch, input_shape = make_batch()
    model = build_detector(model_cfg())
    ex = to_device(batch, input_shape)
    variables = model.init(
        jax.random.PRNGKey(0), ex, train=False,
    )
    return model, variables, ex


def test_forward_shapes_and_finiteness(model_and_vars):
    model, variables, ex = model_and_vars
    (ret, bat), _ = model.apply(
        variables, ex, train=True, mutable=["batch_stats"]
    )
    B, V = ex["coordinates"].shape[:2]
    N = ex["points"].shape[1]
    assert ret["conv_logits"].shape == (B, V, NCLS)
    assert ret["out_logits"].shape == (B, N, NCLS)
    nvox = np.asarray(ex["num_voxels"])
    cl = np.asarray(ret["conv_logits"])
    for b in range(B):
        assert np.isfinite(cl[b, : nvox[b]]).all()
    assert np.isfinite(np.asarray(ret["out_logits"])).all()


def test_loss_and_grads(model_and_vars):
    model, variables, ex = model_and_vars
    params = variables["params"]
    bstats = variables["batch_stats"]

    def loss_fn(p):
        (ret, bat), new_vars = model.apply(
            {"params": p, "batch_stats": bstats}, ex, train=True,
            mutable=["batch_stats"],
        )
        loss, ldict = model.loss(ret, bat)
        return loss, ldict

    (loss, ldict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("conv_ce_loss", "conv_lovasz_loss", "out_ce_loss", "out_lovasz_loss"):
        assert np.isfinite(float(ldict[k])), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_act_remat_matches(model_and_vars):
    """ACT_REMAT=True recomputes activations in backward without changing
    the param tree, the loss, or the gradients (torch.utils.checkpoint
    parity for the UNet residual stacks)."""
    model, variables, ex = model_and_vars
    cfg = model_cfg()
    cfg["backbone"]["model_cfg"]["ACT_REMAT"] = True
    model_r = build_detector(cfg)
    var_r = model_r.init(jax.random.PRNGKey(0), ex, train=False)
    paths = lambda v: set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(v)[0])
    assert paths(var_r) == paths(variables)

    def loss_of(m, v):
        def f(p):
            (ret, bat), _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, ex,
                train=True, mutable=["batch_stats"])
            return m.loss(ret, bat)[0]
        return jax.value_and_grad(f)(v["params"])

    l0, g0 = loss_of(model, variables)
    l1, g1 = loss_of(model_r, var_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_eval_predict(model_and_vars):
    model, variables, ex = model_and_vars
    ret, bat = model.apply(variables, ex, train=False)
    pred = model.predict(ret, bat)
    B, N = ex["points"].shape[:2]
    assert pred["pred_point_sem_labels"].shape == (B, N)
    labels = np.asarray(pred["pred_point_sem_labels"])
    assert (labels >= 0).all() and (labels < NCLS).all()


def test_tiny_token_attention_matches_standard():
    from lidarseg3d_tpu.models.readers.voxel_encoders import (
        tiny_token_attention,
    )
    rng = np.random.default_rng(0)
    N, P, E, H = 50, 5, 32, 4
    q, k, v = (jnp.asarray(rng.standard_normal((N, P, E)).astype(np.float32))
               for _ in range(3))
    got = np.asarray(tiny_token_attention(q, k, v, H))
    d = E // H
    qh = np.asarray(q).reshape(N, P, H, d)
    kh = np.asarray(k).reshape(N, P, H, d)
    vh = np.asarray(v).reshape(N, P, H, d)
    s = np.einsum("vphd,vqhd->vhpq", qh, kh) / np.sqrt(d)
    a = np.exp(s - s.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    want = np.einsum("vhpq,vqhd->vphd", a, vh).reshape(N, P, E)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)



def test_tiny_token_attention_custom_vjp_grads():
    """The N-minor manual backward (custom VJP, the B>=4 OOM fix) matches
    autodiff of the plain forward implementation."""
    from lidarseg3d_tpu.models.readers.voxel_encoders import (
        tiny_token_attention, _tta_fwd_impl,
    )
    rng = np.random.default_rng(1)
    N, P, E, H = 41, 5, 64, 4
    q, k, v, co = (
        jnp.asarray(rng.standard_normal((N, P, E)).astype(np.float32))
        for _ in range(4))
    g_ref = jax.grad(
        lambda q, k, v: (_tta_fwd_impl(q, k, v, H) * co).sum(),
        argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(
        lambda q, k, v: (tiny_token_attention(q, k, v, H) * co).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
