"""Cylinder3D family: dynamic VFE -> asymmetric sparse UNet -> point head."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarseg3d_tpu.models import build_detector

GRID = (24, 24, 8)  # (R, P, Z)
CYLR = [0.0, -np.pi, -4.0, 20.0, np.pi, 2.0]
NCLS = 6


def cfg():
    return dict(
        type="SegPolarNet",
        reader=dict(
            type="Cylinder3DDynamicVoxelFeatureExtractor",
            grid_size=GRID, point_cloud_range=CYLR, average_points=False,
            num_input_features=5, num_output_features=32, fea_compre=8,
            max_voxels=600, voxel_label_enc="major", num_class=NCLS,
        ),
        backbone=dict(
            type="Cylinder3D_Asymm_3d_spconv", output_shape=GRID,
            num_input_features=8, nclasses=NCLS, n_height=GRID[2],
            init_size=4,
        ),
        point_head=dict(
            type="PointSegPolarNetHead", class_agnostic=False, num_class=NCLS,
            model_cfg=dict(IGNORED_LABEL=0),
        ),
    )


def make_example(B=2, N=350, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-14, 14, (B, N)), rng.uniform(-14, 14, (B, N)),
        rng.uniform(-3.5, 1.5, (B, N)), rng.uniform(0, 1, (B, N)),
        rng.uniform(0, 1, (B, N)),
    ], -1).astype(np.float32)
    valid = np.ones((B, N), bool); valid[:, -40:] = False
    labels = rng.integers(0, NCLS, (B, N)).astype(np.int32)
    return {
        "points": jnp.asarray(pts),
        "point_valid": jnp.asarray(valid),
        "point_sem_labels": jnp.asarray(labels),
    }


def test_cylinder3d_forward_loss():
    model = build_detector(cfg())
    ex = make_example()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )

    def loss_fn(p):
        (ret, bat), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, ex,
            train=True, mutable=["batch_stats"],
        )
        return model.loss(ret, bat)

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)

    ret, bat = model.apply(variables, ex, train=False)
    pred = model.predict(ret, bat)
    assert pred["pred_point_sem_labels"].shape == ex["points"].shape[:2]


def test_cylinder3d_v2p_with_batchloss_head():
    c = cfg()
    c["backbone"]["type"] = "Cylinder3D_Asymm_3d_spconv_v2p"
    c["point_head"] = dict(
        type="PointSegBatchlossHead", class_agnostic=False, num_class=NCLS,
        model_cfg=dict(CONV_IN_DIM=4 * 8, CONV_CLS_FC=[16],
                       CONV_ALIGN_DIM=16, OUT_CLS_FC=[16], IGNORED_LABEL=0),
    )
    model = build_detector(c)
    ex = make_example(seed=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )

    def loss_fn(p):
        (ret, bat), _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, ex,
            train=True, mutable=["batch_stats"],
        )
        return model.loss(ret, bat)

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    g = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(grads))
    assert g > 0 and np.isfinite(g)
    ret, bat = model.apply(variables, ex, train=False)
    pred = model.predict(ret, bat)
    assert pred["pred_point_sem_labels"].shape == ex["points"].shape[:2]
