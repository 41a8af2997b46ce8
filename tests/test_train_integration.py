"""Integration: synthetic SemanticKITTI on disk -> dataset -> pipeline ->
loader -> jitted SPMD train step on the 8-device CPU mesh; plus eval/mIoU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full tier only (pytest -m "")

from lidarseg3d_tpu.datasets import build_dataset, SegDataLoader
from lidarseg3d_tpu.datasets.semantickitti import metadata as meta
from lidarseg3d_tpu.models import build_detector
from lidarseg3d_tpu.apis.train import (
    create_train_state, example_to_device, make_train_step, make_eval_step,
    save_checkpoint, load_checkpoint,
)
from lidarseg3d_tpu.apis.eval import run_eval, evaluate_dataset
from lidarseg3d_tpu.parallel import mesh as mesh_lib
from lidarseg3d_tpu.solver.optim import build_one_cycle_optimizer, one_cycle_lr_fn

PCR = [-6.0, -6.0, -2.0, 6.0, 6.0, 2.0]
VSZ = [0.3, 0.3, 0.4]


def write_fixture(root, seqs=("00", "08"), frames=3, n=1500, seed=0):
    rng = np.random.default_rng(seed)
    raw_ids = list(meta.LEARNING_MAP.keys())
    for seq in seqs:
        vd = os.path.join(root, seq, "velodyne")
        ld = os.path.join(root, seq, "labels")
        os.makedirs(vd, exist_ok=True)
        os.makedirs(ld, exist_ok=True)
        for f in range(frames):
            pts = np.stack(
                [rng.uniform(-6, 6, n), rng.uniform(-6, 6, n),
                 rng.uniform(-2, 2, n), rng.uniform(0, 1, n)], 1
            ).astype(np.float32)
            pts.tofile(os.path.join(vd, f"{f:06d}.bin"))
            sem = rng.choice(raw_ids, size=n).astype(np.uint32)
            inst = rng.integers(0, 5, size=n).astype(np.uint32)
            (sem | (inst << 16)).tofile(os.path.join(ld, f"{f:06d}.label"))


def dataset_cfg(root, train=True):
    prep = (
        dict(mode="train", shuffle_points=True, npoints=1400,
             global_rot_noise=[-0.78, 0.78], global_scale_noise=[0.95, 1.05],
             global_translate_std=0.5)
        if train
        else dict(mode="val", shuffle_points=False)
    )
    vg = dict(range=PCR, voxel_size=VSZ, max_points_in_voxel=5,
              max_voxel_num=[2000, 2000])
    pipeline = [
        dict(type="LoadPointCloudFromFile", dataset="SemanticKITTIDataset"),
    ]
    if train:
        pipeline.append(dict(type="LoadPointCloudAnnotations", with_bbox=False))
    pipeline += [
        dict(type="SegPreprocess", cfg=prep),
        dict(type="SegVoxelization", cfg=vg),
    ]
    if train:
        pipeline.append(
            dict(type="SegAssignLabel", cfg=dict(voxel_label_enc="compact_value"))
        )
    pipeline.append(dict(type="Reformat"))
    return dict(
        type="SemanticKITTIDataset", root_path=root,
        sequences=["00"] if train else ["08"], pipeline=pipeline,
        test_mode=not train,
    )


def tiny_model_cfg():
    return dict(
        type="SegNet",
        reader=dict(type="TransformerVoxelFeatureExtractor",
                    num_input_features=4, num_compressed_features=16,
                    num_embed=32, num_head=4, num_layers=1),
        backbone=dict(type="UNetSCN3D", num_input_features=16,
                      point_cloud_range=PCR, voxel_size=VSZ,
                      model_cfg=dict(SCALING_RATIO=1)),
        point_head=dict(type="PointSegBatchlossHead", class_agnostic=False,
                        num_class=meta.NUM_CLASSES,
                        model_cfg=dict(CONV_IN_DIM=16, CONV_CLS_FC=[32],
                                       CONV_ALIGN_DIM=32, OUT_CLS_FC=[32],
                                       IGNORED_LABEL=0)),
    )


def input_shape():
    grid = np.round(
        (np.asarray(PCR[3:]) - np.asarray(PCR[:3])) / np.asarray(VSZ)
    ).astype(int)
    return (int(grid[2]) + 1, int(grid[1]), int(grid[0]))


def test_dataset_and_loader(tmp_path):
    root = str(tmp_path / "sequences")
    write_fixture(root)
    ds = build_dataset(dataset_cfg(root, train=True))
    assert len(ds) == 3
    fr = ds[0]
    assert fr["points"].shape[1] == 4
    assert fr["voxels"].shape[1:] == (5, 4)
    assert (fr["voxel_sem_labels"] >= 0).all()
    assert fr["coordinates"].min() >= 0

    loader = SegDataLoader(ds, batch_size=2, max_voxels=2000, max_points=1400,
                           num_workers=1, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 2
    b = batches[0]
    assert b["voxels"].shape == (2, 2000, 5, 4)
    assert b["points"].shape == (2, 1400, 4)
    assert b["point_valid"].sum(1).min() > 0


def test_one_cycle_schedule_values():
    lr = one_cycle_lr_fn(1000, lr_max=0.001, div_factor=10.0, pct_start=0.4)
    assert abs(float(lr(0)) - 1e-4) < 1e-8
    assert abs(float(lr(400)) - 1e-3) < 1e-6
    assert float(lr(1000)) < 1.1e-8  # low_lr/1e4
    # monotone up then down
    ups = [float(lr(s)) for s in range(0, 400, 50)]
    assert all(b >= a for a, b in zip(ups, ups[1:]))


def test_train_step_on_mesh_and_checkpoint(tmp_path):
    root = str(tmp_path / "sequences")
    write_fixture(root)
    ds = build_dataset(dataset_cfg(root, train=True))
    # batch of 8 = one row per device on the 8-dev CPU mesh
    loader = SegDataLoader(ds, batch_size=8, max_voxels=1024, max_points=1400,
                           num_workers=1, drop_last=False)
    batch = next(loader.epoch(0))
    model = build_detector(tiny_model_cfg())
    tx, lr_fn = build_one_cycle_optimizer(
        dict(type="adam", wd=0.01, fixed_wd=True),
        dict(lr_max=1e-3, moms=[0.95, 0.85]), total_steps=10,
    )
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    ishape = input_shape()
    dev_batch = example_to_device(batch, mesh)
    ex0 = dict(dev_batch)
    ex0["input_shape"] = ishape
    state = create_train_state(model, ex0, jax.random.PRNGKey(0), tx)
    state = mesh_lib.replicate_tree(state, mesh)

    step_fn = jax.jit(make_train_step(model, tx, ishape))
    losses = []
    for _ in range(3):
        state, ldict = step_fn(state, dev_batch)
        losses.append(float(ldict["out_ce_loss"]))
    assert all(np.isfinite(losses))
    # overfitting a fixed batch must reduce the CE loss
    assert losses[-1] < losses[0]

    # checkpoint roundtrip
    wd = str(tmp_path / "work")
    save_checkpoint(wd, state, epoch=1)
    restored, ep = load_checkpoint(wd, state)
    assert ep == 1
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_miou_pipeline(tmp_path):
    root = str(tmp_path / "sequences")
    write_fixture(root)
    ds = build_dataset(dataset_cfg(root, train=False))
    loader = SegDataLoader(ds, batch_size=1, max_voxels=1024, max_points=1600,
                           shuffle=False, num_workers=1, drop_last=False)
    model = build_detector(tiny_model_cfg())
    batch = next(loader.epoch(0))
    mesh = mesh_lib.make_mesh()
    from lidarseg3d_tpu.datasets.batching import pad_batch_rows
    ex0 = dict(example_to_device(pad_batch_rows(batch, mesh.devices.size), mesh))
    ex0["input_shape"] = input_shape()
    variables = model.init(jax.random.PRNGKey(0), ex0, train=False)
    from lidarseg3d_tpu.apis.train import TrainState
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=())

    dets = run_eval(model, state, loader, input_shape(), ds)
    assert len(dets) == 3
    res = evaluate_dataset(ds, dets)
    assert "mIoU" in res["results"]
    assert 0.0 <= res["results"]["mIoU"] <= 100.0

    # perfect predictions give mIoU 100 on present classes
    perfect = {
        t: {"pred_point_sem_labels": ds.get_anno_for_eval(t)["point_sem_labels"]}
        for t in dets
    }
    res2 = evaluate_dataset(ds, perfect)
    assert res2["results"]["mIoU"] > 99.9


def test_one_cycle_momentum_schedule():
    """beta1 schedule matches the fastai OneCycle formulas
    (learning_schedules_fastai.py:77-97): cos 0.95->0.85 over pct_start,
    then cos 0.85->0.95."""
    from lidarseg3d_tpu.solver.optim import one_cycle_mom_fn, annealing_cos
    mom = one_cycle_mom_fn(1000, (0.95, 0.85), pct_start=0.4)
    assert abs(float(mom(0)) - 0.95) < 1e-6
    assert abs(float(mom(400)) - 0.85) < 1e-4
    assert abs(float(mom(1000)) - 0.95) < 1e-6
    # midpoint of phase 1
    want = float(annealing_cos(0.95, 0.85, jnp.float32(0.5)))
    assert abs(float(mom(200)) - want) < 1e-6


def test_loader_determinism(tmp_path):
    root = str(tmp_path / "sequences")
    write_fixture(root)
    ds = build_dataset(dataset_cfg(root, train=True))
    mk = lambda: SegDataLoader(ds, batch_size=2, max_voxels=1024,
                               max_points=1400, seed=7, num_workers=2,
                               drop_last=False)
    b1 = list(mk().epoch(3))
    b2 = list(mk().epoch(3))
    assert len(b1) == len(b2)
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["voxels"], b["voxels"])
    # different epoch -> different shuffle/augs
    b3 = list(mk().epoch(4))
    assert not np.array_equal(b1[0]["points"], b3[0]["points"])


def test_forward_with_empty_padded_sample(tmp_path):
    """Batch rows padded with empty samples (num_voxels=0) must produce
    finite outputs (eval pads batches to the device count)."""
    from lidarseg3d_tpu.datasets.batching import pad_batch_rows

    root = str(tmp_path / "sequences")
    write_fixture(root)
    ds = build_dataset(dataset_cfg(root, train=False))
    loader = SegDataLoader(ds, batch_size=1, max_voxels=1024, max_points=1600,
                           shuffle=False, num_workers=1, drop_last=False)
    batch = pad_batch_rows(next(loader.epoch(0)), 4)
    model = build_detector(tiny_model_cfg())
    ex = {k: jnp.asarray(v) for k, v in batch.items() if k != "metadata"}
    ex["input_shape"] = input_shape()
    variables = model.init(jax.random.PRNGKey(0), ex, train=False)
    ret, bat = model.apply(variables, ex, train=False)
    out = np.asarray(ret["out_logits"])
    assert np.isfinite(out).all()


def test_loader_shm_mode_matches_thread_mode(tmp_path):
    """Shared-memory ring workers produce byte-identical batches, in order,
    to the in-process thread path (determinism across worker modes)."""
    root = str(tmp_path)
    write_fixture(root, seqs=("00",), frames=5)
    cfg = dataset_cfg(root, train=True)
    ds = build_dataset(cfg)
    kw = dict(batch_size=1, max_voxels=2000, max_points=1400, shuffle=True,
              seed=3, drop_last=False)
    ref_loader = SegDataLoader(ds, num_workers=1, worker_mode="thread", **kw)
    shm_loader = SegDataLoader(ds, num_workers=2, worker_mode="shm", **kw)
    try:
        ref = list(ref_loader.epoch(0))
        got = list(shm_loader.epoch(0))
        assert len(ref) == len(got) == 5
        for rb, gb in zip(ref, got):
            assert set(rb.keys()) == set(gb.keys())
            for k in rb:
                if isinstance(rb[k], np.ndarray):
                    np.testing.assert_array_equal(rb[k], gb[k], err_msg=k)
    finally:
        shm_loader.shutdown()


def test_trainer_hooks(tmp_path):
    """TrainerHook events fire in order and StopTraining ends cleanly
    (the user extension point replacing the reference hook registry)."""
    from lidarseg3d_tpu.apis.train import TrainerHook, StopTraining

    root = str(tmp_path)
    write_fixture(root, seqs=("00",), frames=4)
    ds = build_dataset(dataset_cfg(root, train=True))
    # batch must divide the 8-device test mesh
    loader = SegDataLoader(ds, batch_size=8, max_voxels=2000, max_points=1400,
                           num_workers=1, drop_last=False, seed=0)
    events = []

    class Recorder(TrainerHook):
        def before_run(self, state, loop):
            events.append(("before_run", loop["total_epochs"]))

        def before_epoch(self, state, epoch):
            events.append(("before_epoch", epoch))

        def after_iter(self, state, ldict, global_step):
            events.append(("after_iter", global_step))

        def after_epoch(self, state, epoch):
            events.append(("after_epoch", epoch))
            raise StopTraining  # end after the first epoch

        def after_run(self, state):
            events.append(("after_run",))

    import logging
    from lidarseg3d_tpu.apis.train import train_segmentor

    model = build_detector(tiny_model_cfg())
    train_segmentor(
        model=model, loader=loader, input_shape=input_shape(),
        optimizer_cfg=dict(type="adam", wd=0.01, fixed_wd=True),
        lr_cfg=dict(lr_max=1e-3, moms=[0.95, 0.85]),
        total_epochs=3, work_dir=str(tmp_path / "wd"),
        logger=logging.getLogger("t"), hooks=[Recorder()],
    )
    kinds = [e[0] for e in events]
    assert kinds[0] == "before_run"
    assert kinds[1] == "before_epoch"
    assert "after_iter" in kinds
    assert ("after_epoch", 1) in events
    assert kinds[-1] == "after_run"
    # StopTraining after epoch 1 -> no second before_epoch
    assert kinds.count("after_epoch") == 1


def test_stop_training_from_after_iter_breaks_immediately(tmp_path):
    """StopTraining raised in after_iter ends the epoch's iteration loop
    right away (ADVICE r2: the loop previously ran out the epoch)."""
    from lidarseg3d_tpu.apis.train import (
        TrainerHook, StopTraining, train_segmentor,
    )
    import logging

    root = str(tmp_path)
    write_fixture(root, seqs=("00",), frames=4)
    ds = build_dataset(dataset_cfg(root, train=True))
    loader = SegDataLoader(ds, batch_size=8, max_voxels=2000, max_points=1400,
                           num_workers=1, drop_last=False, seed=0)
    iters = []

    class StopAtFirstIter(TrainerHook):
        def after_iter(self, state, ldict, global_step):
            iters.append(global_step)
            raise StopTraining

    model = build_detector(tiny_model_cfg())
    train_segmentor(
        model=model, loader=loader, input_shape=input_shape(),
        optimizer_cfg=dict(type="adam", wd=0.01, fixed_wd=True),
        lr_cfg=dict(lr_max=1e-3, moms=[0.95, 0.85]),
        total_epochs=3, work_dir=str(tmp_path / "wd"),
        logger=logging.getLogger("t"), hooks=[StopAtFirstIter()],
    )
    assert iters == [0]  # no second iteration ran anywhere


def test_group_aware_sampler():
    """flags: every batch from a single group; hosts get equal disjoint
    batch counts (reference DistributedGroupSampler, sampler.py:139)."""
    from lidarseg3d_tpu.datasets.loader import EpochSampler

    rng = np.random.default_rng(0)
    flags = rng.integers(0, 2, 37)
    samplers = [
        EpochSampler(37, batch_size=4, shuffle=True, seed=3, num_hosts=2,
                     host_id=h, flags=flags)
        for h in range(2)
    ]
    per_host = [s.epoch_indices(epoch=1) for s in samplers]
    for batches in per_host:
        for b in batches:
            assert len(set(flags[b])) == 1, "mixed-group batch"
    assert per_host[0].shape == per_host[1].shape
    assert samplers[0].steps_per_epoch() == len(per_host[0])
    # every sample appears somewhere (wrap-padding only duplicates)
    seen = set(np.concatenate([p.ravel() for p in per_host]).tolist())
    assert seen == set(range(37))
    # uniform flags -> behaves exactly like the plain sampler
    s_uni = EpochSampler(37, 4, shuffle=True, seed=3, flags=np.zeros(37))
    s_none = EpochSampler(37, 4, shuffle=True, seed=3)
    np.testing.assert_array_equal(s_uni.epoch_indices(0),
                                  s_none.epoch_indices(0))


def test_warm_cache_cli(tmp_path):
    """tools/warm_cache.py AOT-compiles train+eval for a config with no
    dataset and populates the persistent cache (compile-time mitigation;
    the reference's spconv JIT has no such wall, so warming is the
    operational equivalent)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = os.path.join(
        repo, "configs/semantickitti/MSeg3D",
        "semkitti_avgvfe_unetscn3d_lidarbaseline_lr1en2_e12.py")
    cache = str(tmp_path / "cache")
    os.makedirs(cache, exist_ok=True)
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/warm_cache.py"), cfg,
         "--device", "cpu", "--batch_size", "1", "--max_voxels", "2048",
         "--max_points", "2048", "--cache_dir", cache],
        capture_output=True, text=True, timeout=1500,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "train step compiled" in res.stdout
    assert "eval step compiled" in res.stdout
    assert len(os.listdir(cache)) > 0
