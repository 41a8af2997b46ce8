#!/usr/bin/env python
"""Evaluate a trained segmentor: mIoU on val, submission files on test.

Mirrors /root/reference/tools/dist_test.py (incl. --speed_test latency
measurement and --testset submission writing).

Usage: python tools/test.py CONFIG --checkpoint WORK_DIR[/epoch_N]
       [--testset] [--speed_test] [--tta]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a segmentor")
    p.add_argument("config")
    p.add_argument("--checkpoint", required=True,
                   help="work_dir (uses latest.txt) or work_dir/epoch_N")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--testset", action="store_true")
    p.add_argument("--speed_test", action="store_true")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--host_device_count", default=None, type=int)
    p.add_argument("--dist_coordinator", default=None)
    p.add_argument("--dist_num_processes", default=None, type=int)
    p.add_argument("--dist_process_id", default=None, type=int)
    return p.parse_args()


def main():
    args = parse_args()

    from lidarseg3d_tpu.utils.platform import setup_jax
    setup_jax(args.device, host_device_count=args.host_device_count)
    from lidarseg3d_tpu.parallel.dist import init_distributed
    init_distributed(args.dist_coordinator, args.dist_num_processes,
                     args.dist_process_id)

    import jax
    from lidarseg3d_tpu.utils.config import Config
    from lidarseg3d_tpu.utils.log import create_logger
    from lidarseg3d_tpu.models import build_detector
    from lidarseg3d_tpu.datasets import build_dataset, SegDataLoader
    from lidarseg3d_tpu.apis.train import (
        TrainState, create_train_state, load_checkpoint, example_to_device,
    )
    from lidarseg3d_tpu.apis.eval import run_eval, evaluate_dataset
    from lidarseg3d_tpu.parallel import mesh as mesh_lib
    from lidarseg3d_tpu.datasets.batching import pad_batch_rows
    import jax.numpy as jnp

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", ".")
    logger = create_logger(rank=jax.process_index())

    split = "test" if args.testset else "val"
    ds_cfg = cfg.data[split].to_dict()
    if args.tta:
        tta_cfg = cfg.get("tta_cfg", dict(num_tta_tranforms=4))
        # insert SegCompoundAug before voxelization
        pipe = []
        for st in ds_cfg["pipeline"]:
            if st["type"] == "SegVoxelization":
                pipe.append(dict(type="SegCompoundAug", cfg=dict(tta_cfg)))
                st = dict(st)
                st["cfg"] = dict(st["cfg"])
                st["cfg"]["tta_flag"] = True
                st["cfg"].update(tta_cfg)
            pipe.append(st)
        ds_cfg["pipeline"] = pipe
    dataset = build_dataset(ds_cfg)
    logger.info(f"{split} dataset: {len(dataset)} frames")

    cap = cfg.get("capacity", {})
    loader = SegDataLoader(
        dataset, batch_size=args.batch_size,
        max_voxels=cap.get("max_voxels", 160000),
        max_points=cap.get("max_points", 140000),
        shuffle=False, num_hosts=jax.process_count(),
        host_id=jax.process_index(), num_workers=cfg.data.get("workers_per_gpu", 4),
        worker_mode=cfg.data.get(
            "worker_mode", "shm" if (os.cpu_count() or 1) > 2 else "thread"),
        drop_last=False,
    )

    model = build_detector(
        cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model),
        train_cfg=cfg.get("train_cfg"), test_cfg=cfg.get("test_cfg"),
    )

    rng_grid = np.asarray(cfg.voxel_generator["range"], np.float32)
    vs = np.asarray(cfg.voxel_generator["voxel_size"], np.float32)
    grid = np.round((rng_grid[3:] - rng_grid[:3]) / vs).astype(int)
    input_shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    # template state for checkpoint restore
    mesh = mesh_lib.make_mesh()
    batch0 = next(loader.epoch(0))
    ex0 = example_to_device(pad_batch_rows(batch0, mesh.devices.size), mesh)

    def _init(rng, arrs):
        e = dict(arrs)
        e["input_shape"] = input_shape
        return model.init(rng, e, train=False)

    if jax.default_backend() == "tpu":
        _init = jax.jit(_init)
    variables = _init(jax.random.PRNGKey(0), ex0)
    # weights-only template (no opt_state): partial restore
    template = {
        "step": jnp.zeros((), jnp.int32), "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    ckpt = args.checkpoint
    if os.path.basename(ckpt).startswith("epoch_"):
        wd, name = os.path.dirname(ckpt), os.path.basename(ckpt)
        restored, _ = load_checkpoint(
            wd, template, epoch=int(name.split("_")[1]), partial=True
        )
    else:
        restored, _ = load_checkpoint(ckpt, template, partial=True)
    state = TrainState(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"], opt_state=(),
    )
    logger.info("checkpoint loaded")

    test_cfg = dict(cfg.get("test_cfg", {}))
    if args.tta:
        test_cfg["tta_flag"] = True
        test_cfg.setdefault("num_tta_tranforms", 4)

    det_types = ("VoxelNet", "PointPillars", "TwoStageDetector")
    if cfg.model["type"] in det_types:
        # detection family: decode boxes, save the prediction pkl (input
        # for tools/*_tracking.py), and write the dataset's official
        # submission format
        from lidarseg3d_tpu.apis.det_eval import run_det_eval, save_detections

        dets = run_det_eval(model, state, loader, input_shape, logger,
                            test_cfg=test_cfg)
        os.makedirs(work_dir, exist_ok=True)
        pkl = save_detections(dets, os.path.join(work_dir,
                                                 "det_predictions.pkl"))
        logger.info(f"wrote {pkl} ({len(dets)} frames)")
        ds_type = ds_cfg["type"]
        if not args.testset and cfg.get("class_names"):
            # local (devkit-free) val metrics: Waymo-style BEV-IoU AP/APH
            # or nuScenes center-distance mAP (core/det_metrics.py)
            from lidarseg3d_tpu.core.det_metrics import (
                group_detections_by_class, nusc_map, waymo_ap,
            )

            gts = {}
            for info in getattr(dataset, "_infos", []):
                token = info.get("token")
                if token not in dets:
                    continue
                if "gt_boxes" in info:  # nusc infos carry gt directly
                    gts[token] = (np.asarray(info["gt_boxes"])[:, :7],
                                  info["gt_names"])
                elif "path" in info:  # waymo frame pkls
                    import pickle as _pkl
                    with open(info["path"], "rb") as f:
                        obj = _pkl.load(f)
                    anns = obj.get("annotations", {})
                    if "gt_boxes" in anns:
                        gts[token] = (np.asarray(anns["gt_boxes"])[:, :7],
                                      anns["gt_names"])
            if gts and len(gts) == len(dets):
                frames = group_detections_by_class(
                    dets, gts, list(cfg["class_names"]))
                res = (nusc_map(frames) if ds_type == "SemanticNuscDataset"
                       else waymo_ap(frames))
                for k, v in res.items():
                    logger.info(f"det metric {k}: {v}")
        if ds_type == "SemanticWaymoDataset":
            from lidarseg3d_tpu.datasets.waymo.det_submission import (
                write_detection_objects,
            )
            out = write_detection_objects(dets, work_dir)
            logger.info(f"wrote {out} (evaluate with the official "
                        "compute_detection_metrics_main)")
        elif ds_type == "SemanticNuscDataset":
            from lidarseg3d_tpu.datasets.nuscenes.det_submission import (
                detections_to_nusc_json,
            )
            infos = {i["token"]: i for i in dataset._infos}
            out = detections_to_nusc_json(
                dets, infos, os.path.join(work_dir, "nusc_det_results.json"))
            logger.info(f"wrote {out} (evaluate with "
                        "nuscenes.eval.detection.evaluate)")
        return

    dets = run_eval(model, state, loader, input_shape, dataset, logger,
                    test_cfg=test_cfg, speed_test=args.speed_test)
    evaluate_dataset(dataset, dets, output_dir=work_dir, testset=args.testset,
                     logger=logger)


if __name__ == "__main__":
    main()
