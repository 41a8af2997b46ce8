#!/usr/bin/env python
"""Train a segmentor from a config file.

Usage: python tools/train.py CONFIG [--work_dir D] [--resume_from E]
       [--seed N] [--total_epochs N] [--batch_size N]

CLI surface mirrors /root/reference/tools/train.py (config path + work_dir +
resume + seed + --autoscale-lr). Multi-host: pass --dist_coordinator
host:port --dist_num_processes N --dist_process_id I on every host (or set
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); training is
SPMD over the global device set, checkpoints are process-0-guarded.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a segmentor")
    p.add_argument("config", help="config file path")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--resume_from", default=None, type=int, nargs="?", const=-1)
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--device", default=None, choices=["cpu", "tpu", "axon"])
    p.add_argument("--host_device_count", default=None, type=int)
    p.add_argument("--total_epochs", default=None, type=int)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--max_steps_per_epoch", default=None, type=int,
                   help="debug: truncate each epoch")
    p.add_argument("--validate", action="store_true",
                   help="run val mIoU after each epoch")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="scale lr_max by world device count / 8 "
                        "(reference tools/train.py --autoscale-lr)")
    p.add_argument("--tb_log_dir", default=None,
                   help="TensorBoard scalar log dir (default: off)")
    p.add_argument("--profile_dir", default=None,
                   help="jax.profiler trace dir (traces steps 10-14)")
    p.add_argument("--dist_coordinator", default=None,
                   help="host:port of process 0 (multi-host); also read "
                        "from JAX_COORDINATOR_ADDRESS")
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
    from lidarseg3d_tpu.apis.train import train_segmentor

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    logger = create_logger(
        log_file=os.path.join(work_dir, "train.log"),
        rank=jax.process_index(),
    )
    logger.info(f"devices: {jax.devices()}")
    logger.info(f"config: {args.config}")

    if args.seed is not None:
        np.random.seed(args.seed)

    model = build_detector(
        cfg.model.to_dict() if hasattr(cfg.model, "to_dict") else dict(cfg.model),
        train_cfg=cfg.get("train_cfg"), test_cfg=cfg.get("test_cfg"),
    )
    dataset = build_dataset(cfg.data["train"].to_dict())
    logger.info(f"dataset: {len(dataset)} frames")

    cap = cfg.get("capacity", {})
    batch_size = args.batch_size or cfg.data["samples_per_gpu"]
    loader = SegDataLoader(
        dataset,
        batch_size=batch_size,
        max_voxels=cap.get("max_voxels", 160000),
        max_points=cap.get("max_points", 140000),
        shuffle=True,
        seed=args.seed or 0,
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
        num_workers=cfg.data.get("workers_per_gpu", 4),
        worker_mode=cfg.data.get(
            "worker_mode", "shm" if (os.cpu_count() or 1) > 2 else "thread"),
        ignore_label=cfg.get("ignore_label", 0),
        # training must fail loudly on capacity overflow — silent row drops
        # change gradients (the reference's ragged concat never drops,
        # det3d/torchie/parallel/collate.py:95)
        on_overflow=cfg.get("on_overflow", "error"),
    )

    gs = np.asarray(cfg.voxel_generator["range"], np.float32)
    vs = np.asarray(cfg.voxel_generator["voxel_size"], np.float32)
    grid = np.round((gs[3:] - gs[:3]) / vs).astype(int)
    input_shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    total_epochs = args.total_epochs or cfg.total_epochs
    grad_clip = cfg.optimizer_config.get("grad_clip", {}).get("max_norm", 35.0)

    lr_cfg = dict(cfg.lr_config)
    if args.autoscale_lr:
        # reference scales lr by ngpus/8 (tools/train.py --autoscale-lr)
        scale = jax.device_count() / 8.0
        lr_cfg["lr_max"] = lr_cfg["lr_max"] * scale
        logger.info(f"autoscale-lr: lr_max *= {scale:.3f} "
                    f"({jax.device_count()} devices)")

    init_hook = None
    img_bb = cfg.model.get("img_backbone") or {}
    pretrained = img_bb.get("pretrained") if img_bb else None
    if pretrained:
        from lidarseg3d_tpu.apis.pretrain import load_hrnet_pretrained
        from lidarseg3d_tpu.apis.train import TrainState

        def init_hook(state):
            v = {"params": state.params, "batch_stats": state.batch_stats}
            v = load_hrnet_pretrained(v, pretrained, logger=logger)
            return TrainState(step=state.step, params=v["params"],
                              batch_stats=v["batch_stats"],
                              opt_state=state.opt_state)

    if args.max_steps_per_epoch:
        _orig_epoch = loader.epoch
        _orig_steps = loader.steps_per_epoch

        def _epoch(e):
            import itertools
            return itertools.islice(_orig_epoch(e), args.max_steps_per_epoch)

        loader.epoch = _epoch
        loader.steps_per_epoch = lambda: min(
            _orig_steps(), args.max_steps_per_epoch
        )

    val_fn = None
    if args.validate:
        from lidarseg3d_tpu.apis.eval import run_eval, evaluate_dataset

        val_dataset = build_dataset(cfg.data["val"].to_dict())
        val_loader = SegDataLoader(
            val_dataset, batch_size=batch_size,
            max_voxels=cap.get("max_voxels", 160000),
            max_points=cap.get("max_points", 140000),
            shuffle=False, num_hosts=jax.process_count(),
            host_id=jax.process_index(), num_workers=1, drop_last=False,
        )

        def val_fn(state, epoch):
            dets = run_eval(model, state, val_loader, input_shape,
                            val_dataset, logger, cfg.get("test_cfg"))
            evaluate_dataset(val_dataset, dets, logger=logger)

    train_segmentor(
        model=model,
        loader=loader,
        val_fn=val_fn,
        input_shape=input_shape,
        optimizer_cfg=dict(cfg.optimizer),
        lr_cfg=lr_cfg,
        total_epochs=total_epochs,
        work_dir=work_dir,
        logger=logger,
        grad_clip=grad_clip,
        log_interval=cfg.get("log_config", {}).get("interval", 5),
        resume_from=args.resume_from,
        seed=args.seed or 0,
        init_hook=init_hook,
        tb_log_dir=args.tb_log_dir,
        profile_dir=args.profile_dir,
    )


if __name__ == "__main__":
    main()
