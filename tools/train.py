#!/usr/bin/env python
"""Train a segmentor from a config file.

Usage: python tools/train.py CONFIG [--work_dir D] [--resume_from E]
       [--seed N] [--total_epochs N] [--batch_size N]

CLI surface mirrors /root/reference/tools/train.py (config path + work_dir +
resume + seed); distributed init is implicit via JAX (jax.distributed on
multihost).
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
    return p.parse_args()


def main():
    args = parse_args()

    from lidarseg3d_tpu.utils.platform import setup_jax
    setup_jax(args.device, host_device_count=args.host_device_count)

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
        ignore_label=cfg.get("ignore_label", 0),
    )

    gs = np.asarray(cfg.voxel_generator["range"], np.float32)
    vs = np.asarray(cfg.voxel_generator["voxel_size"], np.float32)
    grid = np.round((gs[3:] - gs[:3]) / vs).astype(int)
    input_shape = (int(grid[2]) + 1, int(grid[1]), int(grid[0]))

    total_epochs = args.total_epochs or cfg.total_epochs
    grad_clip = cfg.optimizer_config.get("grad_clip", {}).get("max_norm", 35.0)

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
        lr_cfg=dict(cfg.lr_config),
        total_epochs=total_epochs,
        work_dir=work_dir,
        logger=logger,
        grad_clip=grad_clip,
        log_interval=cfg.get("log_config", {}).get("interval", 5),
        resume_from=args.resume_from,
        seed=args.seed or 0,
        init_hook=init_hook,
    )


if __name__ == "__main__":
    main()
