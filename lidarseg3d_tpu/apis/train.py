"""Training API: train state, jitted SPMD train step, epoch loop.

Replaces the reference Trainer + hook stack
(det3d/torchie/trainer/trainer.py:139-607, apis/train.py:294-393) with a
functional loop: OneCycle/Adam via optax, gradient clip 35, per-iteration
LR schedule, text logging with loss averages and ETA, per-epoch orbax
checkpoints with resume.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..parallel import mesh as mesh_lib
from ..solver.optim import build_one_cycle_optimizer


class TrainerHook:
    """User extension point for the training loop.

    The reference's hook registry (det3d/torchie/trainer/hooks, dispatched
    by Trainer.call_hook at before/after run/epoch/iter) maps onto these
    overridable no-op methods; pass instances via
    ``train_segmentor(hooks=[...])``. Built-in behaviours (logging, ckpt,
    TB, profiler) stay inline — hooks ADD behaviour (EMA, custom eval,
    early stop via StopTraining, etc.).
    """

    def before_run(self, state, loop):  # loop: dict of loop constants
        return state

    def before_epoch(self, state, epoch):
        return state

    def after_iter(self, state, ldict, global_step):
        return state

    def after_epoch(self, state, epoch):
        return state

    def after_run(self, state):
        return state


class StopTraining(Exception):
    """Raise from a hook to end training cleanly."""


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: tuple


DEVICE_BATCH_KEYS = (
    "voxels", "coordinates", "num_points", "num_voxels", "points",
    "point_valid", "voxel_valid", "voxel_sem_labels", "point_sem_labels",
    "images", "points_cuv", "images_sem_labels",
)


def example_to_device(batch, mesh):
    """Ship the padded numpy batch to devices, batch axis sharded
    (cf. example_to_device, torchie/trainer/trainer.py:34)."""
    dev = {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}
    return mesh_lib.shard_batch(dev, mesh)


def create_train_state(model, example, rng, tx):
    k1, k2 = jax.random.split(rng)
    # On TPU, init under jit: eager init dispatches every rulebook-build op
    # over the device RPC individually (minutes on axon). On CPU keep eager
    # init (XLA:CPU compiles the full init graph very slowly).
    ishape = example.get("input_shape")
    arrs = {k: v for k, v in example.items() if k != "input_shape"}

    def _init(rngs, arrs):
        e = dict(arrs)
        if ishape is not None:
            e["input_shape"] = ishape
        return model.init(rngs, e, train=False)

    if jax.default_backend() == "tpu":
        _init = jax.jit(_init)
    variables = _init({"params": k1, "dropout": k2}, arrs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def make_train_step(model, tx, input_shape):
    def train_step(state, batch):
        ex = dict(batch)
        ex["input_shape"] = input_shape

        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)

        def loss_fn(params):
            (ret, bat), new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ex, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss, ldict = model.loss(ret, bat)
            return loss, (ldict, new_vars["batch_stats"])

        (loss, (ldict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        ldict = dict(ldict)
        ldict["grad_norm"] = optax.global_norm(grads)
        return new_state, ldict

    return train_step


def make_eval_step(model, input_shape):
    def eval_step(state, batch):
        ex = dict(batch)
        ex["input_shape"] = input_shape
        ret, bat = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ex, train=False,
        )
        return model.predict(ret, bat)

    return eval_step


def save_checkpoint(work_dir, state, epoch, keep_latest=True):
    """Single-writer checkpoint save (the jax equivalent of the reference's
    rank-0 save, trainer.py:346-360). Every process must CALL save — orbax
    runs its own cross-host barriers inside — but with host-replicated numpy
    trees only process 0 writes bytes; latest.txt is process-0-guarded."""
    import orbax.checkpoint as ocp

    from ..parallel import dist

    path = os.path.abspath(os.path.join(work_dir, f"epoch_{epoch}"))
    # params are replicated; every process holds a full addressable copy
    host_state = jax.tree.map(
        lambda x: np.asarray(x.addressable_shards[0].data)
        if isinstance(x, jax.Array) else np.asarray(x),
        state,
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()
    if keep_latest and dist.is_main_process():
        latest = os.path.join(work_dir, "latest.txt")
        with open(latest, "w") as f:
            f.write(f"epoch_{epoch}\n")
    dist.barrier(f"ckpt_epoch_{epoch}")
    return path


def load_checkpoint(work_dir, state_template, epoch=None, partial=False):
    """Restore a checkpoint. With partial=True, only the fields present in
    the template are restored (e.g. eval-time load without opt_state,
    matching the reference's weights-only --load_from path,
    torchie/trainer/checkpoint.py:122-216)."""
    import orbax.checkpoint as ocp

    if epoch is None:
        with open(os.path.join(work_dir, "latest.txt")) as f:
            name = f.read().strip()
    else:
        name = f"epoch_{epoch}"
    path = os.path.abspath(os.path.join(work_dir, name))
    template = jax.device_get(state_template)
    if partial:
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        restored = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(template, partial_restore=True)
        )
    else:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, template)
    epoch_n = int(name.split("_")[1])
    return restored, epoch_n


def train_segmentor(
    model,
    loader,
    input_shape,
    optimizer_cfg,
    lr_cfg,
    total_epochs,
    work_dir,
    logger,
    grad_clip=35.0,
    log_interval=5,
    resume_from=None,
    seed=0,
    val_fn=None,
    init_hook=None,
    tb_log_dir=None,
    profile_dir=None,
    hooks=(),
):
    """Epoch-based training loop (cf. Trainer.run/train,
    trainer.py:391-434,509). Optional extras: TensorBoard scalars
    (tb_log_dir) and a jax.profiler trace of steps 10-14 (profile_dir)."""
    os.makedirs(work_dir, exist_ok=True)
    tb = None
    if tb_log_dir:
        from ..utils.tb_logger import TensorboardLogger

        tb = TensorboardLogger(tb_log_dir)
    steps_per_epoch = loader.steps_per_epoch()
    total_steps = steps_per_epoch * total_epochs
    tx, lr_fn = build_one_cycle_optimizer(
        optimizer_cfg, lr_cfg, total_steps, grad_clip=grad_clip
    )
    mesh = mesh_lib.make_mesh()

    # init with the first batch
    first = next(loader.epoch(0))
    ex0 = example_to_device(first, mesh)
    ex0i = dict(ex0)
    ex0i["input_shape"] = input_shape
    state = create_train_state(model, ex0i, jax.random.PRNGKey(seed), tx)
    if init_hook is not None:
        state = init_hook(state)
    state = mesh_lib.replicate_tree(state, mesh)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"model params: {n_params/1e6:.2f} M; "
                f"steps/epoch: {steps_per_epoch}; total steps: {total_steps}")

    start_epoch = 0
    if resume_from is not None:
        # resume_from: -1 or True -> latest checkpoint; N -> epoch_N
        epoch_sel = None if resume_from in (-1, True) else resume_from
        state, start_epoch = load_checkpoint(work_dir, state, epoch_sel)
        state = mesh_lib.replicate_tree(state, mesh)
        logger.info(f"resumed from epoch {start_epoch}")

    train_step = jax.jit(make_train_step(model, tx, input_shape), donate_argnums=0)

    loop_info = dict(total_epochs=total_epochs, steps_per_epoch=steps_per_epoch,
                     work_dir=work_dir, lr_fn=lr_fn)
    for h in hooks:
        state = h.before_run(state, loop_info) or state

    t_start = time.time()
    global_step = start_epoch * steps_per_epoch
    stop = False
    for epoch in range(start_epoch, total_epochs):
        for h in hooks:
            try:
                state = h.before_epoch(state, epoch) or state
            except StopTraining:
                stop = True
        if stop:
            break
        buf, t_data, t_iter = {}, 0.0, time.time()
        for it, batch in enumerate(loader.epoch(epoch)):
            t0 = time.time()
            dev_batch = example_to_device(batch, mesh)
            t_data += time.time() - t0
            if profile_dir and global_step == 10:
                jax.profiler.start_trace(profile_dir)
            state, ldict = train_step(state, dev_batch)
            for h in hooks:
                try:
                    state = h.after_iter(state, ldict, global_step) or state
                except StopTraining:
                    stop = True
            if profile_dir and global_step == 14:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
            global_step += 1
            if stop:
                break
            for k, v in ldict.items():
                buf.setdefault(k, []).append(v)
            if (it + 1) % log_interval == 0:
                vals = {k: float(np.mean([np.asarray(x) for x in jax.device_get(v)]))
                        for k, v in buf.items()}
                lr = float(lr_fn(global_step))
                elapsed = time.time() - t_start
                done = global_step - start_epoch * steps_per_epoch
                remaining = total_steps - global_step
                eta = elapsed / max(done, 1) * remaining
                msg = ", ".join(f"{k}: {v:.4f}" for k, v in vals.items())
                logger.info(
                    f"Epoch [{epoch+1}/{total_epochs}][{it+1}/{steps_per_epoch}] "
                    f"lr: {lr:.5f}, eta: {eta/60:.1f}min, data: {t_data:.2f}s, "
                    f"iter: {(time.time()-t_iter):.2f}s, {msg}"
                )
                if tb is not None:
                    tb.log_scalars({"lr": lr, **vals}, global_step)
                buf, t_data, t_iter = {}, 0.0, time.time()
        save_checkpoint(work_dir, state, epoch + 1)
        logger.info(f"saved checkpoint epoch_{epoch+1}")
        if val_fn is not None:
            val_fn(state, epoch + 1)
        for h in hooks:
            try:
                state = h.after_epoch(state, epoch + 1) or state
            except StopTraining:
                stop = True
        if stop:
            break
    for h in hooks:
        state = h.after_run(state) or state
    return state
