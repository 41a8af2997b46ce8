"""TensorBoard scalar logging (cf. det3d/torchie/trainer/hooks/logger/
tensorboard.py:9). Uses torch's SummaryWriter when available (torch-cpu is
in the image); no-ops otherwise."""


class TensorboardLogger:
    def __init__(self, log_dir):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    def log_scalars(self, scalars, step):
        if self._w is None:
            return
        for k, v in scalars.items():
            self._w.add_scalar(k, float(v), step)

    def close(self):
        if self._w is not None:
            self._w.close()
