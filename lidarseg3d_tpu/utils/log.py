"""Rank-aware logging (cf. det3d/core/utils/common_utils.py create_logger)."""

import logging
import sys


def create_logger(log_file=None, rank=0, log_level=logging.INFO,
                  name="lidarseg3d_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None and rank == 0:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
