"""Collate capacity-overflow handling (VERDICT r4 item 7).

The reference's ragged concat never drops rows
(det3d/torchie/parallel/collate.py:95-175); our fixed-capacity pad
truncates, so truncation must be loud: error (train), warn (eval), or
silent (synthetic benches sized to capacity).
"""

import logging

import numpy as np
import pytest

from lidarseg3d_tpu.datasets.batching import collate_segnet


def _frame(n_vox, n_pts):
    return {
        "voxels": np.zeros((n_vox, 5, 4), np.float32),
        "coordinates": np.zeros((n_vox, 3), np.int32),
        "num_points_per_voxel": np.ones(n_vox, np.int32),
        "points": np.zeros((n_pts, 4), np.float32),
    }


def test_collate_fits_no_warning(caplog):
    with caplog.at_level(logging.WARNING,
                         logger="lidarseg3d_tpu.datasets.batching"):
        batch = collate_segnet([_frame(10, 30)], max_voxels=16,
                               max_points=32, on_overflow="warn")
    assert not caplog.records
    assert batch["voxels"].shape == (1, 16, 5, 4)
    assert int(batch["num_voxels"][0]) == 10


def test_collate_overflow_error():
    with pytest.raises(ValueError, match=r"dropped 4 voxel rows"):
        collate_segnet([_frame(20, 30)], max_voxels=16, max_points=32,
                       on_overflow="error")
    with pytest.raises(ValueError, match=r"10 point rows"):
        collate_segnet([_frame(10, 42)], max_voxels=16, max_points=32,
                       on_overflow="error")


def test_collate_overflow_warn_counts(caplog):
    with caplog.at_level(logging.WARNING,
                         logger="lidarseg3d_tpu.datasets.batching"):
        batch = collate_segnet([_frame(20, 40), _frame(10, 50)],
                               max_voxels=16, max_points=32,
                               on_overflow="warn")
    assert len(caplog.records) == 1
    msg = caplog.records[0].getMessage()
    assert "dropped 4 voxel rows" in msg  # 20-16 + 0
    assert "26 point rows" in msg  # (40-32) + (50-32)
    # truncation itself still happens (static shapes preserved)
    assert batch["voxels"].shape == (2, 16, 5, 4)
    assert batch["num_voxels"].tolist() == [16, 10]


def test_collate_overflow_silent(caplog):
    with caplog.at_level(logging.WARNING,
                         logger="lidarseg3d_tpu.datasets.batching"):
        collate_segnet([_frame(20, 40)], max_voxels=16, max_points=32,
                       on_overflow="silent")
    assert not caplog.records
