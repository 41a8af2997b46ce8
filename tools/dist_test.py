#!/usr/bin/env python
"""Alias of tools/test.py keeping the reference CLI name
(/root/reference/tools/dist_test.py). Multi-host eval: launch one process
per host with --dist_coordinator/--dist_num_processes/--dist_process_id (or
the JAX_* env vars); the loader shards frames per host, each host fetches
only its rows, and the per-host confusion histograms are allreduced before
mIoU (parallel/dist.py, exercised by tests/test_multihost.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test import main  # noqa: E402

if __name__ == "__main__":
    main()
