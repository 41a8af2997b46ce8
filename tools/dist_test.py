#!/usr/bin/env python
"""Alias of tools/test.py keeping the reference CLI name
(/root/reference/tools/dist_test.py). Distributed eval is implicit: launch
one process per host; the loader shards frames per host and the confusion
histogram reduces on device."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test import main  # noqa: E402

if __name__ == "__main__":
    main()
