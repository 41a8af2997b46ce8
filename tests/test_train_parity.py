"""Cross-framework N-step TRAINING-dynamics parity (VERDICT r3 item 3).

The forward-parity chain (golden UNet/HRNet/flagship oracles) says nothing
about optimizer semantics; this pins the full fastai stack — Adam with
per-iteration OneCycle lr AND beta1, true (decoupled) weight decay applied
to every param including BN (bn_wd=True), global-norm grad clip 35, and BN
momentum 0.01 running-stat interplay — against a float64 torch oracle over
20 steps (reference: /root/reference/det3d/solver/fastai_optim.py:163-180,
learning_schedules_fastai.py:77-97, torchie/trainer/trainer.py:403-434).

Runs in a subprocess because float64 jax (JAX_ENABLE_X64) must be set
before the backend initializes, and the rest of the suite is fp32.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_dynamics_match_torch_fastai_20_steps():
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_train_parity_body.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"train parity body failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    t, j = np.asarray(out["torch"]), np.asarray(out["jax"])
    assert len(t) == len(j) == 20
    # sanity on top of the body's own asserts: training actually progressed
    assert t[-1] < t[0]
    np.testing.assert_allclose(j, t, rtol=1e-6, atol=1e-9)
