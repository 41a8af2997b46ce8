"""Record golden npz: the REFERENCE torch HRNet's forward (float64) on a
fixed input with a fixed random state_dict (mmcv layout).

The recorded npz (tests/data/golden_hrnet_tiny.npz) holds the state_dict
tensors (sd/<key>), the input batch (NCHW), and the reference module's 4
output feature maps. tests/test_golden_mseg3d.py then maps the state_dict
into our flax HRNet with tools/convert_hrnet_checkpoint.convert and
asserts the flax forward reproduces the reference outputs — cross-
framework golden parity for the camera branch.

Run: python tools/parity/record_golden_hrnet.py
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools/parity")

import numpy as np
import torch

# stubs + reference module loading
from ref_hrnet_stubs import hrnet as hrnet_mod

TINY_HRNET = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(1,), num_channels=(8,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(1, 1), num_channels=(4, 8)),
    stage3=dict(num_modules=1, num_branches=3, block="BASIC",
                num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block="BASIC",
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)

torch.manual_seed(0)
net = hrnet_mod.HRNet(extra=TINY_HRNET, norm_cfg=None).double()
net.eval()  # the reference's train() override returns None — don't chain

# randomize ALL tensors (default BN stats are 0/1 — perturb them too so
# eval-mode BN is a real affine, not an identity)
rng = np.random.default_rng(42)
sd = {}
with torch.no_grad():
    for k, v in net.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        if "running_var" in k:
            arr = 0.5 + rng.random(tuple(v.shape))
        else:
            arr = rng.standard_normal(tuple(v.shape)) * 0.2
        # round to checkpoint (fp32) precision FIRST so the float64
        # reference forward runs on exactly the values the flax side loads
        sd[k] = arr.astype(np.float32).astype(np.float64)
missing, unexpected = net.load_state_dict(
    {k: torch.tensor(v) for k, v in sd.items()}, strict=False)
assert not unexpected, unexpected
assert all("num_batches_tracked" in k for k in missing), missing

x = rng.standard_normal((4, 3, 32, 64)).astype(np.float64)  # B*ncam=4
with torch.no_grad():
    outs = net(torch.tensor(x))

data = {"input_nchw": x}
for i, o in enumerate(outs):
    data[f"out{i}"] = o.numpy()
for k, v in sd.items():
    data[f"sd/{k}"] = v.astype(np.float32)  # checkpoint-precision weights

np.savez_compressed("/root/repo/tests/data/golden_hrnet_tiny.npz", **data)
print("saved", {k: v.shape for k, v in data.items() if k.startswith("out")})
