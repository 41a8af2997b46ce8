"""Extract the authoritative mmcv HRNet state_dict manifest (key order +
shapes) by instantiating the REFERENCE torch HRNet with mmcv stubbed out.

The manifest pins the exact layer order + tensor shapes of the mmseg
pretrained checkpoints (hrnetv2_w18/w48) that tools/convert_hrnet_checkpoint
pairs sequentially against our flax execution order. Run:

    python tools/parity/make_hrnet_manifest.py 18 tests/data/hrnetv2_w18_manifest.json
"""
import json
import sys

sys.path.insert(0, "/root/repo/tools/parity")
from ref_hrnet_stubs import hrnet


W = int(sys.argv[1]) if len(sys.argv) > 1 else 18
OUT = sys.argv[2] if len(sys.argv) > 2 else f"hrnetv2_w{W}_manifest.json"

chans = {18: (18, 36, 72, 144), 48: (48, 96, 192, 384)}[W]
extra = dict(
    stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                num_blocks=(4, 4), num_channels=chans[:2]),
    stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                num_blocks=(4, 4, 4), num_channels=chans[:3]),
    stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                num_blocks=(4, 4, 4, 4), num_channels=chans),
)

net = hrnet.HRNet(extra=extra, norm_cfg=None)
sd = net.state_dict()
manifest = [
    {"key": k, "shape": list(v.shape)}
    for k, v in sd.items() if "num_batches_tracked" not in k
]
with open(OUT, "w") as f:
    json.dump({"width": W, "entries": manifest}, f, indent=0)
print(f"{len(manifest)} tensors -> {OUT}")
