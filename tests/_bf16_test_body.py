"""Body of test_img_branch_bf16_mixed_precision, run in a FRESH subprocess.

Why a subprocess: compiling the bf16-dtype conv programs on the XLA CPU
backend segfaults nondeterministically when it happens deep inside a long
pytest process (observed in compile, cache-read and cache-write phases;
the same programs always pass in a fresh interpreter, with or without
torch loaded). Isolating the bf16 compiles in a clean process keeps the
numeric coverage in CI without exposing the suite to the crash.

Run: python tests/_bf16_test_body.py   (prints "BF16-OK" and exits 0)
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
# no persistent compile cache: (de)serializing these executables has its
# own flake (see test_mseg3d.py history); a fresh process compiles in
# seconds at this scale anyway
jax.config.update("jax_compilation_cache_dir", None)

from test_mseg3d import model_cfg, make_example  # noqa: E402
from lidarseg3d_tpu.models import build_detector  # noqa: E402


def main():
    ex = make_example()
    model = build_detector(model_cfg())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )

    cfg = model_cfg()
    cfg["img_backbone"]["compute_dtype"] = "bfloat16"
    cfg["img_head"]["compute_dtype"] = "bfloat16"
    model_h = build_detector(cfg)
    var_h = model_h.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        ex, train=False,
    )
    paths = lambda v: set(
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(v)[0])
    assert paths(var_h) == paths(variables), "param tree changed under bf16"
    for leaf in jax.tree_util.tree_leaves(var_h["params"]):
        assert leaf.dtype == jnp.float32, "master params must stay fp32"

    B, ncam = ex["images"].shape[:2]
    imgs = ex["images"].reshape(B * ncam, *ex["images"].shape[2:])

    def img_out(m, v):
        def fwd(mdl, imgs):
            f = mdl.img_backbone_mod(imgs, train=False)
            return mdl.img_head_mod(f, batch_size=B, train=False)

        return m.apply(v, imgs, method=fwd)

    r32 = img_out(model, variables)
    rh = img_out(model_h, variables)  # same fp32 params
    for key in ("image_features", "image_logits",
                "camera_semantic_embeddings"):
        assert rh[key].dtype == jnp.float32, key
        a, b = np.asarray(r32[key]), np.asarray(rh[key])
        scale = max(np.abs(a).max(), 1e-3)
        err = np.abs(a - b).max()
        assert err <= 0.1 * scale, f"{key}: bf16 deviates {err} vs {scale}"

    # grads flow through the bf16 convs (image branch only)
    def loss_fn(p):
        def fwd(mdl, imgs):
            f = mdl.img_backbone_mod(imgs, train=True)
            out = mdl.img_head_mod(f, batch_size=B, train=True)
            return out["image_logits"]

        logits, _ = model_h.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, imgs,
            method=fwd, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(logits ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(grads))
    assert gsum > 0 and np.isfinite(gsum), "no gradient flow through bf16"
    print("BF16-OK")


if __name__ == "__main__":
    main()
