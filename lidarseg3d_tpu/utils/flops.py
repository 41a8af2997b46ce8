"""FLOPs / parameter counting.

Replaces the reference's hook-based torch FLOPs counter
(det3d/utils/flops_counter.py) with XLA's own cost model: the compiled
HLO's cost analysis is exact for the fused program actually executed.
"""

import jax


def count_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def count_flops(fn, *args):
    """FLOPs + bytes accessed of jit(fn)(*args) per XLA cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per computation
        ca = ca[0]
    return {
        "flops": ca.get("flops", -1),
        "bytes_accessed": ca.get("bytes accessed", -1),
    }


def model_complexity(model, variables, example, train=False):
    """(params, flops) for a detector forward."""

    def fwd(v, ex):
        ret, _ = model.apply(v, ex, train=train)
        return ret

    stats = count_flops(fwd, variables, example)
    stats["params"] = count_params(variables["params"])
    return stats
