"""Deploy-time reparameterization: merge each VGGBlock's parallel 3x3+1x1
branches (with their BatchNorms folded in) into a single biased 3x3 conv.

Parity target: reference `convert_to_deploy` walk (dfine.py:30-41) and
`VGGBlock.get_equivalent_kernel_bias` (hybrid_encoder.py:123-156).

Why this matters on TPU: XLA folds BN affine transforms into a conv's
epilogue for free, but it will NOT merge two separate convolutions over the
same input into one — so the RepVGG-style two-branch VGGBlock pays for both
convs at inference unless we fuse the kernels ourselves. The fusion is exact
(same linear map, re-expressed), so accuracy is unchanged up to float
rounding.

The reference's other deploy transforms need no TPU equivalent:
- ConvNormLayer_fuse conv+BN fold (hybrid_encoder.py:47-79): XLA constant-
  folds the affine into the conv epilogue at compile time.
- decoder aux-head pruning (dfine_decoder.py:422-427): eval tracing already
  only visits layers 0..eval_idx; XLA dead-code-eliminates unused heads.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

BN_EPS = 1e-5  # models/layers.py BatchNorm.epsilon


def _is_vgg_node(p: Mapping) -> bool:
    if not (isinstance(p, Mapping) and set(p.keys()) == {"conv1", "conv2"}):
        return False
    try:
        k3 = p["conv1"]["conv"]["kernel"]
        k1 = p["conv2"]["conv"]["kernel"]
    except (KeyError, TypeError):
        return False
    return tuple(k3.shape[:2]) == (3, 3) and tuple(k1.shape[:2]) == (1, 1)


def _fold_bn(kernel, bn_params, bn_stats):
    """Fold inference-mode BN into HWIO conv kernel + bias
    (reference hybrid_encoder.py:145-156, torch OIHW -> HWIO here)."""
    t = np.asarray(bn_params["scale"]) / np.sqrt(np.asarray(bn_stats["var"]) + BN_EPS)
    k = np.asarray(kernel) * t  # broadcast over trailing (out-channel) dim
    b = np.asarray(bn_params["bias"]) - np.asarray(bn_stats["mean"]) * t
    return k, b


def _fuse_node(p: Mapping, s: Mapping) -> Dict[str, Any]:
    import jax.numpy as jnp

    k3, b3 = _fold_bn(p["conv1"]["conv"]["kernel"],
                      p["conv1"]["norm"]["bn"], s["conv1"]["norm"]["bn"])
    k1, b1 = _fold_bn(p["conv2"]["conv"]["kernel"],
                      p["conv2"]["norm"]["bn"], s["conv2"]["norm"]["bn"])
    k1 = np.pad(k1, [(1, 1), (1, 1), (0, 0), (0, 0)])
    return {"fused": {"kernel": jnp.asarray(k3 + k1, np.float32),
                      "bias": jnp.asarray(b3 + b1, np.float32)}}


def fuse_vgg_variables(variables: Mapping) -> Tuple[Dict, int]:
    """Return (deploy variables, #blocks fused): every VGGBlock params subtree
    replaced by a single fused conv; its batch_stats subtree dropped."""
    n_fused = 0

    def walk(p, s):
        nonlocal n_fused
        if _is_vgg_node(p):
            n_fused += 1
            return _fuse_node(p, s), None
        if isinstance(p, Mapping):
            new_p, new_s = {}, {}
            for k, v in p.items():
                sub_s = s.get(k, {}) if isinstance(s, Mapping) else {}
                rp, rs = walk(v, sub_s)
                new_p[k] = rp
                if rs is not None:
                    new_s[k] = rs
            # keep stats-only keys (subtrees with stats but no params)
            if isinstance(s, Mapping):
                for k, v in s.items():
                    if k not in new_p and k not in new_s:
                        new_s[k] = v
            return new_p, (new_s if new_s else None)
        return p, (s if s != {} else None)

    params, stats = walk(dict(variables["params"]), dict(variables["batch_stats"]))
    out = {"params": params, "batch_stats": stats or {}}
    for k, v in variables.items():
        if k not in out:
            out[k] = v
    return out, n_fused


def convert_to_deploy(model, variables) -> Tuple[Any, Dict]:
    """(model, trained variables) -> (deploy model, fused variables).

    Reference equivalent: DFINE.deploy() (dfine.py:30-41). The returned model
    is the same flax module with deploy=True, whose VGGBlocks read the fused
    single-conv parameters produced here.
    """
    fused, n = fuse_vgg_variables(variables)
    return model.clone(deploy=True), fused
