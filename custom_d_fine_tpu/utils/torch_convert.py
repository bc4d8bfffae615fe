"""Torch-checkpoint -> Flax-variables converter.

Parity targets:
- load_tuning_state / matched_state (reference src/d_fine/utils.py:140-181):
  accepts {"ema": {"module": ...}} / {"model": ...} wrappers, shape-tolerant
  partial load with a missed/unmatched report.
- Objects365->COCO classification-row remap (reference utils.py:8-137) via
  the same obj365 id table.

The name mapping walks torch state_dict keys and rewrites them to this
package's Flax module tree (NHWC): conv OIHW->HWIO, linear W->W^T, MHA in_proj
split into q/k/v, BN running stats -> batch_stats collection.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

import flax

# Objects365 ids matching COCO classes in order (reference utils.py:8-98)
OBJ365_IDS = [
    0, 46, 5, 58, 114, 55, 116, 65, 21, 40, 176, 127, 249, 24, 56, 139, 92,
    78, 99, 96, 144, 295, 178, 180, 38, 39, 13, 43, 120, 219, 148, 173, 165,
    154, 137, 113, 145, 146, 204, 8, 35, 10, 88, 84, 93, 26, 112, 82, 265,
    104, 141, 152, 234, 143, 150, 97, 2, 50, 25, 75, 98, 153, 37, 73, 115,
    132, 106, 61, 163, 134, 277, 81, 133, 18, 94, 30, 169, 70, 328, 226,
]


def _to_flax_path(tkey: str) -> Optional[Tuple[str, ...]]:
    """Map one torch state_dict key to a flax path (without leaf handling).
    Returns None for keys we deliberately skip (buffers we recompute)."""
    k = tkey
    # skips: static buffers recomputed at trace time
    if re.search(r"(anchors|valid_mask|num_points_scale|\bup\b|reg_scale|project)$", k):
        return None
    if k.endswith("num_batches_tracked"):
        return None

    # ---- backbone ----
    k = re.sub(r"^backbone\.stages\.(\d+)\.", r"backbone.stages_\1.", k)
    k = re.sub(r"\.blocks\.(\d+)\.", r".blocks_\1.", k)
    k = re.sub(r"\.layers\.(\d+)\.(conv1|conv2)\.", r".layers_\1.\2.", k)  # LightConvBNAct
    k = re.sub(r"(backbone\..*)\.layers\.(\d+)\.", r"\1.layers_\2.", k)
    k = re.sub(r"\.aggregation\.0\.", r".agg_squeeze.", k)
    k = re.sub(r"\.aggregation\.1\.", r".agg_excite.", k)

    # ---- hybrid encoder ----
    k = re.sub(r"^encoder\.input_proj\.(\d+)\.conv\.", r"encoder.input_proj_\1_conv.", k)
    k = re.sub(r"^encoder\.input_proj\.(\d+)\.norm\.", r"encoder.input_proj_\1_norm.", k)
    k = re.sub(r"^encoder\.encoder\.(\d+)\.layers\.(\d+)\.", r"encoder.encoder_\1_layers_\2.", k)
    k = re.sub(r"^encoder\.lateral_convs\.(\d+)\.", r"encoder.lateral_convs_\1.", k)
    k = re.sub(r"^encoder\.fpn_blocks\.(\d+)\.", r"encoder.fpn_blocks_\1.", k)
    k = re.sub(r"^encoder\.pan_blocks\.(\d+)\.", r"encoder.pan_blocks_\1.", k)
    k = re.sub(r"^encoder\.downsample_convs\.(\d+)\.0\.", r"encoder.downsample_convs_\1.", k)

    # RepNCSPELAN4 internals (cv2/cv3 are Sequential(CSPLayer, ConvNorm))
    k = re.sub(r"\.(cv2|cv3)\.0\.", r".\1_csp.", k)
    k = re.sub(r"\.(cv2|cv3)\.1\.", r".\1_conv.", k)
    k = re.sub(r"\.bottlenecks\.(\d+)\.", r".bottlenecks_\1.", k)

    # ---- decoder ----
    k = re.sub(r"^decoder\.input_proj\.(\d+)\.conv\.", r"decoder.input_proj_\1_conv.", k)
    k = re.sub(r"^decoder\.input_proj\.(\d+)\.norm\.", r"decoder.input_proj_\1_norm.", k)
    k = re.sub(r"^decoder\.decoder\.layers\.(\d+)\.", r"decoder.decoder_layers_\1.", k)
    k = re.sub(r"^decoder\.decoder\.lqe_layers\.(\d+)\.", r"decoder.lqe_layers_\1.", k)
    k = re.sub(r"^decoder\.dec_score_head\.(\d+)\.", r"decoder.dec_score_head_\1.", k)
    k = re.sub(r"^decoder\.dec_bbox_head\.(\d+)\.", r"decoder.dec_bbox_head_\1.", k)
    k = re.sub(r"^decoder\.enc_output\.proj\.", r"decoder.enc_output_proj.", k)
    k = re.sub(r"^decoder\.enc_output\.norm\.", r"decoder.enc_output_norm.", k)
    k = re.sub(r"^decoder\.mask_decoder\.lateral\.(\d+)\.", r"decoder.mask_decoder.lateral_\1.", k)
    k = re.sub(r"^decoder\.mask_decoder\.bn\.(\d+)\.", r"decoder.mask_decoder.gn_\1.", k)

    # generic MLP layers
    k = re.sub(r"\.layers\.(\d+)\.", r".layers_\1.", k)
    # ConvBNAct "same" padding conv is Sequential(ZeroPad2d, Conv2d)
    k = k.replace(".conv.1.", ".conv.")

    return tuple(k.split("."))


def _is_batchnorm(tkey: str) -> bool:
    return bool(re.search(r"\.(bn|norm)\.(weight|bias|running_mean|running_var)$", tkey)) and (
        ".norm1." not in tkey and ".norm2." not in tkey and ".norm3." not in tkey
    )


def convert_torch_state(
    state: Dict[str, np.ndarray],
    flax_params,
    flax_batch_stats,
    num_classes: Optional[int] = None,
    strict: bool = False,
):
    """Convert a torch state_dict (numpy values) into (params, batch_stats).

    Walks the torch keys, rewrites names, transposes layouts, and writes into
    copies of the given flax trees (shape-checked). Returns
    (params, batch_stats, report) where report lists unmatched/missed keys.
    """
    params = flax.traverse_util.flatten_dict(flax_params, sep="/")
    stats = flax.traverse_util.flatten_dict(flax_batch_stats, sep="/")
    touched = set()
    report = {"unmatched": [], "shape_mismatch": [], "missed": []}

    # detect BN modules by presence of running stats
    running = {k[: -len(".running_mean")] for k in state if k.endswith(".running_mean")}

    def put(target: Dict, key: str, val: np.ndarray, tkey: str):
        if key not in target:
            report["unmatched"].append((tkey, key))
            return
        if target[key].shape != val.shape:
            report["shape_mismatch"].append((tkey, key, target[key].shape, val.shape))
            return
        target[key] = val.astype(np.float32)
        touched.add(key)

    for tkey, tval in state.items():
        val = np.asarray(tval)

        # MHA packed qkv
        m = re.match(r"^(.*)\.self_attn\.in_proj_(weight|bias)$", tkey)
        if m:
            base = _to_flax_path(m.group(1) + ".self_attn.x")[:-1]
            prefix = "/".join(base)
            E = val.shape[0] // 3
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                part = val[i * E:(i + 1) * E]
                if m.group(2) == "weight":
                    put(params, f"{prefix}/{name}/kernel", part.T, tkey)
                else:
                    put(params, f"{prefix}/{name}/bias", part, tkey)
            continue
        m = re.match(r"^(.*)\.self_attn\.out_proj\.(weight|bias)$", tkey)
        if m:
            base = _to_flax_path(m.group(1) + ".self_attn.x")[:-1]
            prefix = "/".join(base)
            if m.group(2) == "weight":
                put(params, f"{prefix}/out_proj/kernel", val.T, tkey)
            else:
                put(params, f"{prefix}/out_proj/bias", val, tkey)
            continue

        module, leaf = tkey.rsplit(".", 1)
        if leaf == "num_batches_tracked":
            continue
        is_bn = module in running

        if is_bn:
            # torch BN module is 'bn' inside ConvBNAct, 'norm' in
            # ConvNormLayer / input_proj; flax wraps both as <name>/norm/bn
            mpath = module[:-3] + ".norm.bn" if module.endswith(".bn") else module + ".bn"
            prefix = _to_flax_path(mpath + ".x")
            if prefix is None:
                continue
            key = "/".join(prefix[:-1])
            if leaf == "running_mean":
                put(stats, f"{key}/mean", val, tkey)
            elif leaf == "running_var":
                put(stats, f"{key}/var", val, tkey)
            elif leaf == "weight":
                put(params, f"{key}/scale", val, tkey)
            elif leaf == "bias":
                put(params, f"{key}/bias", val, tkey)
            else:
                report["unmatched"].append((tkey, key))
            continue

        path = _to_flax_path(tkey)
        if path is None:
            continue
        key = "/".join(path)

        if leaf == "weight" and val.ndim == 4:  # conv OIHW -> HWIO
            put(params, key.replace("/weight", "/kernel"), val.transpose(2, 3, 1, 0), tkey)
        elif leaf == "weight" and val.ndim == 2:
            if "class_embed" in tkey:  # nn.Embedding
                put(params, key.replace("/weight", "/embedding"), val, tkey)
            else:  # nn.Linear
                put(params, key.replace("/weight", "/kernel"), val.T, tkey)
        elif leaf == "weight" and val.ndim == 1:  # LayerNorm/GroupNorm/LAB scale
            put(params, key.replace("/weight", "/scale"), val, tkey)
        elif leaf in ("bias", "scale"):
            put(params, key, val, tkey)
        else:
            report["unmatched"].append((tkey, key))

    for k in params:
        if k not in touched:
            report["missed"].append(("params", k))
    for k in stats:
        if k not in touched:
            report["missed"].append(("batch_stats", k))

    if strict and (report["unmatched"] or report["shape_mismatch"]):
        raise ValueError(f"conversion errors: {report}")

    return (
        flax.traverse_util.unflatten_dict(params, sep="/"),
        flax.traverse_util.unflatten_dict(stats, sep="/"),
        report,
    )


def unwrap_torch_checkpoint(ckpt: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Prefer EMA weights, then raw model (reference utils.py:156-170)."""
    if "ema" in ckpt and isinstance(ckpt["ema"], dict) and "module" in ckpt["ema"]:
        sd = ckpt["ema"]["module"]
    elif "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    return {k: np.asarray(v) for k, v in sd.items()}


def remap_obj365_head(state: Dict[str, np.ndarray], num_classes: int) -> Dict[str, np.ndarray]:
    """Map Objects365-pretrained classification rows onto COCO-sized heads
    (reference utils.py:92-137): for score-head weights/biases with 366/365
    rows, coco class c takes pretrain row OBJ365_IDS[c] + 1 (the +1 skips the
    checkpoint's leading non-class row, utils.py:100-103). A size-mismatched
    `denoising_class_embed` is DROPPED — the reference deletes it from the
    pretrain state so the target keeps its own init (utils.py:113-117).

    Differentially verified against the reference's own adjust_head_parameters
    in tests/test_torch_convert.py::test_obj365_remap_matches_reference."""
    out = dict(state)
    for k, v in state.items():
        v = np.asarray(v)
        if v.ndim == 0:
            continue
        if "denoising_class_embed" in k:
            if v.shape[0] != num_classes + 1:  # embedding rows = nc + pad row
                del out[k]
        elif re.search(r"score_head", k) and v.shape[0] in (365, 366):
            idx = np.asarray(OBJ365_IDS[:num_classes]) + 1
            out[k] = v[idx]
    return out


def load_torch_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = unwrap_torch_checkpoint(ckpt)
    return {k: np.asarray(v.detach() if hasattr(v, "detach") else v) for k, v in sd.items()}


# ImageNet stage-1 HGNetv2 weights (reference hgnetv2.py arch_configs "url"
# entries, hgnetv2.py:354,370,...): torch state_dicts with bare backbone keys.
HGNETV2_URLS = {
    arch: "https://github.com/Peterande/storage/releases/download/dfinev1.0/"
          f"PPHGNetV2_{arch}_stage1.pth"
    for arch in ("B0", "B1", "B2", "B3", "B4", "B5", "B6")
}


def load_hgnetv2_pretrained(
    variables,
    arch: str,
    local_model_dir: str = "weight/hgnetv2/",
    download: bool = True,
):
    """Load ImageNet-pretrained stage-1 HGNetv2 weights into the backbone
    subtree (reference hgnetv2.py:490-545: local file first, then URL
    download; here a failed download degrades to a warning instead of
    exit() so air-gapped training can proceed from random init).

    Returns (variables, report); report["missed"] is filtered to backbone
    keys so callers can assert a complete load.
    """
    from pathlib import Path

    path = Path(local_model_dir) / f"PPHGNetV2_{arch}_stage1.pth"
    state = None
    if path.exists():
        state = load_torch_checkpoint_file(str(path))
    elif download:
        try:
            import torch

            sd = torch.hub.load_state_dict_from_url(
                HGNETV2_URLS[arch], map_location="cpu", model_dir=str(local_model_dir)
            )
            state = {k: np.asarray(v) for k, v in sd.items()}
        except Exception as e:  # no egress / bad mirror: warn, keep random init
            import logging

            logging.getLogger(__name__).warning(
                "could not obtain pretrained HGNetv2 %s (%s); download manually "
                "from %s to %s", arch, e, HGNETV2_URLS[arch], local_model_dir,
            )
            return variables, {"error": str(e)}
    if state is None:
        return variables, {"error": f"{path} not found and download disabled"}

    state = {f"backbone.{k}": v for k, v in state.items()}
    params, stats, report = convert_torch_state(
        state, variables["params"], variables["batch_stats"]
    )
    report["missed"] = [
        (col, k) for col, k in report["missed"] if k.startswith("backbone/")
    ]
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out, report
