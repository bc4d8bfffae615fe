"""Accuracy-controlled int8 quantization CLI.

Parity target: reference src/dl/ov_int8.py:18-163 (`make ov_int8`): quantize
the trained model with a validation-driven accuracy budget (max F1 drop),
validating with the full detection pipeline.

Usage: python -m custom_d_fine_tpu.cli.quantize_int8 [--config cfg] [k=v ...]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.loader import Loader
    from ..deploy.quantize import (
        dequantize_params,
        quantize_with_accuracy_control,
    )
    from ..eval.validator import Validator
    from ..infer.model import JaxModel
    from ..ops.postprocess import topk_detections
    from ..utils.config import load_config, resolve_experiment_dir
    from ..utils.logging import logger

    cfg = load_config(args.config, args.overrides)
    t = cfg["train"]
    t["path_to_save"] = resolve_experiment_dir(t["path_to_save"])
    label_to_name = {int(k): v for k, v in t["label_to_name"].items()}
    weights = args.weights or str(Path(t["path_to_save"]) / "model")
    max_drop = cfg.get("export", {}).get("ov_int8_max_drop", 0.02)

    runtime = JaxModel(
        weights, cfg["model_name"], len(label_to_name),
        img_size=tuple(t["img_size"]), task=cfg.get("task", "detect"),
        conf_thresh=t.get("conf_thresh", 0.5), keep_ratio=t.get("keep_ratio", False),
        smoke_test=False,
    )
    model = runtime.model
    batch_stats = runtime.variables["batch_stats"]
    H, W = tuple(t["img_size"])

    loader = Loader(
        root_path=Path(t["data_path"]), img_size=(H, W),
        batch_size=t.get("batch_size", 8), num_workers=t.get("num_workers", 4),
        max_gt=t.get("max_gt", 100), keep_ratio=t.get("keep_ratio", False),
    )

    def validate(params_or_q) -> float:
        """Full F1 pipeline on the split (reference ov_int8 validation fn =
        Trainer.preds_postprocess + Validator)."""

        @jax.jit
        def infer(p, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            out = model.apply({"params": dequantize_params(p),
                               "batch_stats": batch_stats}, x, train=False)
            return topk_detections(out["pred_logits"], out["pred_boxes"], 300, (H, W))

        preds, gts = [], []
        for batch in loader.epoch_iterator(args.split, shuffle=False, drop_last=False):
            dets = infer(params_or_q, jnp.asarray(batch["images"]))
            dets = {k: np.asarray(v) for k, v in dets.items()}
            for b in range(batch["images"].shape[0]):
                keep = dets["scores"][b] >= t.get("conf_thresh", 0.5)
                preds.append({"boxes": dets["boxes"][b][keep],
                              "labels": dets["labels"][b][keep],
                              "scores": dets["scores"][b][keep]})
                v = batch["valid"][b]
                gb = batch["boxes"][b][v]
                xyxy = np.stack([
                    (gb[:, 0] - gb[:, 2] / 2) * W, (gb[:, 1] - gb[:, 3] / 2) * H,
                    (gb[:, 0] + gb[:, 2] / 2) * W, (gb[:, 1] + gb[:, 3] / 2) * H,
                ], 1) if len(gb) else np.zeros((0, 4), np.float32)
                gts.append({"boxes": xyxy, "labels": batch["labels"][b][v]})
        val = Validator(gts, preds, label_to_name,
                        conf_thresh=t.get("conf_thresh", 0.5),
                        iou_thresh=t.get("iou_thresh", 0.5), compute_maps=False)
        return val.compute_metrics()["f1"]

    qparams, report = quantize_with_accuracy_control(
        runtime.variables["params"], validate, max_drop=max_drop,
    )
    logger.info(f"int8 quantization report: {json.dumps({k: v for k, v in report.items() if k != 'reverted'})}")

    out_dir = Path(t["path_to_save"]) / "model_int8"
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out_dir.absolute(), {"params": qparams, "batch_stats": batch_stats,
                                   "report": report}, force=True)
    ckpt.wait_until_finished()  # async save must land before interpreter exit
    logger.info(f"Saved int8 model to {out_dir}")


if __name__ == "__main__":
    main()
