"""Deployment inference runtime: __call__(BGR image) -> detections.

Parity target: reference src/infer/torch_model.py (Torch_model): letterbox /
resize preprocess (:240-264), device normalize + no-grad forward (:266-302),
full postprocess with per-class conf thresholds, optional class-wise NMS
(:526-597), mask resize/binarize/box-crop (:104-223), mask2poly contour
extraction (:342-375), and the constructor smoke test (_test_pred :81-85).

The exported-artifact variants (ONNX_model/OV_model/TRT_model) collapse into
this one class on TPU: the compiled XLA executable IS the deployment artifact
(optionally AOT-serialized via deploy/export.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from ..configs.registry import get_model_config
from ..data.letterbox import letterbox_image, plain_resize, unletterbox_boxes_abs
from ..ops.postprocess import classwise_nms_padded, topk_detections
from ..utils.logging import logger


def mask_to_polygons(mask: np.ndarray) -> List[np.ndarray]:
    """Binary mask -> external contours (reference torch_model.py:342-375)."""
    cnts, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                               cv2.CHAIN_APPROX_SIMPLE)
    return [c.reshape(-1, 2).astype(np.float32) for c in cnts if len(c) >= 3]


class JaxModel:
    def __init__(
        self,
        model_path: Optional[str],
        model_name: str,
        num_classes: int,
        img_size: Tuple[int, int] = (640, 640),
        task: str = "detect",
        conf_thresh: Union[float, Dict[int, float]] = 0.5,
        keep_ratio: bool = False,
        enable_nms: bool = False,
        nms_iou_thresh: float = 0.6,
        dtype: str = "float32",    # float32 | bfloat16 | int8 (weights)
        msda_impl: str = "serve",  # inference-fast Pallas kernel on TPU
        deploy: bool = True,       # reparam-fuse VGGBlocks (deploy/reparam.py)
        smoke_test: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.img_size = tuple(img_size)
        self.task = task
        self.keep_ratio = keep_ratio
        self.enable_nms = enable_nms
        self.nms_iou_thresh = nms_iou_thresh
        self.num_classes = num_classes
        if isinstance(conf_thresh, dict):
            self.conf = np.full((num_classes,), 0.5, np.float32)
            for k, v in conf_thresh.items():
                self.conf[int(k)] = v
        else:
            self.conf = np.full((num_classes,), float(conf_thresh), np.float32)

        from ..models.dfine import build_model

        cfg = get_model_config(model_name, enable_mask_head=(task == "segment"))
        compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
        from ..ops.deform_attn import resolve_impl

        self.model, variables = build_model(
            cfg, num_classes=num_classes, img_size=self.img_size, train_batch=1,
            dtype=compute_dtype, msda_impl=resolve_impl(msda_impl),
        )
        if model_path:
            variables = self._load_weights(variables, model_path, num_classes)
        if deploy:
            # merge VGGBlock branches into single convs (reference deploy()
            # reparam, dfine.py:30-41) — XLA won't merge two convs itself
            from ..deploy.reparam import convert_to_deploy

            self.model, variables = convert_to_deploy(self.model, variables)
        self.variables = variables

        # canonical serving graph: fused Pallas stem on TPU + approx top-K
        # (+ optional int8 weight quantization with in-graph dequant)
        from ..deploy.serving import make_serving_forward

        self._infer = jax.jit(make_serving_forward(
            self.model, self.variables, self.img_size,
            quantize_int8=(dtype == "int8"),
        ))

        if smoke_test:
            self._test_pred()

    # ----------------------------------------------------------- weights

    def _load_weights(self, variables, path: str, num_classes: int):
        path = Path(path)
        if path.suffix in (".pth", ".pt"):
            from ..utils.torch_convert import (
                convert_torch_state,
                load_torch_checkpoint_file,
                remap_obj365_head,
            )

            state = load_torch_checkpoint_file(str(path))
            state = remap_obj365_head(state, num_classes)
            params, stats, report = convert_torch_state(
                state, variables["params"], variables["batch_stats"]
            )
            logger.info(f"Loaded torch ckpt {path}: "
                        f"{len(report['missed'])} missed, "
                        f"{len(report['unmatched'])} unmatched")
            return {"params": params, "batch_stats": stats}
        # orbax directory (weights saved by the Trainer)
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        tree = {"params": variables["params"], "batch_stats": variables["batch_stats"],
                "ema": {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]},
                "step": 0}
        restored = ckpt.restore(path.absolute(), tree)
        src = restored["ema"] if restored.get("ema") else restored
        return {"params": src["params"], "batch_stats": src["batch_stats"]}

    # ----------------------------------------------------------- pipeline

    def _prepare(self, img_bgr: np.ndarray):
        rgb = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]
        if self.keep_ratio:
            canvas, p = letterbox_image(rgb, self.img_size[0], self.img_size[1],
                                        scaleup=True)
        else:
            canvas, p = plain_resize(rgb, self.img_size[0], self.img_size[1])
        return canvas, p, (h, w)

    def _postprocess_one(self, dets: Dict[str, np.ndarray], p: Dict, orig_hw) -> Dict:
        oh, ow = orig_hw
        boxes = dets["boxes"]
        scores = dets["scores"]
        labels = dets["labels"]
        if p.get("ratio") is not None:
            boxes = unletterbox_boxes_abs(boxes, p, oh, ow)
        else:
            boxes = boxes.copy()
            boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]] / p["ratio_x"], 0, ow)
            boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]] / p["ratio_y"], 0, oh)

        keep = scores >= self.conf[np.clip(labels, 0, self.num_classes - 1)]

        if self.enable_nms:
            # NMS over the STATIC top-K set (one compiled scan, reused for
            # every image) — running it on the post-filter subset would
            # recompile per unique detection count
            import jax.numpy as jnp

            km = np.asarray(classwise_nms_padded(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
                self.nms_iou_thresh,
            ))
            keep = keep & km

        boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
        masks = dets.get("masks")
        if masks is not None:
            masks = masks[keep]

        out = {"labels": labels, "boxes": boxes, "scores": scores}
        if masks is not None and self.task == "segment":
            # mask logits at H/4 -> resize to original -> binarize -> box-crop
            # (reference torch_model.py:104-151,208-223)
            full = []
            for m, b in zip(masks, boxes):
                mm = cv2.resize(m.astype(np.float32), (ow, oh),
                                interpolation=cv2.INTER_LINEAR)
                mm = (mm > 0.5).astype(np.uint8)
                crop = np.zeros_like(mm)
                x1, y1, x2, y2 = (int(v) for v in b)
                crop[max(y1, 0):y2, max(x1, 0):x2] = mm[max(y1, 0):y2, max(x1, 0):x2]
                full.append(crop)
            out["masks"] = np.stack(full) if full else np.zeros((0, oh, ow), np.uint8)
        return out

    def __call__(self, images_bgr: Union[np.ndarray, Sequence[np.ndarray]]) -> List[Dict]:
        """BGR HWC image (or list) -> list of detection dicts (reference
        torch_model.py:327-340)."""
        single = isinstance(images_bgr, np.ndarray) and images_bgr.ndim == 3
        imgs = [images_bgr] if single else list(images_bgr)
        prepared = [self._prepare(im) for im in imgs]
        batch = np.stack([c for c, _, _ in prepared])
        dets = self._infer(self._jnp.asarray(batch))
        dets = {k: np.asarray(v) for k, v in dets.items()}
        results = []
        for i, (_, p, hw) in enumerate(prepared):
            results.append(self._postprocess_one(
                {k: v[i] for k, v in dets.items()}, p, hw))
        return results

    def _test_pred(self):
        """Startup smoke predict (reference torch_model.py:81-85)."""
        dummy = np.zeros((320, 400, 3), np.uint8)
        out = self(dummy)
        assert isinstance(out, list) and "boxes" in out[0]
        logger.info("JaxModel smoke test OK")
