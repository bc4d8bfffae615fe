"""Export entry: python -m custom_d_fine_tpu.cli.export [--config cfg] [k=v ...]

Parity target: reference src/dl/export.py:278-338 (export main): produces the
deployable inference artifact(s). Two variants are written (mirroring the
reference's raw + postprocessor-fused ONNX graphs): float32 and, when
export.half, a bfloat16-compute variant.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ..configs.registry import get_model_config
    from ..deploy.export import export_and_verify
    from ..infer.model import JaxModel
    from ..models.dfine import build_model
    from ..utils.config import load_config, resolve_experiment_dir
    from ..utils.logging import logger

    cfg = load_config(args.config, args.overrides)
    t = cfg["train"]
    t["path_to_save"] = resolve_experiment_dir(t["path_to_save"])
    num_classes = len(t["label_to_name"])
    img_size = tuple(t["img_size"])
    task = cfg.get("task", "detect")
    weights = args.weights or str(Path(t["path_to_save"]) / "model")
    max_bs = cfg.get("export", {}).get("max_batch_size", 1)
    out_dir = Path(t["path_to_save"])

    variants = [("float32", None)]
    if cfg.get("export", {}).get("half", False):
        variants.append(("bfloat16", jnp.bfloat16))

    for name, dtype in variants:
        if weights and Path(weights).exists():
            loader = JaxModel(weights, cfg["model_name"], num_classes,
                              img_size=img_size, task=task, dtype=name,
                              smoke_test=False)
            variables = loader.variables
            model = loader.model
        else:
            logger.warning(f"weights not found at {weights}; exporting random init")
            mc = get_model_config(cfg["model_name"],
                                  enable_mask_head=(task == "segment"))
            model, variables = build_model(mc, num_classes=num_classes,
                                           img_size=img_size, train_batch=1,
                                           dtype=dtype)
        path = export_and_verify(
            model, variables, img_size, out_dir / f"model_{name}.stablehlo",
            batch_size=max_bs,
        )
        logger.info(f"Exported + verified: {path}")


if __name__ == "__main__":
    main()
