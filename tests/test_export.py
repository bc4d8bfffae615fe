"""AOT export roundtrip: serialize -> deserialize -> numerically identical."""

import numpy as np

from custom_d_fine_tpu.deploy.export import export_and_verify
from custom_d_fine_tpu.models.dfine import build_model

from helpers import tiny_config

IMG = 160


def test_export_roundtrip(tmp_path):
    cfg = tiny_config()
    model, variables = build_model(cfg, num_classes=4, img_size=(IMG, IMG), train_batch=1)
    path = export_and_verify(model, variables, (IMG, IMG),
                             tmp_path / "model.stablehlo", batch_size=1)
    assert path.exists()
    assert path.stat().st_size > 1_000_000  # weights ride along as constants
