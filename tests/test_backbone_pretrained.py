"""HGNetv2 ImageNet-pretrained stage-1 loading (reference hgnetv2.py:490-545).

Builds the actual torch reference backbone, saves its state_dict in the
reference's local-file layout (PPHGNetV2_<arch>_stage1.pth), loads it through
load_hgnetv2_pretrained, and checks (a) zero missed/unmatched backbone keys
and (b) forward parity of the loaded flax backbone vs the torch module.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_d_fine_tpu.models.dfine import build_model
from custom_d_fine_tpu.configs import get_model_config
from custom_d_fine_tpu.models.hgnetv2 import HGNetv2
from custom_d_fine_tpu.utils.torch_convert import load_hgnetv2_pretrained

REF = Path("/root/reference")


@pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted")
def test_load_hgnetv2_pretrained_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo")
    from tools.parity_check import _install_stubs

    _install_stubs()
    sys.path.insert(0, str(REF))
    from src.d_fine.arch.hgnetv2 import HGNetv2 as RefBackbone

    torch.manual_seed(0)
    ref = RefBackbone("B0", use_lab=True, return_idx=[1, 2, 3],
                      freeze_at=-1, freeze_norm=False, pretrained=False)
    ref.eval()
    # de-trivialize BN running stats so stat conversion is exercised
    with torch.no_grad():
        ref(torch.randn(2, 3, 64, 64))
    torch.save(ref.state_dict(), tmp_path / "PPHGNetV2_B0_stage1.pth")

    cfg = get_model_config("s")  # s uses B0
    model, variables = build_model(cfg, num_classes=4, img_size=(320, 320),
                                   train_batch=1)
    loaded, report = load_hgnetv2_pretrained(
        variables, "B0", local_model_dir=str(tmp_path), download=False
    )
    assert "error" not in report
    assert report["missed"] == [], report["missed"][:5]
    assert report["unmatched"] == [], report["unmatched"][:5]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:5]

    # forward parity of the loaded backbone vs torch
    bb = HGNetv2(arch="B0", return_idx=(1, 2, 3), use_lab=True)
    bvars = {"params": loaded["params"]["backbone"],
             "batch_stats": loaded["batch_stats"]["backbone"]}
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    outs = jax.jit(lambda v, x: bb.apply(v, x, train=False))(
        bvars, jnp.asarray(x))
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for o, r in zip(outs, ref_outs):
        r = r.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-4, rtol=1e-3)


def test_load_hgnetv2_pretrained_missing_file_degrades(tmp_path):
    variables = {"params": {}, "batch_stats": {}}
    out, report = load_hgnetv2_pretrained(
        variables, "B0", local_model_dir=str(tmp_path), download=False
    )
    assert "error" in report and out is variables
