"""Checkpoint-conversion unit tests (utils/torch_convert.py).

The obj365->COCO head remap is differentially verified against the torch
reference's own `adjust_head_parameters` (/root/reference/src/d_fine/
utils.py:92-137) on synthetic obj365-shaped state dicts — the exact weight
transform the reference applies when fine-tuning from the Objects365
pretrained checkpoints.
"""

import sys

import numpy as np
import pytest

from custom_d_fine_tpu.utils.torch_convert import OBJ365_IDS, remap_obj365_head

sys.path.insert(0, "/root/repo/tools")


def _reference_adjust(pretrain_np, cur_np):
    """Run the actual reference adjust_head_parameters on torch tensors."""
    from parity_check import _install_stubs

    _install_stubs()
    import torch

    sys.path.insert(0, "/root/reference")
    from src.d_fine.utils import adjust_head_parameters

    pretrain = {k: torch.from_numpy(v.copy()) for k, v in pretrain_np.items()}
    cur = {k: torch.from_numpy(v.copy()) for k, v in cur_np.items()}
    out = adjust_head_parameters(cur, pretrain)
    return {k: v.numpy() for k, v in out.items()}


@pytest.fixture(scope="module")
def obj365_state():
    """Synthetic obj365-pretrained head state (366 score rows, 367 embed
    rows) + the COCO-shaped current state (80 / 81)."""
    rng = np.random.default_rng(11)
    H = 32  # hidden dim (small for speed; row mapping is dim-independent)
    pre = {"decoder.denoising_class_embed.weight":
           rng.standard_normal((367, H)).astype(np.float32),
           "decoder.enc_score_head.weight":
           rng.standard_normal((366, H)).astype(np.float32),
           "decoder.enc_score_head.bias":
           rng.standard_normal((366,)).astype(np.float32),
           # a non-head key must pass through untouched
           "decoder.query_pos_head.layers.0.weight":
           rng.standard_normal((H, 4)).astype(np.float32)}
    cur = {"decoder.denoising_class_embed.weight":
           rng.standard_normal((81, H)).astype(np.float32),
           "decoder.enc_score_head.weight":
           rng.standard_normal((80, H)).astype(np.float32),
           "decoder.enc_score_head.bias":
           rng.standard_normal((80,)).astype(np.float32),
           "decoder.query_pos_head.layers.0.weight":
           rng.standard_normal((H, 4)).astype(np.float32)}
    for i in range(8):
        pre[f"decoder.dec_score_head.{i}.weight"] = (
            rng.standard_normal((366, H)).astype(np.float32))
        pre[f"decoder.dec_score_head.{i}.bias"] = (
            rng.standard_normal((366,)).astype(np.float32))
        cur[f"decoder.dec_score_head.{i}.weight"] = (
            rng.standard_normal((80, H)).astype(np.float32))
        cur[f"decoder.dec_score_head.{i}.bias"] = (
            rng.standard_normal((80,)).astype(np.float32))
    return pre, cur


def test_obj365_remap_matches_reference(obj365_state):
    pre, cur = obj365_state
    ref = _reference_adjust(pre, cur)
    ours = remap_obj365_head(pre, num_classes=80)

    # size-mismatched denoising embed: reference deletes it (target keeps its
    # own init); ours must drop it too
    assert "decoder.denoising_class_embed.weight" not in ref
    assert "decoder.denoising_class_embed.weight" not in ours

    for k in ref:
        if "score_head" in k:
            assert ours[k].shape == cur[k].shape, k
        np.testing.assert_array_equal(ref[k], ours[k], err_msg=k)


def test_obj365_remap_row_semantics(obj365_state):
    """coco class c <- pretrain row OBJ365_IDS[c] + 1 (reference
    utils.py:100-103)."""
    pre, _ = obj365_state
    ours = remap_obj365_head(pre, num_classes=80)
    w = pre["decoder.enc_score_head.weight"]
    for c in (0, 1, 42, 79):
        np.testing.assert_array_equal(
            ours["decoder.enc_score_head.weight"][c], w[OBJ365_IDS[c] + 1])


def test_obj365_remap_noop_on_matching_shapes(obj365_state):
    """A checkpoint already at the target class count passes through
    unchanged (reference map_class_weights equal-size early return)."""
    _, cur = obj365_state
    out = remap_obj365_head(dict(cur), num_classes=80)
    assert set(out) == set(cur)
    for k in cur:
        np.testing.assert_array_equal(out[k], cur[k])


def test_obj365_remap_matching_embed_kept():
    rng = np.random.default_rng(0)
    st = {"decoder.denoising_class_embed.weight":
          rng.standard_normal((81, 16)).astype(np.float32)}
    out = remap_obj365_head(st, num_classes=80)
    np.testing.assert_array_equal(
        out["decoder.denoising_class_embed.weight"],
        st["decoder.denoising_class_embed.weight"])
