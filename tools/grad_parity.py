"""Gradient-level train-step parity: this framework vs the torch reference.

The missing link between loss-VALUE parity (tools/criterion_parity.py, 25/25
terms on identical inputs) and the quality-level convergence A/B
(tools/trained_parity.py eval_conv): load the SAME trained weights into both
frameworks, feed the SAME batch + targets, run one full training forward +
backward (model in train mode, criterion, total-loss sum as the reference's
train loop does, src/dl/train.py:563-575), and compare the gradient of every
parameter. The torch gradients are mapped to the flax tree with the exact
same conversion machinery used for weights (utils/torch_convert.py) — a
gradient has the same shape/layout as its parameter, so OIHW->HWIO etc. apply
identically.

CDN denoising is disabled (num_denoising=0) on both sides for this check:
the reference's noise RNG (torch.rand_like) cannot be replayed in JAX, and
box_noise_scale=0 is a NameError in the reference
(arch/utils.py:416-433 only defines input_query_bbox_unact under noise>0).
The CDN path is covered by structural parity tests (tests/test_denoising.py)
and jointly by the convergence A/B.

Weights: the trained torch checkpoint from the convergence A/B
(/tmp/trained_parity_conv.pth, created by `trained_parity.py
train_torch_conv`) — random-init weights collapse activations through
LayerNorm and make gradient comparison numerically meaningless
(see tools/parity_check.py methodology note).

Run: python tools/grad_parity.py [n_images]
"""

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

from parity_check import _install_stubs
from trained_parity import CONV_CKPT, DS, IMG, NUM_CLASSES, SIZE, load_split, make_dataset


def main(n_images=4):
    _install_stubs()
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(1)
    sys.path.insert(0, "/root/reference")
    from src.d_fine.configs import models as ref_models
    from src.d_fine.dfine import build_loss, build_model

    # ---- shared batch: trained-checkpoint val images (well-separated
    # objects -> unique Hungarian optimum on both sides) ----
    if not DS.exists():
        make_dataset()
    images, targets = load_split("val")
    images, targets = images[:n_images], targets[:n_images]

    # ---- torch arm ----
    ref_models[SIZE]["DFINETransformer"]["num_denoising"] = 0
    model = build_model(SIZE, num_classes=NUM_CLASSES, enable_mask_head=False,
                        device="cpu", img_size=[IMG, IMG])
    from pathlib import Path

    assert Path(CONV_CKPT).exists(), (
        f"{CONV_CKPT} missing - run tools/trained_parity.py train_torch_conv first")
    sd = torch.load(CONV_CKPT, map_location="cpu", weights_only=False)
    # checkpoint was trained WITH CDN; this check runs num_denoising=0, which
    # removes only the denoising class embedding from the module tree
    sd.pop("decoder.denoising_class_embed.weight", None)
    model.load_state_dict(sd)
    crit = build_loss(SIZE, num_classes=NUM_CLASSES, label_smoothing=0.0,
                      enable_mask_head=False)
    model.train()
    x = torch.from_numpy(images.transpose(0, 3, 1, 2)).contiguous()
    tg = [{"labels": torch.from_numpy(t["labels"]),
           "boxes": torch.from_numpy(t["boxes"])} for t in targets]
    out = model(x, targets=tg)
    losses_t = crit(out, tg)
    total_t = sum(losses_t.values())
    total_t.backward()
    # gradient "state_dict": params -> .grad (None => unused => zeros);
    # buffers (BN running stats) -> zeros so convert_torch_state sees the
    # full reference key set
    named_params = dict(model.named_parameters())
    grad_state = {}
    for name, t in model.state_dict().items():
        p = named_params.get(name)
        if p is not None and p.grad is not None:
            grad_state[name] = p.grad.detach().numpy().copy()
        else:
            grad_state[name] = np.zeros(t.shape, np.float32)
    weight_state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    print(f"torch: loss={float(total_t):.5f}", flush=True)

    # ---- jax arm ----
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.models.dfine import build_model as build_jax
    from custom_d_fine_tpu.train.criterion import DFINECriterion
    from custom_d_fine_tpu.utils.torch_convert import convert_torch_state

    cfg = get_model_config(SIZE)
    cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
        cfg.decoder, num_denoising=0))
    jmodel, variables = build_jax(cfg, num_classes=NUM_CLASSES,
                                  img_size=(IMG, IMG), train_batch=n_images)
    params0, stats0, rep = convert_torch_state(
        weight_state, variables["params"], variables["batch_stats"])
    assert not rep["unmatched"] and not rep["shape_mismatch"], rep
    grads_t, _, _ = convert_torch_state(
        grad_state, variables["params"], variables["batch_stats"])

    criterion = DFINECriterion(cfg.criterion, cfg.matcher,
                               num_classes=NUM_CLASSES,
                               num_queries=cfg.decoder.num_queries)
    G = max(len(t["labels"]) for t in targets)
    B = n_images
    labels = np.zeros((B, G), np.int32)
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    for i, t in enumerate(targets):
        n = len(t["labels"])
        labels[i, :n] = t["labels"]
        boxes[i, :n] = t["boxes"]
        valid[i, :n] = True
    jtargets = {"labels": jnp.asarray(labels), "boxes": jnp.asarray(boxes),
                "valid": jnp.asarray(valid)}

    def loss_fn(params):
        outputs, _ = jmodel.apply(
            {"params": params, "batch_stats": stats0},
            jnp.asarray(images), targets=jtargets, train=True,
            rngs={"dn": jax.random.PRNGKey(0)}, mutable=["batch_stats"])
        losses = criterion(outputs, jtargets)
        return jnp.sum(jnp.stack(list(losses.values()))), losses

    (total_j, losses_j), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(params0)
    print(f"jax:   loss={float(total_j):.5f}", flush=True)

    # ---- compare ----
    import flax

    ft = flax.traverse_util.flatten_dict(grads_t, sep="/")
    fj = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, grads_j), sep="/")
    assert set(ft) == set(fj), (set(ft) ^ set(fj))
    rows = []
    g_t_all, g_j_all = [], []
    for k in sorted(ft):
        gt, gj = np.asarray(ft[k], np.float64), np.asarray(fj[k], np.float64)
        nt, njx = np.linalg.norm(gt), np.linalg.norm(gj)
        g_t_all.append(gt.ravel())
        g_j_all.append(gj.ravel())
        if nt < 1e-12 and njx < 1e-12:
            continue  # both (near) zero: unused / frozen leaf
        rel = np.linalg.norm(gt - gj) / max(nt, njx)
        cos = float(gt.ravel() @ gj.ravel() / max(nt * njx, 1e-30))
        rows.append((rel, cos, k, nt, njx))
    rows.sort(reverse=True)
    gt_all = np.concatenate(g_t_all)
    gj_all = np.concatenate(g_j_all)
    global_rel = np.linalg.norm(gt_all - gj_all) / np.linalg.norm(gt_all)
    global_cos = float(gt_all @ gj_all /
                       (np.linalg.norm(gt_all) * np.linalg.norm(gj_all)))
    loss_rel = abs(float(total_t) - float(total_j)) / abs(float(total_t))

    print("\nworst leaves by relative L2:")
    for rel, cos, k, nt, njx in rows[:12]:
        print(f"  rel={rel:.2e} cos={cos:+.6f} |t|={nt:.3e} |j|={njx:.3e}  {k}")
    result = {
        "loss_torch": float(total_t), "loss_jax": float(total_j),
        "loss_rel_err": loss_rel,
        "grad_global_rel_l2": float(global_rel),
        "grad_global_cosine": global_cos,
        "n_leaves_compared": len(rows),
        "worst_leaf_rel": rows[0][0] if rows else 0.0,
        "n_leaves_rel_gt_1pct": sum(1 for r in rows if r[0] > 0.01),
    }
    print(json.dumps(result, indent=2))
    # Contract: losses within 0.1%, global gradient within 1% relative L2 and
    # cosine > 0.9999 (fp32 CPU, different reduction orders; the matcher
    # assignment must be identical for this to hold at all).
    ok = loss_rel < 1e-3 and global_rel < 0.01 and global_cos > 0.9999
    print("grad parity:", "PASS" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sys.exit(0 if main(n) else 1)
