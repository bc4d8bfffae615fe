"""Loss-value parity: this criterion vs the torch reference criterion.

Feeds IDENTICAL model outputs and targets (random floats — matching optimum is
unique, so both Hungarian solvers find the same assignment) to the reference
DFINECriterion (torch, from /root/reference) and to train/criterion.py, and
compares every shared loss term: vfl, bbox, giou, fgl, ddf across the
final / aux / pre / enc output sets.

Denoising terms are excluded: the reference builds its dn structure inside the
model forward with torch RNG; dn LOSS functions are identical code paths to
the aux ones and are covered by their parity here.

Run: python tools/criterion_parity.py [size]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

from parity_check import _install_stubs


def main(size="m", B=3, Q=60, C=5, L=4, tie_free=False):
    """tie_free=True: all output sets share the same predictions, so every
    per-set matching is identical and the GO-union pair counts have NO ties.
    The reference breaks GO count-ties with an UNSTABLE torch.argsort
    (dfine_criterion.py:582) — nondeterministic — so exact GO parity is only
    well-defined in the tie-free regime; per-set (vfl) terms must match in
    both regimes."""
    _install_stubs()
    import torch

    sys.path.insert(0, "/root/reference")
    from src.d_fine.configs import models as ref_models
    from src.d_fine.matcher import HungarianMatcher as RefMatcher
    from src.d_fine.dfine_criterion import DFINECriterion as RefCriterion

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from custom_d_fine_tpu.configs import get_model_config
    from custom_d_fine_tpu.train.criterion import DFINECriterion

    mc = dict(ref_models[size])
    reg_max = mc["DFINECriterion"]["reg_max"]
    K1 = reg_max + 1
    rng = np.random.default_rng(0)

    # ---- identical random outputs ----
    n_gts = [3, 1, 5][:B]
    G = 8  # padded capacity (mine)

    def rand_set():
        return {
            "pred_logits": rng.normal(size=(B, Q, C)).astype(np.float32),
            "pred_boxes": np.concatenate([
                rng.uniform(0.2, 0.8, (B, Q, 2)), rng.uniform(0.05, 0.3, (B, Q, 2))
            ], -1).astype(np.float32),
            "pred_corners": rng.normal(size=(B, Q, 4 * K1)).astype(np.float32),
        }

    if tie_free:
        one = rand_set()
        sets = [dict(one) for _ in range(L)]
        pre_set = dict(one)
        enc_set = dict(one)
    else:
        sets = [rand_set() for _ in range(L)]        # L-1 aux + final
    ref_points = np.concatenate([
        rng.uniform(0.3, 0.7, (B, Q, 2)), rng.uniform(0.1, 0.3, (B, Q, 2))
    ], -1).astype(np.float32)                         # constant across layers
    if not tie_free:
        pre_set = rand_set()
        enc_set = rand_set()

    tgt_labels = [rng.integers(0, C, n).astype(np.int64) for n in n_gts]
    tgt_boxes = [np.concatenate([
        rng.uniform(0.3, 0.7, (n, 2)), rng.uniform(0.05, 0.25, (n, 2))
    ], -1).astype(np.float32) for n in n_gts]

    # ---- torch side ----
    tt = lambda x: torch.from_numpy(np.asarray(x))
    up_t = torch.tensor([0.5])
    scale_t = torch.tensor([float(mc["DFINETransformer"]["reg_scale"])])

    def t_set(s, with_teacher=True):
        d = {"pred_logits": tt(s["pred_logits"]), "pred_boxes": tt(s["pred_boxes"]),
             "pred_corners": tt(s["pred_corners"]), "ref_points": tt(ref_points),
             "up": up_t, "reg_scale": scale_t}
        if with_teacher:
            d["teacher_corners"] = tt(sets[-1]["pred_corners"])
            d["teacher_logits"] = tt(sets[-1]["pred_logits"])
        return d

    t_out = t_set(sets[-1], with_teacher=False)
    t_out["aux_outputs"] = [t_set(s) for s in sets[:-1]]
    t_out["pre_outputs"] = {"pred_logits": tt(pre_set["pred_logits"]),
                            "pred_boxes": tt(pre_set["pred_boxes"])}
    t_out["enc_aux_outputs"] = [{"pred_logits": tt(enc_set["pred_logits"]),
                                 "pred_boxes": tt(enc_set["pred_boxes"])}]
    t_out["enc_meta"] = {"class_agnostic": False}
    t_targets = [{"labels": tt(l), "boxes": tt(b)} for l, b in zip(tgt_labels, tgt_boxes)]

    matcher = RefMatcher(**mc["matcher"])
    ref_crit = RefCriterion(matcher, num_classes=C, label_smoothing=0.0,
                            **mc["DFINECriterion"])
    with torch.no_grad():
        t_losses = {k: float(v) for k, v in ref_crit(t_out, t_targets).items()}

    # ---- jax side (padded) ----
    def pad_targets():
        labels = np.zeros((B, G), np.int32)
        boxes = np.zeros((B, G, 4), np.float32)
        valid = np.zeros((B, G), bool)
        for i, (l, b) in enumerate(zip(tgt_labels, tgt_boxes)):
            labels[i, :len(l)] = l
            boxes[i, :len(l)] = b
            valid[i, :len(l)] = True
        return {"labels": jnp.asarray(labels), "boxes": jnp.asarray(boxes),
                "valid": jnp.asarray(valid)}

    def j_set(s, with_teacher=True):
        d = {"pred_logits": jnp.asarray(s["pred_logits"]),
             "pred_boxes": jnp.asarray(s["pred_boxes"]),
             "pred_corners": jnp.asarray(s["pred_corners"]),
             "ref_points": jnp.asarray(ref_points)}
        if with_teacher:
            d["teacher_corners"] = jnp.asarray(sets[-1]["pred_corners"])
            d["teacher_logits"] = jnp.asarray(sets[-1]["pred_logits"])
        return d

    j_out = j_set(sets[-1], with_teacher=False)
    j_out["up"] = jnp.asarray(0.5, jnp.float32)
    j_out["reg_scale"] = jnp.asarray(float(mc["DFINETransformer"]["reg_scale"]))
    j_out["aux_outputs"] = [j_set(s) for s in sets[:-1]]
    j_out["pre_outputs"] = {"pred_logits": jnp.asarray(pre_set["pred_logits"]),
                            "pred_boxes": jnp.asarray(pre_set["pred_boxes"])}
    j_out["enc_aux_outputs"] = [{"pred_logits": jnp.asarray(enc_set["pred_logits"]),
                                 "pred_boxes": jnp.asarray(enc_set["pred_boxes"])}]
    j_out["enc_meta"] = {"class_agnostic": False}

    cfg = get_model_config(size)
    crit = DFINECriterion(cfg.criterion, cfg.matcher, num_classes=C, num_queries=Q)
    j_losses = {k: float(v) for k, v in crit(j_out, pad_targets()).items()}

    shared = sorted(set(t_losses) & set(j_losses))
    only_t = sorted(set(t_losses) - set(j_losses))
    only_j = sorted(set(j_losses) - set(t_losses))
    print(f"shared terms: {len(shared)}; torch-only: {only_t}; jax-only: {only_j}")
    ok = True
    for k in shared:
        a, b = t_losses[k], j_losses[k]
        rel = abs(a - b) / (abs(a) + 1e-9)
        # GO-dependent terms (bbox/giou/fgl/ddf on the union indices) are only
        # exactly comparable in the tie-free regime (see docstring)
        go_term = any(t in k for t in ("bbox", "giou", "fgl", "ddf"))
        tol = 2e-3 if (tie_free or not go_term) else 0.25
        status = "OK" if rel < tol else "FAIL"
        if status == "FAIL" or rel > 1e-3:
            print(f"  {k:>22}: torch {a:.6f} jax {b:.6f} rel {rel:.2e} {status}")
        ok &= status == "OK"
    print(("TIE-FREE " if tie_free else "") + "CRITERION PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    size = sys.argv[1] if len(sys.argv) > 1 else "m"
    rc1 = main(size, tie_free=True)
    rc2 = main(size, tie_free=False)
    raise SystemExit(rc1 or rc2)
