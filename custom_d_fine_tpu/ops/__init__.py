from . import boxes, deform_attn, fdr

__all__ = ["boxes", "deform_attn", "fdr"]
