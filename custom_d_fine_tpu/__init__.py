"""custom_d_fine_tpu: a TPU-native (JAX/XLA/Pallas) D-FINE detection/segmentation framework.

Re-designed from scratch for TPU hardware with the capabilities of the
ArgoHA/custom_d_fine reference (PyTorch/CUDA). Compute path is JAX/Flax with
Pallas kernels for the hot deformable-attention op; parallelism is expressed
via jax.sharding.Mesh + GSPMD instead of DDP/NCCL.
"""

__version__ = "0.1.0"
