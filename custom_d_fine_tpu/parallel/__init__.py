from .mesh import make_mesh, shard_batch_spec, replicated_spec, shard_pytree_batch

__all__ = ["make_mesh", "shard_batch_spec", "replicated_spec", "shard_pytree_batch"]
