from .mesh import make_mesh, shard_batch, shard_state, replicate, initialize_distributed

__all__ = ["make_mesh", "shard_batch", "shard_state", "replicate", "initialize_distributed"]
