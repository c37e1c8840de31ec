from .mesh import get_mesh, shard_params, shard_batch, param_pspec_tree  # noqa: F401
