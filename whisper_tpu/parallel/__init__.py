from .mesh import make_mesh
from .pipeline import pp_encode
from .sequence import sp_encode
from .sharding import param_shardings, shard_params

__all__ = ["make_mesh", "param_shardings", "pp_encode", "shard_params", "sp_encode"]
