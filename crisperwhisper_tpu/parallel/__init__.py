from .mesh import (data_sharding, make_mesh, param_pspecs, replicated,
                   shard_params)

__all__ = ["data_sharding", "make_mesh", "param_pspecs", "replicated",
           "shard_params"]
