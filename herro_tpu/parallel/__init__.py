from .mesh import data_sharding, init_distributed, make_mesh, replicated

__all__ = ["data_sharding", "init_distributed", "make_mesh", "replicated"]
