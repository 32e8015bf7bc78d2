from .mesh import ShardedWoStSolver, make_mesh

__all__ = ["ShardedWoStSolver", "make_mesh"]
