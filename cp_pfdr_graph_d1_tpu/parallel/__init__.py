from .dp import (DistDenseOp, ShardedQuadraticProblem,
                 pfdr_quadratic_d1_sharded, shard_quadratic_problem)
from .halo import (ColShardDenseOp, HaloStencilGraphD1,
                   pfdr_quadratic_d1_halo, shard_stencil_problem)
from .mesh import make_mesh

__all__ = ["DistDenseOp", "ShardedQuadraticProblem", "make_mesh",
           "pfdr_quadratic_d1_sharded", "shard_quadratic_problem",
           "ColShardDenseOp", "HaloStencilGraphD1",
           "pfdr_quadratic_d1_halo", "shard_stencil_problem"]
