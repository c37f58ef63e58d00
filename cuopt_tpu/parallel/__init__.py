from cuopt_tpu.parallel.sharding import (
    hierarchical_psum,
    make_mesh,
    make_mesh_2d,
    shard_problem_and_state,
)

__all__ = ["hierarchical_psum", "make_mesh", "make_mesh_2d",
           "shard_problem_and_state"]
