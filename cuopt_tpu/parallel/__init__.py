from cuopt_tpu.parallel.sharding import (
    make_mesh,
    shard_problem_and_state,
)

__all__ = ["make_mesh", "shard_problem_and_state"]
