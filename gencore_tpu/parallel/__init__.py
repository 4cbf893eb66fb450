from gencore_tpu.parallel.mesh import (
    make_mesh, sharded_consensus_step, stats_psum,
)

__all__ = ["make_mesh", "sharded_consensus_step", "stats_psum"]
