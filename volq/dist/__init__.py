from volq.dist.mesh import make_mesh, AXIS
from volq.dist.sharded import sharded_frame_fn, shard_state, state_specs

__all__ = ["make_mesh", "AXIS", "sharded_frame_fn", "shard_state",
           "state_specs"]
