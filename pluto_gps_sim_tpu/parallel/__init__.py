from .mesh import factor_devices, make_mesh
from .shard import shard_channel_params, synth_sharded

__all__ = ["factor_devices", "make_mesh", "shard_channel_params",
           "synth_sharded"]
