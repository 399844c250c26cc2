from heatflow_tpu.parallel.sharding import (config_mesh, shard_batch,
                                            batch_step_sharded)

__all__ = ["config_mesh", "shard_batch", "batch_step_sharded"]
