from .mesh import make_mesh, shard_batch, shard_image_cols
from .sharded import (halo_exchange_cols, sharded_fast9_score,
                      sharded_tracker_batch_step)

__all__ = ["make_mesh", "shard_batch", "shard_image_cols",
           "halo_exchange_cols", "sharded_fast9_score",
           "sharded_tracker_batch_step"]
