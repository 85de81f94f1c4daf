from .dsumcheck import (make_mesh, optimal_num_shards, prove_sharded,
                        shard_virtual_poly)

__all__ = ["make_mesh", "optimal_num_shards", "prove_sharded",
           "shard_virtual_poly"]
