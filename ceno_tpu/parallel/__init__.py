from .dsumcheck import make_mesh, prove_sharded, shard_virtual_poly

__all__ = ["make_mesh", "prove_sharded", "shard_virtual_poly"]
