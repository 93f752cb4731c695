from tpuseg.parallel.spatial import spatial_shard_apply, halo_exchange

__all__ = ["spatial_shard_apply", "halo_exchange"]
