from imagestitch_tpu.parallel.mesh import make_mesh, shard_hint, data_sharding

__all__ = [
    "make_mesh",
    "shard_hint",
    "data_sharding",
    "stitch_pairs_batched",
    "stitch_pairs_sharded",
    "stitch_chain_pano",
    "stitch_chain_pano_sharded",
    "stitch_pair_hostseam_sharded",
]


def __getattr__(name):
    # lazy: parallel.batch imports the pipeline, which (via geometry.ransac's
    # shard hints) imports parallel.mesh — eager re-export would be circular
    if name in ("stitch_pairs_batched", "stitch_pairs_sharded"):
        from imagestitch_tpu.parallel import batch
        return getattr(batch, name)
    if name in ("stitch_chain_pano", "stitch_chain_pano_sharded",
                "stitch_pair_hostseam_sharded"):
        from imagestitch_tpu.parallel import pano
        return getattr(pano, name)
    raise AttributeError(name)
