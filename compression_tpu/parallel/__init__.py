"""Parallel & pipelined execution: DP training, halo-sharded convs,
host/device coding pipelines, CHARM slice pipelining."""

from compression_tpu.parallel.data_parallel import (
    make_dp_step,
    make_mesh,
    shard_batch,
)
from compression_tpu.parallel.charm_sharded import ShardedCharmCodec

__all__ = ["make_dp_step", "make_mesh", "shard_batch", "ShardedCharmCodec"]
