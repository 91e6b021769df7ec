from videovanish_tpu.parallel.sharding import (
    param_sharding_rules, shard_params, batch_sharding,
)

__all__ = ["param_sharding_rules", "shard_params", "batch_sharding"]
