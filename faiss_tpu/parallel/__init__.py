"""Multi-chip distribution: mesh sharding, sharded search, shard merges."""
