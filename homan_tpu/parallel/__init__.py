"""Device-mesh parallelism: independent clips sharded data-parallel."""
