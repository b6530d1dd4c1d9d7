"""Device-mesh parallelism: sharded forest build and query over ICI."""
