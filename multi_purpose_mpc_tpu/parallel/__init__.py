"""Fleet parallelism: batch vmap, mesh sharding, multi-chip scale-out."""
