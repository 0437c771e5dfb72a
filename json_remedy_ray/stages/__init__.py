"""Ray Data batch stages (map_batches functions / actor-pool classes)."""
