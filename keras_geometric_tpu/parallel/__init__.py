"""Distribution tier: mesh construction, edge partitioning, halo exchange."""
