"""Ray Data batch transforms: vectorized ``map_batches`` fns + actor classes."""
