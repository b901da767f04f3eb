"""Dataset stages: normalize/explode, dedup, politeness schedule,
fused fetch+parse. Each stage is a vectorized ``map_batches`` callable or a
``groupby(...).map_groups`` function over the frontier schema."""
