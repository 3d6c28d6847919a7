"""Dataflow operators: spatial joins, tiling, kNN, dedup, similarity,
validation, CDC — each a composition of DataFrame ops + (where the
semantics genuinely require it) a vectorized Arrow UDF."""
