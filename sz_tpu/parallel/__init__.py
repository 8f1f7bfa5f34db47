"""Multi-device / multi-host parallel compression (sz_omp.c + MPI-chunk
analogs, re-expressed as shard_map over a jax.sharding.Mesh)."""
