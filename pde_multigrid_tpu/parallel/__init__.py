"""Multi-chip spatial domain decomposition (SURVEY.md §2.6, §5).

The reference is single-GPU; its thesis sketches multi-GPU sub-grid
splitting as future work.  Here it is a first-class subsystem: grid levels
are sharded along axis 0 over a `jax.sharding.Mesh`, relaxation/transfer
run under `jax.shard_map` with one-cell halo exchange via `lax.ppermute`,
residual norms via `psum`, and coarse levels agglomerate to a replicated
layout once the per-shard extent is too small to shard profitably.
"""
