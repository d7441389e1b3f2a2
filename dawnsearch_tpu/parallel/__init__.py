"""Device-parallel execution: mesh construction, sharded index search.

The TPU-native replacement for the reference's inter-node shard
parallelism (peer-sharded index + UDP query broadcast + top-k merge,
src/net/udp_service.rs:297-330 + src/search/best_results.rs): inside a
pod slice, shards live on devices of a `jax.sharding.Mesh` and the
fan-out/merge is XLA collectives over ICI instead of datagrams.
"""
