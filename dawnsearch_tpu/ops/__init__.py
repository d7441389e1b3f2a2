"""L0 compute primitives: vector math, quantization, top-k.

TPU-first equivalents of the reference's src/search/vector.rs and
src/search/best_results.rs — batched jnp ops instead of scalar loops.
"""
