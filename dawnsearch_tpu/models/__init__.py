"""Model family: the all-MiniLM-L6-v2 sentence encoder, TPU-native.

Rebuild of the reference's candle BERT (src/embedding/model.rs, 571 LoC
of per-module tensor code) as a functional JAX forward over a stacked
layer pytree (`lax.scan` over layers), with masked flash attention and
fused mean-pooling on TPU.
"""
