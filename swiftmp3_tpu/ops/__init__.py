"""Device-side numeric core: batched granule DSP as JAX/XLA/Pallas programs.

`reference.py` holds the numpy golden implementation (the algorithmic spec,
mirroring the reference encoder's op order); the sibling modules implement the
same math as batched fixed-shape jnp programs for TPU, validated against the
golden outputs (integer-exact for quantized values, gains and bit counts).
"""
