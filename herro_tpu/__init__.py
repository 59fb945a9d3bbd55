"""herro_tpu — TPU-native haplotype-aware error correction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference HERRO pipeline (all-vs-all overlaps -> window pileups -> transformer
scoring of supported columns -> consensus decoding), designed TPU-first:
static-shape bucketed batches, bfloat16 MXU compute, data-parallel meshes via
``jax.sharding``, and on-device consensus counting.
"""

__version__ = "0.1.0"
