"""secp256k1_zkp_tpu — a TPU-native secp256k1-zkp primitive library.

Brand-new JAX/Pallas implementation with the capabilities of
BlockstreamResearch/secp256k1-zkp (see SURVEY.md); batched-first API,
sharded multi-scalar multiplication, and bit-exact parity with the
reference's test vectors.
"""
__version__ = "0.1.0"
