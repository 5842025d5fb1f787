"""Device compute kernels (JAX/XLA/Pallas).

- ``fbank``    log-mel frontend as GEMM-NDFT (frames @ DFT bases on the MXU)
- ``melbank``  host-side mel filterbank / DFT basis construction
- ``cosine``   batched cosine scoring of embeddings vs profile matrices
- ``eigh``     spectral-clustering eigensolver helpers
"""
