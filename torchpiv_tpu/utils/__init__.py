"""Utilities: config, persistence, result store, synthetic data, profiling."""

def free_device_memory():
    """Release cached device buffers and compiled-executable caches.

    API-parity counterpart of the reference's ``free_cuda_memory``
    (PIVbackend.py:83-85): under JAX, buffers free with their arrays; this
    clears the jit caches so large executables can be reclaimed between runs.
    """
    import jax

    jax.clear_caches()
