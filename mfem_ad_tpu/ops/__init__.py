"""Custom compute kernels (Pallas) for the assembly hot path."""
