"""Custom compute kernels (Pallas) for the assembly hot path."""

from .fused_jacobian import (  # noqa: F401
    element_jacobian_via_pallas,
    fused_element_jacobian,
    supports_fused,
)
