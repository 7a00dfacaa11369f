from . import xla_kernels, pallas_kernels, skew

__all__ = ["xla_kernels", "pallas_kernels", "skew"]
