"""Hand-written Pallas TPU kernels for the hot ops."""

from stofnet_tpu.ops.pallas.sgb_kernel import (
    sgb_contract_pool,
    pallas_available,
)

__all__ = ["sgb_contract_pool", "pallas_available"]
