"""Pallas TPU kernels: fused MFM/EFM and fused distance+mining.

Pure-JAX reference implementations in ops/ are the test oracles; these
kernels exist for the hot paths where fusion beats XLA's defaults —
streaming the pairwise-distance matrix through VMEM during mining instead
of materializing it in HBM, and slice-max-min-concat as one VPU pass.
"""

from .front_kernel import (  # noqa: F401
    front9_chain_pallas,
    front9_reference,
    pack_front9_weights,
)
from .mfm_kernel import efm3_pallas  # noqa: F401
from .nms_kernel import (  # noqa: F401
    nms_mask_pallas,
    nms_mask_pallas_batched,
)
from .triplet_kernel import semi_hard_mining_pallas  # noqa: F401
