"""Core tensor ops: MFM/EFM activations, distances, mining, NMS."""

from . import mfm as _mfm_mod  # ensure submodule binding wins over re-exports
from .mfm import mfm2, efm3, mfm_out_channels  # noqa: F401
from .distances import (  # noqa: F401
    pairwise_sq_l2,
    pairwise_cosine,
    rowwise_cosine,
    l2_normalize,
)
from .mining import (  # noqa: F401
    mine_random_negative,
    mine_semi_hard_negative,
    mine_hard_negative,
)
