"""Loss functions: triplet (gluon/FaceNet semantics), joint id+triplet,
center loss, BEGAN equilibrium losses."""

from .triplet import (  # noqa: F401
    triplet_loss,
    softmax_cross_entropy,
    joint_id_triplet_loss,
)
from .center import center_loss  # noqa: F401
