"""Model zoo: LightCNN-9/29, the 342-d EFM symbol ladder, DeepFace,
BEGAN-CS, and MTCNN PNet/RNet/ONet."""

from .lightcnn import LightCNN29, LightCNN9, EFMConv, EFMResBlock  # noqa: F401
from .efm_symbol import EFMNet342  # noqa: F401
from .heads import LinearHead  # noqa: F401
from .deepface import DeepFace, LocallyConnected2D  # noqa: F401
from .began_cs import Generator, AutoencoderDiscriminator, Encoder, Decoder  # noqa: F401
