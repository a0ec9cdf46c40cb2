"""Face detection: MTCNN pyramid cascade + dataset alignment."""

from .pipeline import MTCNNDetector, detect_faces  # noqa: F401
