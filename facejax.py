"""Ergonomic alias: ``import facejax`` -> the (long-named) real package."""
import sys

import improving_face_recognition_performance_using_triplet_loss_tpu as _pkg

sys.modules[__name__] = _pkg
