"""TPU-native face-recognition training & serving framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``joannhsiao/Improving_Face_recognition_Performance_using_Triplet_Loss``
(reference mounted read-only at ``/root/reference``; see ``SURVEY.md``).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

- ``ops``      — MFM/EFM activations, pairwise distance matrices, in-batch
                 negative mining, NMS; pure-JAX reference impls + Pallas kernels.
- ``models``   — LightCNN-9/29 (gluon ladder, 684-d), the 342-d EFM symbol
                 ladder, DeepFace, BEGAN-CS, MTCNN PNet/RNet/ONet.
- ``losses``   — triplet (gluon + FaceNet semantics), joint id+triplet,
                 center loss, BEGAN equilibrium losses.
- ``data``     — positive-pair batch construction, packed record files,
                 feature-store CSV format, synthetic data, LFW pairs.
- ``train``    — jitted/shard_map train steps, optax optimizers with the
                 reference factor schedule, orbax checkpointing, loops.
- ``parallel`` — mesh construction and sharding policies over ICI.
- ``eval``     — cosine-distribution CSV sink + PDF/CDF, LFW 10-fold protocol.
- ``detect``   — MTCNN pyramid cascade + dataset alignment.
- ``serve``    — weight export manifest, gallery matcher, native bindings.
- ``cli``      — 1:1 entry points for the reference scripts.

Import alias: ``import facejax`` maps to this package.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
