#!/usr/bin/env python
"""`fx` launcher: ``python fx.py train_backbone --synthetic ...`` — the
short form the MIGRATION recipes use (the package name is long)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from improving_face_recognition_performance_using_triplet_loss_tpu.cli.__main__ import (  # noqa: E501
    main,
)

if __name__ == "__main__":
    _rc = main()
    # CLI mains return rich objects (states, results) for tests — only an
    # int is a meaningful process exit code
    sys.exit(_rc if isinstance(_rc, int) else 0)
