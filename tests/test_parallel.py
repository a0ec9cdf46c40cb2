"""Mesh-sharded extraction (extract.make_sharded_extract_fn) on the
8-virtual-device CPU mesh."""

import numpy as np
import pytest

pytest.importorskip("jax")




def test_sharded_extraction_equals_single_device():
    """make_sharded_extract_fn: batch-axis SPMD extraction over the 8-dev
    mesh equals the single-device forward exactly (bulk Celeb1M extraction
    on a pod; reference extracts on one GPU, extract_feacture_v2.py:50)."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.extract import (
        extract_features,
        make_extract_fn,
        make_sharded_extract_fn,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )

    model = EFMNet342(num_classes=6)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (16, 32, 32, 1)).astype(np.float32)
    labels = (np.arange(16) % 6).astype(np.int64)
    variables = model.init(jax.random.PRNGKey(0), images[:1])

    single = make_extract_fn(model)
    sharded = make_sharded_extract_fn(model)
    l1, f1 = single(variables, images)
    l2, f2 = sharded(variables, images)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-4)

    # the high-level API with a padded final batch
    feats, labs, acc = extract_features(model, variables, images, labels,
                                        batch_size=8, data_parallel=True)
    base, _, acc0 = extract_features(model, variables, images, labels,
                                     batch_size=8)
    np.testing.assert_allclose(feats, base, atol=1e-5)
    assert acc == acc0

    with pytest.raises(ValueError):
        extract_features(model, variables, images, labels,
                         batch_size=12, data_parallel=True)  # 12 % 8 != 0
