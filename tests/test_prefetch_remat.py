"""Device prefetch + rematerialization options (C27 memonger parity,
input-pipeline overlap)."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.data.prefetch import (
    prefetch_to_device,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    EFMNet342,
)


def test_prefetch_preserves_order_and_content():
    batches = [(np.full((2, 3), i, np.float32), np.full((2,), i, np.int64))
               for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, (a, l) in enumerate(out):
        assert isinstance(a, jax.Array)
        np.testing.assert_allclose(np.asarray(a), i)
        np.testing.assert_allclose(np.asarray(l), i)


def test_prefetch_short_iterator():
    out = list(prefetch_to_device(iter([(np.ones(2),)]), size=4))
    assert len(out) == 1


def test_remat_model_same_values_and_grads():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    plain = EFMNet342(num_classes=3)
    remat = EFMNet342(num_classes=3, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    lo1, f1 = plain.apply(variables, x)
    lo2, f2 = remat.apply(variables, x)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5)

    def loss(v, model):
        _, f = model.apply(v, x)
        return jnp.sum(f ** 2)

    g1 = jax.grad(loss)(variables, plain)
    g2 = jax.grad(loss)(variables, remat)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
