"""Shape/behavior tests for the embedding models (SURVEY.md §4: de-risk the
channel-ladder transcription of lightcnn.py:80-111 / efm_symbol.py:84-105)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    EFMNet342,
    LightCNN29,
    LightCNN9,
)


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_lightcnn29_shapes(key):
    model = LightCNN29(num_classes=17)
    x = jnp.zeros((2, 128, 128, 1))
    variables = model.init(key, x)
    logits, feat = model.apply(variables, x)
    assert logits.shape == (2, 17)
    assert feat.shape == (2, 684)  # 1026 * 2/3 (lightcnn.py:111,123-128)


def test_lightcnn29_train_mode_mutates_batchstats_and_dropout(key):
    model = LightCNN29(num_classes=5)
    x = jax.random.normal(key, (2, 64, 64, 1))
    variables = model.init(key, x)
    (logits, feat), mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert logits.shape == (2, 5)
    # dropout branch only affects logits, not the feature branch
    (logits2, feat2), _ = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat2), rtol=1e-6)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_efmnet342_shapes(key):
    model = EFMNet342(num_classes=11)
    x = jnp.zeros((2, 64, 64, 1))  # reference input size (efm_symbol.py:287)
    variables = model.init(key, x)
    logits, feat = model.apply(variables, x)
    assert logits.shape == (2, 11)
    assert feat.shape == (2, 342)  # fvSize=342 (Feature.hpp:24)


def test_efmnet342_works_at_128(key):
    model = EFMNet342(num_classes=3)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init(key, x)
    logits, feat = model.apply(variables, x)
    assert feat.shape == (1, 342)


def test_lightcnn9_shapes(key):
    model = LightCNN9(num_classes=7)
    x = jnp.zeros((2, 128, 128, 1))
    variables = model.init(key, x)
    logits, feat = model.apply(variables, x)
    assert logits.shape == (2, 7)
    assert feat.shape == (2, 256)


def test_models_jit_and_bf16(key):
    model = LightCNN9(num_classes=4, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 1))
    variables = model.init(key, x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    logits, feat = fwd(variables, x)
    # outputs are cast back to f32 at the boundary
    assert logits.dtype == jnp.float32 and feat.dtype == jnp.float32
