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


def test_efm_res_block_gluon_weight_sharing():
    """share_weights=True reproduces the gluon original's conv REUSE across
    residual iterations (reference lightcnn.py:48-49 create one conv pair;
    the loop :54-71 applies it num_blocks times) — one param pair per
    group, and the forward equals manually iterating the shared pair."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.models.lightcnn import (
        EFMResBlock,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.mfm import (
        efm3,
    )

    blk = EFMResBlock(num_blocks=3, filters=99, share_weights=True)
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 66)).astype(np.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    assert set(variables["params"]) == {"conv_a", "conv_b"}  # ONE pair
    out = blk.apply(variables, x)

    # manual iteration with the same shared pair
    import flax.linen as nn

    ca = nn.Conv(99, (3, 3), padding="SAME")
    cb = nn.Conv(66, (3, 3), padding="SAME")
    t = jnp.asarray(x)
    for _ in range(3):
        h = efm3(t)
        h = ca.apply({"params": variables["params"]["conv_a"]}, h)
        h = efm3(h)
        h = cb.apply({"params": variables["params"]["conv_b"]}, h)
        t = t + h
    np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-5)

    # default stays the distinct-weights design (the symbol variant's and
    # the published LightCNN-29's semantics)
    blk_d = EFMResBlock(num_blocks=3, filters=99)
    v_d = blk_d.init(jax.random.PRNGKey(0), x)
    assert set(v_d["params"]) == {"conv_a_0", "conv_b_0", "conv_a_1",
                                  "conv_b_1", "conv_a_2", "conv_b_2"}


def test_lightcnn29_gluon_shared_res_flag():
    """LightCNN29(gluon_shared_res=True): each group holds ONE res conv
    pair (the gluon checkpoint's parameter count), and the model still
    runs."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN29,
    )

    model = LightCNN29(num_classes=5, gluon_shared_res=True)
    x = np.zeros((1, 32, 32, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    for gi in range(2, 6):
        assert set(variables["params"][f"group{gi}_res"]) == {
            "conv_a", "conv_b"}
    logits, feat = model.apply(variables, x, train=False,
                               mutable=False)
    assert feat.shape == (1, 684)


def test_efm_models_accept_rgb_input():
    """The mutli_gpu_v3 configuration feeds 3x128x128 RGB into the same EFM
    trio (mutli_gpu_v3.py:108-109); the stem's kernel Cin follows the
    input, so RGB trains/extracts with the identical ladder."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
        LightCNN29,
    )

    for cls, fdim in ((EFMNet342, 342), (LightCNN29, 684)):
        model = cls(num_classes=5)
        x = np.random.default_rng(0).uniform(
            0, 1, (2, 32, 32, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        stem = [leaf for path, leaf in flat
                if "kernel" in str(path) and leaf.ndim == 4
                and leaf.shape[:2] == (5, 5)]
        assert stem[0].shape[2] == 3  # Cin follows the input
        logits, feat = model.apply(variables, x, train=False)
        assert feat.shape == (2, fdim)
        assert np.isfinite(np.asarray(feat)).all()
