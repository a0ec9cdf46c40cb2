"""Space-to-depth fused stem (VERDICT round-1 item 7): all formulations
must be numerically identical to the unfused conv+maxout+pool baseline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from improving_face_recognition_performance_using_triplet_loss_tpu.ops.s2d_stem import (
    pack_stem_weights,
    reference_stem,
    space_to_depth2,
    stem_conv_maxout_pool,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


def test_space_to_depth_layout():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = space_to_depth2(x)
    assert y.shape == (1, 2, 2, 4)
    # block (0,0): pixels (0,0) (0,1) (1,0) (1,1) in qi*2+qj order
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), [0, 1, 4, 5])
    np.testing.assert_allclose(np.asarray(y[0, 1, 0]), [8, 9, 12, 13])


def test_pack_stem_weights_shape_and_zeros():
    w = _rand((5, 5, 1, 6), 0)
    wp = pack_stem_weights(w)
    assert wp.shape == (3, 3, 4, 24)
    # phase pi=0, qi=1, bi=2 -> di=5 out of range -> zero row
    wp7 = wp.reshape(3, 3, 2, 2, 2, 2, 6)
    np.testing.assert_allclose(np.asarray(wp7[2, :, 1, :, 0, :]), 0.0)


@pytest.mark.parametrize("maxout,c", [(2, 8), (2, 96), (3, 9), (3, 99)])
def test_s2d_stem_matches_reference(maxout, c):
    x = _rand((2, 16, 16, 1), 1)
    w = _rand((5, 5, 1, c), 2, 0.2)
    b = _rand((c,), 3, 0.1)
    got = stem_conv_maxout_pool(x, w, b, maxout=maxout)
    want = reference_stem(x, w, b, maxout=maxout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("maxout,c", [(2, 96), (3, 99)])
def test_pallas_stem_matches_reference(maxout, c):
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas.stem_kernel import (
        stem_conv_maxout_pool_pallas,
    )

    x = _rand((2, 16, 16, 1), 4)
    w = _rand((5, 5, 1, c), 5, 0.2)
    b = _rand((c,), 6, 0.1)
    got = stem_conv_maxout_pool_pallas(x, w, b, maxout=maxout)
    want = reference_stem(x, w, b, maxout=maxout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_s2d_stem_bf16_monotone_rounding():
    """bf16 pipeline: fused (f32 max then cast) == baseline (cast then max)
    because round-to-nearest is monotone."""
    x = _rand((2, 16, 16, 1), 7).astype(jnp.bfloat16)
    w = _rand((5, 5, 1, 32), 8, 0.2).astype(jnp.bfloat16)
    b = _rand((32,), 9, 0.1).astype(jnp.bfloat16)
    got = stem_conv_maxout_pool(x, w, b)
    want = reference_stem(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32),
        np.asarray(want).astype(np.float32), rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("model_name", ["lightcnn9", "lightcnn29",
                                        "efmnet342"])
def test_bf16_train_step_through_stem(model_name):
    """Regression: the stem's training path must differentiate in bf16
    (an explicit f32 accumulate in the conv made jax.grad pair an f32
    cotangent with the bf16 kernel — dtype error)."""
    import numpy as np
    import optax

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli.train_backbone import (
        _model_by_name,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        create_train_state,
        make_backbone_train_step,
    )

    model = _model_by_name(model_name, 4, bf16=True)
    x = np.random.default_rng(0).random((4, 32, 32, 1)).astype(np.float32)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x[:1])
    step = jax.jit(make_backbone_train_step(model, tx))
    _, m = step(state, jnp.asarray(x), jnp.asarray(x),
                jnp.arange(4, dtype=jnp.int32) % 4)
    assert np.isfinite(float(m["loss"]))


def test_stem2_fused_prefix_matches_reference():
    """stem+conv2a fused kernel (stem2_conv_pallas): exact vs the unfused
    two-layer prefix. Kept as a measured exhibit — composed into the full
    network it LOSES 18% end-to-end (docs/DESIGN.md round-2 findings), so
    the models do not use it."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.mfm import (
        mfm2,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas.stem_kernel import (
        stem2_conv_pallas,
    )

    rng = np.random.default_rng(10)
    x = _rand((2, 16, 16, 1), 10)
    w = jnp.asarray(rng.normal(size=(5, 5, 1, 8)), jnp.float32) * 0.3
    b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(1, 1, 4, 12)), jnp.float32) * 0.3
    b2 = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
    got = stem2_conv_pallas(x, w, b, w2, b2)
    stem = reference_stem(x, w, b)
    want = mfm2(jax.lax.conv_general_dilated(
        stem, w2, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
