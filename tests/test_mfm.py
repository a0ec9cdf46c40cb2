"""Unit tests for MFM/EFM activations vs numpy oracles (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import improving_face_recognition_performance_using_triplet_loss_tpu as fx
import improving_face_recognition_performance_using_triplet_loss_tpu.ops.mfm as mfm


def test_efm3_values_match_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 9)).astype(np.float32)
    out = np.asarray(mfm.efm3(jnp.asarray(x)))
    s0, s1, s2 = x[..., 0:3], x[..., 3:6], x[..., 6:9]
    expected = np.concatenate(
        [np.maximum(np.maximum(s0, s1), s2), np.minimum(np.minimum(s0, s1), s2)],
        axis=-1,
    )
    np.testing.assert_allclose(out, expected)


def test_efm3_shape_c_to_two_thirds():
    x = jnp.zeros((2, 8, 8, 99))
    assert mfm.efm3(x).shape == (2, 8, 8, 66)
    assert mfm.mfm_out_channels(99, 3) == 66


def test_mfm2_values_and_shape():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 10)).astype(np.float32)
    out = np.asarray(mfm.mfm2(jnp.asarray(x)))
    expected = np.maximum(x[:, :5], x[:, 5:])
    np.testing.assert_allclose(out, expected)
    assert mfm.mfm_out_channels(10, 2) == 5


def test_mfm_dispatch_matches_reference_mod3_rule():
    # reference group() picks 3-way when num % 3 == 0 else 2-way
    # (efm_symbol.py:68-77)
    x = jnp.ones((1, 12))
    assert mfm.mfm(x, 3).shape == (1, 8)
    assert mfm.mfm(x, 2).shape == (1, 6)


def test_efm3_rejects_bad_channels():
    with pytest.raises(ValueError):
        mfm.efm3(jnp.zeros((1, 10)))
    with pytest.raises(ValueError):
        mfm.mfm2(jnp.zeros((1, 9)))


def test_package_alias():
    import facejax

    assert facejax is fx
