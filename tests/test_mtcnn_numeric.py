"""Numerical validation of the MTCNN JAX nets against a from-scratch numpy
forward (TF conv/pool semantics) — verifies the transcription of
detect_face.py:197-255 independently of JAX."""

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    mtcnn as nets,
)


def np_conv_valid(x, w, b):
    """[B,H,W,Cin] x [kh,kw,Cin,Cout] VALID stride-1 conv."""
    B, H, W, Ci = x.shape
    kh, kw, _, Co = w.shape
    oh, ow = H - kh + 1, W - kw + 1
    out = np.zeros((B, oh, ow, Co), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, i:i + kh, j:j + kw, :].reshape(B, -1)
            out[:, i, j, :] = patch @ w.reshape(-1, Co)
    return out + b


def np_prelu(x, alpha):
    return np.maximum(x, 0) + alpha * np.minimum(x, 0)


def np_maxpool(x, k, s, padding):
    """TF-semantics max pool (SAME: out=ceil(H/s), bottom/right-heavy pad)."""
    B, H, W, C = x.shape
    if padding == "SAME":
        oh = -(-H // s)
        ow = -(-W // s)
        pad_h = max((oh - 1) * s + k - H, 0)
        pad_w = max((ow - 1) * s + k - W, 0)
        x = np.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                       (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
                   constant_values=-np.inf)
    else:
        oh = (H - k) // s + 1
        ow = (W - k) // s + 1
    out = np.zeros((B, oh, ow, C), np.float64)
    for i in range(oh):
        for j in range(ow):
            out[:, i, j, :] = x[:, i * s:i * s + k, j * s:j * s + k, :].max(
                axis=(1, 2))
    return out


def np_softmax(x, axis):
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def _np(params, name, key):
    return np.asarray(params[name][key], np.float64)


def np_pnet(params, x):
    x = np_prelu(np_conv_valid(x, _np(params, "conv1", "weights"),
                               _np(params, "conv1", "biases")),
                 _np(params, "PReLU1", "alpha"))
    x = np_maxpool(x, 2, 2, "SAME")
    x = np_prelu(np_conv_valid(x, _np(params, "conv2", "weights"),
                               _np(params, "conv2", "biases")),
                 _np(params, "PReLU2", "alpha"))
    x = np_prelu(np_conv_valid(x, _np(params, "conv3", "weights"),
                               _np(params, "conv3", "biases")),
                 _np(params, "PReLU3", "alpha"))
    prob = np_softmax(np_conv_valid(x, _np(params, "conv4-1", "weights"),
                                    _np(params, "conv4-1", "biases")), -1)
    reg = np_conv_valid(x, _np(params, "conv4-2", "weights"),
                        _np(params, "conv4-2", "biases"))
    return prob, reg


def np_rnet(params, x):
    x = np_prelu(np_conv_valid(x, _np(params, "conv1", "weights"),
                               _np(params, "conv1", "biases")),
                 _np(params, "prelu1", "alpha"))
    x = np_maxpool(x, 3, 2, "SAME")
    x = np_prelu(np_conv_valid(x, _np(params, "conv2", "weights"),
                               _np(params, "conv2", "biases")),
                 _np(params, "prelu2", "alpha"))
    x = np_maxpool(x, 3, 2, "VALID")
    x = np_prelu(np_conv_valid(x, _np(params, "conv3", "weights"),
                               _np(params, "conv3", "biases")),
                 _np(params, "prelu3", "alpha"))
    x = x.reshape(x.shape[0], -1)
    x = np_prelu(x @ _np(params, "conv4", "weights")
                 + _np(params, "conv4", "biases"),
                 _np(params, "prelu4", "alpha"))
    prob = np_softmax(x @ _np(params, "conv5-1", "weights")
                      + _np(params, "conv5-1", "biases"), -1)
    reg = x @ _np(params, "conv5-2", "weights") + _np(params, "conv5-2",
                                                      "biases")
    return prob, reg


def test_pnet_matches_numpy_oracle():
    params = nets.init_pnet_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 30, 26, 3)).astype(np.float32)
    jp, jr = jax.jit(nets.pnet_forward)(params, jnp.asarray(x))
    np_p, np_r = np_pnet(params, x.astype(np.float64))
    assert jp.shape == np_p.shape
    np.testing.assert_allclose(np.asarray(jp), np_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jr), np_r, rtol=1e-4, atol=1e-5)


def test_rnet_matches_numpy_oracle():
    params = nets.init_rnet_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 24, 24, 3)).astype(np.float32)
    jp, jr = jax.jit(nets.rnet_forward)(params, jnp.asarray(x))
    np_p, np_r = np_rnet(params, x.astype(np.float64))
    np.testing.assert_allclose(np.asarray(jp), np_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jr), np_r, rtol=1e-4, atol=1e-5)
