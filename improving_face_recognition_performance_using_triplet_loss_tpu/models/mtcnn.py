"""MTCNN PNet/RNet/ONet in JAX (pure functions over param pytrees).

Architectures transcribed from the vendored facenet definitions (reference
detect_face.py:197-255): VALID convs + per-channel PReLU + SAME/VALID max
pools, dual/triple heads (face prob softmax, box regression, and 5-point
landmarks on ONet). Param dicts use the det1/det2/det3.npy layout
({layer: {weights, biases | alpha}}) so original converted-Caffe weights
load directly via ``load_npy_params``; ``init_*_params`` provide random
initialization when the .npy files are absent.

PNet is fully convolutional: any [B, H, W, 3] input yields
[B, (H-10)//2, (W-10)//2] maps (conv VALID three times + one SAME 2x2/2
pool), exactly the TF graph's geometry.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, dict[str, jnp.ndarray]]


def _conv(x, p, stride=1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, p["weights"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["biases"]


def _prelu(x, p):
    alpha = p["alpha"]
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def _maxpool(x, k, s, padding):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), padding)


def _fc(x, p):
    x = x.reshape((x.shape[0], -1))
    return x @ p["weights"] + p["biases"]


def pnet_forward(params: Params, x: jnp.ndarray):
    """[B, H, W, 3] -> (prob [B, H', W', 2], reg [B, H', W', 4])."""
    x = _prelu(_conv(x, params["conv1"]), params["PReLU1"])
    x = _maxpool(x, 2, 2, "SAME")
    x = _prelu(_conv(x, params["conv2"]), params["PReLU2"])
    x = _prelu(_conv(x, params["conv3"]), params["PReLU3"])
    prob = jax.nn.softmax(_conv(x, params["conv4-1"]), axis=-1)
    reg = _conv(x, params["conv4-2"])
    return prob, reg


def rnet_forward(params: Params, x: jnp.ndarray):
    """[B, 24, 24, 3] -> (prob [B, 2], reg [B, 4])."""
    x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
    x = _maxpool(x, 3, 2, "SAME")
    x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
    x = _maxpool(x, 3, 2, "VALID")
    x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
    x = _prelu(_fc(x, params["conv4"]), params["prelu4"])
    prob = jax.nn.softmax(_fc(x, params["conv5-1"]), axis=-1)
    reg = _fc(x, params["conv5-2"])
    return prob, reg


def onet_forward(params: Params, x: jnp.ndarray):
    """[B, 48, 48, 3] -> (prob [B, 2], reg [B, 4], landmarks [B, 10])."""
    x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
    x = _maxpool(x, 3, 2, "SAME")
    x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
    x = _maxpool(x, 3, 2, "VALID")
    x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
    x = _maxpool(x, 2, 2, "SAME")
    x = _prelu(_conv(x, params["conv4"]), params["prelu4"])
    x = _prelu(_fc(x, params["conv5"]), params["prelu5"])
    prob = jax.nn.softmax(_fc(x, params["conv6-1"]), axis=-1)
    reg = _fc(x, params["conv6-2"])
    landmarks = _fc(x, params["conv6-3"])
    return prob, reg, landmarks


# ---------- parameter construction ----------

_PNET_SPEC = [
    ("conv1", "conv", (3, 3, 3, 10)), ("PReLU1", "prelu", 10),
    ("conv2", "conv", (3, 3, 10, 16)), ("PReLU2", "prelu", 16),
    ("conv3", "conv", (3, 3, 16, 32)), ("PReLU3", "prelu", 32),
    ("conv4-1", "conv", (1, 1, 32, 2)), ("conv4-2", "conv", (1, 1, 32, 4)),
]
_RNET_SPEC = [
    ("conv1", "conv", (3, 3, 3, 28)), ("prelu1", "prelu", 28),
    ("conv2", "conv", (3, 3, 28, 48)), ("prelu2", "prelu", 48),
    ("conv3", "conv", (2, 2, 48, 64)), ("prelu3", "prelu", 64),
    ("conv4", "fc", (3 * 3 * 64, 128)), ("prelu4", "prelu", 128),
    ("conv5-1", "fc", (128, 2)), ("conv5-2", "fc", (128, 4)),
]
_ONET_SPEC = [
    ("conv1", "conv", (3, 3, 3, 32)), ("prelu1", "prelu", 32),
    ("conv2", "conv", (3, 3, 32, 64)), ("prelu2", "prelu", 64),
    ("conv3", "conv", (3, 3, 64, 64)), ("prelu3", "prelu", 64),
    ("conv4", "conv", (2, 2, 64, 128)), ("prelu4", "prelu", 128),
    ("conv5", "fc", (3 * 3 * 128, 256)), ("prelu5", "prelu", 256),
    ("conv6-1", "fc", (256, 2)), ("conv6-2", "fc", (256, 4)),
    ("conv6-3", "fc", (256, 10)),
]


def _init_from_spec(key: jax.Array, spec) -> Params:
    params: Params = {}
    for name, kind, shape in spec:
        key, sub = jax.random.split(key)
        if kind == "prelu":
            params[name] = {"alpha": jnp.full((shape,), 0.25, jnp.float32)}
        else:
            fan_in = int(np.prod(shape[:-1]))
            w = jax.random.normal(sub, shape, jnp.float32) / np.sqrt(fan_in)
            params[name] = {"weights": w,
                            "biases": jnp.zeros((shape[-1],), jnp.float32)}
    return params


def init_pnet_params(key: jax.Array) -> Params:
    return _init_from_spec(key, _PNET_SPEC)


def init_rnet_params(key: jax.Array) -> Params:
    return _init_from_spec(key, _RNET_SPEC)


def init_onet_params(key: jax.Array) -> Params:
    return _init_from_spec(key, _ONET_SPEC)


def load_npy_params(path_or_dict: Any) -> Params:
    """Load a det{1,2,3}.npy weights dict (facenet layout,
    detect_face.py:77-89: {layer: {param_name: array}})."""
    if isinstance(path_or_dict, (str, bytes)):
        data = np.load(path_or_dict, encoding="latin1",
                       allow_pickle=True).item()
    else:
        data = path_or_dict
    params: Params = {}
    for layer, entries in data.items():
        params[layer] = {k: jnp.asarray(np.asarray(v)) for k, v in
                         entries.items()}
    return params
