"""Triplet and joint losses.

``triplet_loss`` implements the form shared by ``mxnet.gluon.loss.TripletLoss``
(used at train_efm.py:210, pre-trained_efm_v3.py:183) and the FaceNet loss
(reference facenet.py:44-62):

    L_i = max( sum_d (a_id - p_id)^2 - sum_d (a_id - n_id)^2 + margin, 0 )

The reference's joint objective (train_efm.py:241-243) is
``softmaxCE(logits_anchor, labels_anchor) + alpha * TL(normalized a/p/n)``
with alpha = 0.1 and margin 0.2; the head-only path uses margin 0.5 on
unnormalized head outputs (pre-trained_efm_v3.py:177,183).

Note on reference fidelity: train_efm.py:241 normalizes by the *global*
tensor norm (``anc / mx.nd.norm(anc)`` is a scalar norm over the whole
[B, D] matrix — and two of the three calls are the ``mx.nd.nrom`` typo that
crashes; SURVEY.md §2.3). The intended behavior is per-row L2 normalization,
which is what ``normalize=True`` does here. This deviation is deliberate and
documented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.distances import l2_normalize


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 0.2,
    normalize: bool = False,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Triplet loss over [B, D] embeddings; gluon/FaceNet semantics."""
    if normalize:
        anchor = l2_normalize(anchor)
        positive = l2_normalize(positive)
        negative = l2_normalize(negative)
    pos_d = jnp.sum(jnp.square(anchor - positive), axis=-1)
    neg_d = jnp.sum(jnp.square(anchor - negative), axis=-1)
    per_ex = jnp.maximum(pos_d - neg_d + margin, 0.0)
    if reduction == "mean":
        return jnp.mean(per_ex)
    if reduction == "none":
        return per_ex
    raise ValueError(f"unknown reduction {reduction!r}")


def softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean"
) -> jnp.ndarray:
    """Sparse softmax CE (gluon.loss.SoftmaxCrossEntropyLoss semantics,
    train_efm.py:211)."""
    logz = jax.nn.log_softmax(logits, axis=-1)
    per_ex = -jnp.take_along_axis(logz, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if reduction == "mean":
        return jnp.mean(per_ex)
    if reduction == "none":
        return per_ex
    raise ValueError(f"unknown reduction {reduction!r}")


def joint_id_triplet_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 0.2,
    alpha: float = 0.1,
    normalize_embeddings: bool = True,
):
    """``id_CE + alpha * triplet`` (train_efm.py:241-243).

    ``logits``/``labels`` are the anchor half only (the reference computes CE
    on ``output[0:B]``, train_efm.py:242). Returns (total, id_loss, tl_loss).
    """
    id_loss = softmax_cross_entropy(logits, labels)
    tl = triplet_loss(anchor, positive, negative, margin=margin,
                      normalize=normalize_embeddings)
    return id_loss + alpha * tl, id_loss, tl
