"""In-batch negative mining — jit-compatible, no host syncs.

The reference mines negatives with a host-side rejection-sampling loop that
forces a device->host sync per draw (train_efm.py:234-239,
pre-trained_efm_v3.py:202-207 — ``random.randint`` + ``label[j].asscalar()``
until labels differ). The kept semantics are "uniform random in-batch row with
a different label"; here that is expressed as a masked Gumbel-max draw over
the whole batch in one fused op.

Semi-hard mining (the BASELINE.json north-star upgrade over the reference's
uniform sampling) follows the FaceNet definition: among negatives with
d(a,n) > d(a,p), take the closest; if none exists, fall back to the farthest
negative (matching tf.contrib/TFA ``triplet_semihard_loss`` semantics).

All miners take a precomputed anchor->candidate distance/mask view so they
compose with `ops.distances.pairwise_sq_l2` (one MXU matmul) and can be fused
by XLA into the surrounding train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30
_POS_INF = 1e30


def _different_label_mask(anchor_labels: jnp.ndarray, cand_labels: jnp.ndarray) -> jnp.ndarray:
    """[B] x [N] -> [B, N] True where candidate label differs from anchor's."""
    return anchor_labels[:, None] != cand_labels[None, :]


def mine_random_negative(
    key: jax.Array,
    anchor_labels: jnp.ndarray,
    cand_labels: jnp.ndarray,
    num_candidates: int | None = None,
) -> jnp.ndarray:
    """Uniform random candidate index with a different label, per anchor.

    Matches the reference's rejection-sampling semantics (train_efm.py:234-239)
    without the per-draw host sync: a Gumbel-max draw over the valid mask is an
    exact uniform sample over valid entries.

    Args:
      key: PRNG key.
      anchor_labels: [B] int labels of the anchors.
      cand_labels: [N] int labels of the candidate pool rows.
      num_candidates: optionally restrict to the first k pool rows (the
        reference samples only the anchor half at train time, train_efm.py:235,
        and the full anchor+positive batch at valid time, train_efm.py:269).

    Returns:
      [B] int32 indices into the candidate pool. If an anchor has no valid
      negative (all labels equal) the argmax falls back to index 0; callers
      should ensure batches contain >= 2 identities (the reference would
      infinite-loop in that case — a bug not replicated here).
    """
    b = anchor_labels.shape[0]
    n = cand_labels.shape[0]
    mask = _different_label_mask(anchor_labels, cand_labels)
    if num_candidates is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        mask = mask & (col < num_candidates)
    gumbel = jax.random.gumbel(key, (b, n), dtype=jnp.float32)
    scores = jnp.where(mask, gumbel, _NEG_INF)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def mine_semi_hard_negative(
    sq_dists: jnp.ndarray,
    pos_sq_dists: jnp.ndarray,
    anchor_labels: jnp.ndarray,
    cand_labels: jnp.ndarray,
) -> jnp.ndarray:
    """FaceNet semi-hard negative per anchor.

    Args:
      sq_dists: [B, N] anchor->candidate squared L2 distances.
      pos_sq_dists: [B] anchor->positive squared L2 distances.
      anchor_labels: [B]; cand_labels: [N].

    Returns: [B] int32 candidate indices.
    """
    neg_mask = _different_label_mask(anchor_labels, cand_labels)
    semi_mask = neg_mask & (sq_dists > pos_sq_dists[:, None])
    # Closest semi-hard negative.
    semi_d = jnp.where(semi_mask, sq_dists, _POS_INF)
    semi_idx = jnp.argmin(semi_d, axis=-1)
    has_semi = jnp.any(semi_mask, axis=-1)
    # Fallback: farthest (easiest) negative.
    far_d = jnp.where(neg_mask, sq_dists, _NEG_INF)
    far_idx = jnp.argmax(far_d, axis=-1)
    return jnp.where(has_semi, semi_idx, far_idx).astype(jnp.int32)


def mine_hard_negative(
    sq_dists: jnp.ndarray,
    anchor_labels: jnp.ndarray,
    cand_labels: jnp.ndarray,
) -> jnp.ndarray:
    """Hardest (closest) negative per anchor. [B, N] distances -> [B] indices."""
    neg_mask = _different_label_mask(anchor_labels, cand_labels)
    d = jnp.where(neg_mask, sq_dists, _POS_INF)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def gather_rows(pool: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N, D] pool + [B] indices -> [B, D] gathered rows."""
    return jnp.take(pool, idx, axis=0)
