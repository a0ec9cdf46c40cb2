"""Center loss (reference facenet.py:64-77, Wen et al. ECCV'16).

The TF reference mutates a non-trainable ``centers`` variable in-place via
``scatter_sub``; the JAX-native form threads the centers table through the
step explicitly (functional state).
"""

from __future__ import annotations

import jax.numpy as jnp


def center_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    centers: jnp.ndarray,
    alfa: float = 0.95,
):
    """Compute center loss and the updated centers table.

    Args:
      features: [B, D] embeddings.
      labels: [B] int class ids.
      centers: [num_classes, D] current centers.
      alfa: update momentum (reference semantics: centers -= (1-alfa)*diff).

    Returns: (loss scalar, new_centers [num_classes, D]).
    """
    labels = labels.astype(jnp.int32)
    centers_batch = jnp.take(centers, labels, axis=0)          # [B, D]
    diff = (1.0 - alfa) * (centers_batch - features)
    new_centers = centers.at[labels].add(-diff)
    loss = jnp.mean(jnp.square(features - centers_batch))
    return loss, new_centers
