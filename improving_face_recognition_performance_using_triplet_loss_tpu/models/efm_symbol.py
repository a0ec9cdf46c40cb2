"""The 342-d EFM "symbol ladder" network — the serving/extraction model.

Transcribes the reference's legacy-Symbol graph builder
(efm_symbol.py:22-110 / mutli_gpu_v3.py:17-100): five ``group`` stages with
the 99/198/387/261/261 ladder and residual counts [0, 1, 2, 3, 4], then
fc1 = Dense(513) -> 3-way EFM -> **342-d** feature (the dimension the whole
downstream stack assumes: extract_feacture_v2.py:48 ``concat29_output``,
Feature.hpp:24 ``fvSize=342``, pre-trained_efm_v3.py:131), Dropout(0.7),
fc2 ID logits.

Each stage k >= 2 is: res_block x tar_num -> 1x1 conv(num_r) -> EFM3 ->
KxK conv(num) -> EFM3 -> maxpool (efm_symbol.py:46-79). Stage 1 has no
residual prefix. Input is 64x64 grayscale in the reference
(efm_symbol.py:287-288); any 32*2^k size works.

The two-stage ``ctx_group`` model-parallel annotation in the reference
(mutli_gpu_v3.py:74-98, constructed but never activated — SURVEY.md §2.1.2)
is subsumed by pjit sharding annotations on the train step; no per-layer
device placement is needed at this model size.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.mfm import efm3
from .lightcnn import EFMResBlock, _maxpool2


class EFMNet342(nn.Module):
    """Symbol-ladder EFM net. Input [B, H, W, 1]; returns (logits, feat342)."""

    num_classes: int
    dtype: Any = jnp.float32
    feature_dim: int = 342  # = 513 * 2 / 3, efm_symbol.py:94-101
    remat: bool = False  # rematerialize res blocks (memonger parity, C27)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        d = self.dtype
        x = x.astype(d)

        # stage 1 (efm_symbol.py:84): conv 5x5 -> 99 -> EFM3 -> pool,
        # s2d-fused at inference (same params either way)
        from .lightcnn import FusedStem

        x = FusedStem(features=99, maxout=3, dtype=d, name="conv1")(
            x, fused=not train)

        # stages 2-5 (efm_symbol.py:85-92): (num_r, num, tar_num)
        res_block_cls = nn.remat(EFMResBlock) if self.remat else EFMResBlock
        ladder = [(99, 198, 1), (198, 387, 2), (387, 261, 3), (261, 261, 4)]
        for si, (num_r, num, tar) in enumerate(ladder, start=2):
            x = res_block_cls(num_blocks=tar, filters=num_r, dtype=d,
                              name=f"stage{si}_res")(x)
            # 1x1 conv(num_r) -> EFM3 (efm_symbol.py:54-60)
            x = nn.Conv(num_r, (1, 1), dtype=d, name=f"stage{si}_conv1x1")(x)
            x = efm3(x)
            # KxK conv(num) -> EFM3 -> pool (efm_symbol.py:65-78)
            x = nn.Conv(num, (3, 3), padding="SAME", dtype=d,
                        name=f"stage{si}_conv")(x)
            x = efm3(x)
            x = _maxpool2(x)

        x = x.reshape((x.shape[0], -1))
        fc1 = nn.Dense(513, dtype=d, name="fc1")(x)      # efm_symbol.py:94
        feat = efm3(fc1)                                  # 342-d "concat29"
        h = nn.Dropout(rate=0.7, deterministic=not train, name="drop1")(feat)
        logits = nn.Dense(self.num_classes, dtype=d, name="fc2")(h)
        return logits.astype(jnp.float32), feat.astype(jnp.float32)
