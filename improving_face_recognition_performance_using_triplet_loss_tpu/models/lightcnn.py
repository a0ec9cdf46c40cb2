"""LightCNN embedding networks with MFM/EFM activations (flax.linen, NHWC).

``LightCNN29`` transcribes the reference's gluon ``LightCNN_29``
(reference lightcnn.py:73-133): 5 conv groups with the filter ladder
99/198/387/261/261 and residual-block counts [1, 2, 3, 4], 2x2/2 max-pool
after each group, Dense(1026) -> EFM3 -> BatchNorm = 684-d feature branch,
Dropout(0.7) + Dense(num_classes) = ID branch. Returns ``(logits, feature)``.

``LightCNN9`` is the classic 9-layer LightCNN (MFM-2) used for the
throughput benchmark (BASELINE.json metric: "Face embeddings/sec/chip
(LightCNN-9)"); it has no reference code — built from the LightCNN paper.

TPU-first notes: channel-last layout so the MFM channel slices are lane
slices; convolutions run on the MXU in the configured ``dtype`` (bfloat16 by
default for inference/training compute, float32 params). The channel counts
are kept exactly as the reference for parity; XLA pads lanes to 128 where
needed.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.mfm import efm3, mfm2


class FusedStem(nn.Module):
    """The 5x5 Cin=1 stem conv + maxout + 2x2 pool, space-to-depth fused.

    Param tree is IDENTICAL to ``nn.Conv(features, (5, 5), name=...)``
    (kernel [5,5,1,F] + bias [F], lecun_normal/zeros init), so checkpoints,
    exports, and the native C++ forward are unaffected. At inference on TPU
    with even spatial dims it runs the Pallas fused kernel
    (ops/pallas/stem_kernel.py — conv-as-matmul with the maxout+pool
    epilogue in VMEM, measured 1.4x the unfused stem; tools/perf_stem.py);
    during training, on CPU, or for ineligible shapes it runs the reference
    conv+maxout+pool path with the same params. Numerics are identical
    (monotone-rounding argument in ops/s2d_stem.py tests).
    """

    features: int
    maxout: int = 2  # 2 = mfm2 (LightCNN9), 3 = efm3 (EFM nets)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, fused: bool = True) -> jnp.ndarray:
        import jax

        # kernel Cin follows the input: grayscale is the reference default
        # (train_efm.py:154), 3-channel covers the mutli_gpu_v3 RGB config
        # (mutli_gpu_v3.py:108-109); the fused s2d path is grayscale-only,
        # RGB runs the (channel-generic) reference path with the same
        # param contract
        cin = x.shape[3]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (5, 5, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        x = x.astype(self.dtype)
        h, w, c = x.shape[1], x.shape[2], x.shape[3]
        eligible = (c == 1 and h % 2 == 0 and w % 2 == 0
                    and (x.shape[0] * (h // 2) * (w // 2)) % 8 == 0)
        import os

        # OFF by default: the Pallas stem wins 1.4x in isolation but acts as
        # a fusion/pipelining barrier inside the full scanned network and
        # loses ~4% end-to-end (docs/DESIGN.md round-2 kernel findings).
        # Opt in per-process for single-op workloads.
        if not os.environ.get("FACEJAX_FUSED_STEM"):
            fused = False
        if fused and eligible and jax.default_backend() == "tpu":
            from ..ops.pallas.stem_kernel import stem_conv_maxout_pool_pallas

            return stem_conv_maxout_pool_pallas(x, k, b, maxout=self.maxout)
        from ..ops.s2d_stem import reference_stem

        return reference_stem(x, k, b, maxout=self.maxout)


class EFMConv(nn.Module):
    """Conv + 3-way EFM, with an optional 1x1-conv+EFM pre-stage.

    Mirrors the reference's ``efm`` HybridBlock (lightcnn.py:6-39):
    ``pre_filters > 0`` corresponds to ``efm_type=1`` (1x1 conv -> EFM3 ->
    KxK conv -> EFM3); ``pre_filters == 0`` to ``efm_type=0`` (KxK conv ->
    EFM3 only).
    """

    filters: int                       # reference num_filter1 (main conv)
    pre_filters: int = 0               # reference num_filter (1x1 pre-conv)
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pre_filters > 0:
            x = nn.Conv(self.pre_filters, (1, 1), dtype=self.dtype, name="pre_conv")(x)
            x = efm3(x)
        x = nn.Conv(
            self.filters,
            tuple(self.kernel),
            strides=tuple(self.strides),
            padding=self.padding,
            dtype=self.dtype,
            name="conv",
        )(x)
        return efm3(x)


class FusedEFMStem(nn.Module):
    """group1-compatible wrapper: FusedStem under a child named ``conv`` so
    the param tree matches ``EFMConv(name="group1")`` exactly."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, fused: bool = True) -> jnp.ndarray:
        return FusedStem(self.features, maxout=3, dtype=self.dtype,
                         name="conv")(x, fused=fused)


class EFMResBlock(nn.Module):
    """Residual EFM block chain (reference ``res_block``, lightcnn.py:41-71).

    Each of ``num_blocks`` iterations: EFM3 -> 3x3 conv(filters) -> EFM3 ->
    3x3 conv(filters*2/3) -> + identity. Channel-preserving: input/output
    channels are ``filters * 2 // 3``.

    Documented deviation (default): distinct weights per iteration — the
    standard LightCNN-29 design, matching the author's OWN symbol variant
    (efm_symbol.py:49-53 creates ``conv{L}{i}_res`` per block). The gluon
    original instead REUSES one conv pair for all iterations
    (lightcnn.py:48-49 create conv_op_1/conv_op_2 once; the
    hybrid_forward loop :54-71 applies them ``num_blocks`` times) — almost
    certainly an oversight (SURVEY.md §2.3 semantics-vs-bug rule), but
    reproducible here with ``share_weights=True`` for exact gluon-behavior
    parity.
    """

    num_blocks: int
    filters: int
    dtype: Any = jnp.float32
    share_weights: bool = False  # True = the gluon original's reuse

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = (self.filters * 2) // 3
        assert x.shape[-1] == out_ch, (
            f"EFMResBlock(filters={self.filters}) expects {out_ch} input "
            f"channels, got {x.shape[-1]}"
        )
        if self.share_weights:
            conv_a = nn.Conv(self.filters, (3, 3), padding="SAME",
                             dtype=self.dtype, name="conv_a")
            conv_b = nn.Conv(out_ch, (3, 3), padding="SAME",
                             dtype=self.dtype, name="conv_b")
        for i in range(self.num_blocks):
            if self.share_weights:
                ca, cb = conv_a, conv_b
            else:
                ca = nn.Conv(self.filters, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"conv_a_{i}")
                cb = nn.Conv(out_ch, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"conv_b_{i}")
            h = efm3(x)
            h = ca(h)
            h = efm3(h)
            h = cb(h)
            x = x + h
        return x


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class LightCNN29(nn.Module):
    """LightCNN-29 with 3-way EFM; 684-d feature + ID logits.

    Input: [B, H, W, 1] grayscale in [0, 1] (reference trains at 128x128,
    train_efm.py:154-155). Returns ``(logits [B, num_classes],
    feature [B, 684])`` matching lightcnn.py:120-133's ``(out, fc1_out)``.
    """

    num_classes: int
    dtype: Any = jnp.float32
    feature_dim: int = 684  # = 1026 * 2 / 3, lightcnn.py:111,123-128
    remat: bool = False  # rematerialize res blocks (memonger parity, C27)
    # True reproduces the gluon original's conv reuse across residual
    # iterations (lightcnn.py:48-49 + :54-71; see EFMResBlock docstring)
    gluon_shared_res: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        res_block_cls = nn.remat(EFMResBlock) if self.remat else EFMResBlock
        # group 1 (lightcnn.py:82-83): 5x5 conv 99 -> EFM -> pool, s2d-fused
        # at inference (training uses the same params on the unfused path —
        # the Pallas kernel carries no VJP)
        x = FusedEFMStem(features=99, dtype=d, name="group1")(
            x, fused=not train)
        # groups 2-5 (lightcnn.py:86-107)
        ladder = [  # (res_blocks, res_filters, pre_filters, conv_filters)
            (1, 99, 99, 198),
            (2, 198, 198, 387),
            (3, 387, 387, 261),
            (4, 261, 261, 261),
        ]
        for gi, (nres, rf, pf, cf) in enumerate(ladder, start=2):
            x = res_block_cls(num_blocks=nres, filters=rf, dtype=d,
                              share_weights=self.gluon_shared_res,
                              name=f"group{gi}_res")(x)
            x = EFMConv(filters=cf, pre_filters=pf, kernel=(3, 3), dtype=d,
                        name=f"group{gi}_conv")(x)
            x = _maxpool2(x)

        x = x.reshape((x.shape[0], -1))
        fc1 = nn.Dense(1026, dtype=d, name="fc1")(x)
        feat = efm3(fc1)  # 684-d (lightcnn.py:123-128)
        # Feature branch: BatchNorm (lightcnn.py:113-114); momentum matches
        # gluon's default 0.9 (flax defaults to 0.99)
        feat_out = nn.BatchNorm(use_running_average=not train, dtype=d,
                                momentum=0.9, name="fc1_bn")(feat)
        # ID branch: Dropout(0.7) + Dense (lightcnn.py:116-118)
        h = nn.Dropout(rate=0.7, deterministic=not train, name="fc2_drop")(feat)
        logits = nn.Dense(self.num_classes, dtype=d, name="fc2")(h)
        return logits.astype(jnp.float32), feat_out.astype(jnp.float32)


class LightCNN9(nn.Module):
    """Classic 9-layer LightCNN (MFM-2), 256-d feature; benchmark model.

    Architecture per the LightCNN paper (no reference code; named in
    BASELINE.json's metric). Input [B, 128, 128, 1].
    """

    num_classes: int
    dtype: Any = jnp.float32
    feature_dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        d = self.dtype
        x = x.astype(d)

        def conv_mfm(x, ch, k, name):
            x = nn.Conv(ch, (k, k), padding="SAME", dtype=d, name=name)(x)
            return mfm2(x)

        # stem conv+mfm+pool, s2d-fused at inference (same params either way)
        x = FusedStem(features=96, maxout=2, dtype=d, name="conv1")(
            x, fused=not train)
        x = conv_mfm(x, 96, 1, "conv2a")
        x = conv_mfm(x, 192, 3, "conv2")
        x = _maxpool2(x)
        x = conv_mfm(x, 192, 1, "conv3a")
        x = conv_mfm(x, 384, 3, "conv3")
        x = _maxpool2(x)
        x = conv_mfm(x, 384, 1, "conv4a")
        x = conv_mfm(x, 256, 3, "conv4")
        x = conv_mfm(x, 256, 1, "conv5a")
        x = conv_mfm(x, 256, 3, "conv5")
        x = _maxpool2(x)

        x = x.reshape((x.shape[0], -1))
        fc1 = nn.Dense(512, dtype=d, name="fc1")(x)
        feat = mfm2(fc1)  # 256-d
        h = nn.Dropout(rate=0.7, deterministic=not train, name="fc2_drop")(feat)
        logits = nn.Dense(self.num_classes, dtype=d, name="fc2")(h)
        return logits.astype(jnp.float32), feat.astype(jnp.float32)
