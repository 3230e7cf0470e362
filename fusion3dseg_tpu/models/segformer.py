"""TPU-native 2D semantic segmentation model (SegFormer-style, Flax).

Stands in the reference's OneFormer slot (reference get2DSeg.py:40-78: an
external detectron2 Swin-L checkpoint producing [133, H, W] semantic logits).
This is a from-scratch hierarchical-transformer segmenter chosen for the TPU
compilation model:

  * Mix-Transformer encoder: 4 stages of overlapping patch-embed convs +
    spatial-reduction attention + MixFFN (depthwise conv) — every hot op a
    large conv/matmul that XLA tiles onto the MXU; no dynamic shapes.
  * All-MLP decoder: per-stage linear projections, bilinear upsampling to a
    common stride-4 grid, fused 1x1 convs -> num_classes logits.
  * bfloat16 activations/params option for inference; logits in float32.

The output contract matches the reference wrapper: `predict` returns
[num_classes, H, W] semantic logits at input resolution; downstream
thresholding (argmax + softmax-confidence -> class 133) lives in
pipeline/get2dseg.py, mirroring get2DSeg.py:111-118.

Scaling: parameters carry logical sharding axes (flax.linen.Partitioned via
nn.with_partitioning) so the training step shards as tensor-parallel over
'tp' (attention heads / FFN hidden) and data-parallel over 'dp' on a
jax.sharding Mesh — see parallel/sharding.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# logical axis names used by nn.with_partitioning; mapped to mesh axes in
# parallel/sharding.py
EMBED = "embed"
HIDDEN = "hidden"  # tensor-parallel axis (heads / ffn hidden)


@dataclasses.dataclass(frozen=True)
class SegFormerConfig:
    num_classes: int = 134  # 133 + unclassified
    # MiT-B0-like by default; scale up via width/depth
    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    decoder_dim: int = 256
    patch_strides: Tuple[int, ...] = (4, 2, 2, 2)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    # decode-head variant: "native" = bias + LayerNorm + GELU (the TPU-
    # friendly default every shipped checkpoint trains with); "hf" = the
    # HF SegformerDecodeHead recipe — bias-free fuse + frozen BatchNorm
    # (running stats held as ordinary params) + ReLU — so a full
    # SegformerForSemanticSegmentation checkpoint transplants end-to-end
    # (models/import_hf.py with include_head=True) and predicts with no
    # fine-tune. Fine-tuning an "hf"-head model keeps the BN statistics
    # frozen (they train as plain params under the optimizer).
    head: str = "native"
    dtype: Any = jnp.bfloat16
    # Opt-in fused Pallas attention (ops/attention.py). Default off: XLA:TPU's
    # own attention fusion measured FASTER at every production shape we ship
    # (0.84 vs 1.03 ms at B2 stage-1, 1.6 vs 2.3 ms at N=M=4096 full
    # attention) — see docs/DESIGN.md. The kernel is kept as the base for
    # future masked/windowed variants XLA cannot fuse.
    use_pallas_attention: bool = False
    # Per-stage neighborhood (sliding-window) attention window; 0 = use the
    # stage's spatial-reduction attention. A NAT stage attends to full-
    # resolution K/V in a window x window neighborhood (no 8x average-pool
    # detail loss) via the fused Pallas kernel
    # (ops/attention.neighborhood_attention) — the windowed variant XLA
    # cannot fuse. E.g. (7, 0, 0, 0) for NAT stage 1.
    nat_windows: Tuple[int, ...] = (0, 0, 0, 0)

    @staticmethod
    def b1() -> "SegFormerConfig":
        """MiT-B1-scale config."""
        return SegFormerConfig(
            embed_dims=(64, 128, 320, 512),
            depths=(2, 2, 2, 2),
            num_heads=(1, 2, 5, 8),
            decoder_dim=256,
        )

    @staticmethod
    def b2() -> "SegFormerConfig":
        """MiT-B2-scale config (the production-size flagship)."""
        return SegFormerConfig(
            embed_dims=(64, 128, 320, 512),
            depths=(3, 4, 6, 3),
            num_heads=(1, 2, 5, 8),
            decoder_dim=768,
        )

    @staticmethod
    def b3() -> "SegFormerConfig":
        return SegFormerConfig(
            embed_dims=(64, 128, 320, 512),
            depths=(3, 4, 18, 3),
            num_heads=(1, 2, 5, 8),
            decoder_dim=768,
        )

    @staticmethod
    def b4() -> "SegFormerConfig":
        return SegFormerConfig(
            embed_dims=(64, 128, 320, 512),
            depths=(3, 8, 27, 3),
            num_heads=(1, 2, 5, 8),
            decoder_dim=768,
        )

    @staticmethod
    def b5() -> "SegFormerConfig":
        return SegFormerConfig(
            embed_dims=(64, 128, 320, 512),
            depths=(3, 6, 40, 3),
            num_heads=(1, 2, 5, 8),
            decoder_dim=768,
        )

    @staticmethod
    def named(name: str) -> "SegFormerConfig":
        """'b0'..'b5' preset lookup (CLI --model; b3-b5 mainly as import
        targets for externally pretrained encoders, models/import_hf.py)."""
        if name == "b0":
            return SegFormerConfig()
        return getattr(SegFormerConfig, name)()


def _dense(features, dtype, name=None, kernel_axes=(None, None)):
    return nn.Dense(
        features,
        dtype=dtype,
        name=name,
        kernel_init=nn.with_partitioning(
            nn.initializers.xavier_uniform(), kernel_axes
        ),
    )


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim,
            (self.patch, self.patch),
            strides=(self.stride, self.stride),
            padding=self.patch // 2,
            dtype=self.dtype,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), (None, None, None, EMBED)
            ),
        )(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class EfficientAttention(nn.Module):
    """Self-attention with spatial-reduction of K/V (SegFormer's SRA), or —
    when nat_window > 0 — sliding-window neighborhood attention over
    full-resolution K/V (fused Pallas kernel on TPU)."""

    dim: int
    heads: int
    sr_ratio: int
    dtype: Any
    use_pallas: bool = False
    nat_window: int = 0

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, C = x.shape
        h, w = hw
        head_dim = self.dim // self.heads

        q = _dense(self.dim, self.dtype, "q", (EMBED, HIDDEN))(x)

        if self.nat_window > 0:
            from fusion3dseg_tpu.ops.attention import neighborhood_attention

            k = _dense(self.dim, self.dtype, "k", (EMBED, HIDDEN))(x)
            v = _dense(self.dim, self.dtype, "v", (EMBED, HIDDEN))(x)
            q = q.reshape(B, N, self.heads, head_dim)
            k = k.reshape(B, N, self.heads, head_dim)
            v = v.reshape(B, N, self.heads, head_dim)
            rt = next(d for d in (16, 12, 8, 6, 4, 3, 2, 1) if h % d == 0)
            out = neighborhood_attention(
                q, k, v, h, w, window=self.nat_window, row_tile=rt
            ).reshape(B, N, self.dim)
            return _dense(self.dim, self.dtype, "proj", (HIDDEN, EMBED))(out)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = x.reshape(B, h, w, C)
            kv_in = nn.Conv(
                self.dim,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                dtype=self.dtype,
                kernel_init=nn.with_partitioning(
                    nn.initializers.xavier_uniform(), (None, None, None, EMBED)
                ),
                name="sr",
            )(kv_in)
            kv_in = kv_in.reshape(B, -1, C)
            kv_in = nn.LayerNorm(dtype=self.dtype)(kv_in)
        k = _dense(self.dim, self.dtype, "k", (EMBED, HIDDEN))(kv_in)
        v = _dense(self.dim, self.dtype, "v", (EMBED, HIDDEN))(kv_in)

        M = kv_in.shape[1]
        q = q.reshape(B, N, self.heads, head_dim)
        k = k.reshape(B, M, self.heads, head_dim)
        v = v.reshape(B, M, self.heads, head_dim)

        if self.use_pallas and N % 512 == 0:
            from fusion3dseg_tpu.ops.attention import sr_attention

            out = sr_attention(q, k, v).reshape(B, N, self.dim)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
                jnp.asarray(head_dim, self.dtype)
            )
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, self.dim)
        return _dense(self.dim, self.dtype, "proj", (HIDDEN, EMBED))(out)


class MixFFN(nn.Module):
    dim: int
    ratio: int
    dtype: Any

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        B, N, C = x.shape
        h, w = hw
        hidden = self.dim * self.ratio
        x = _dense(hidden, self.dtype, "fc1", (EMBED, HIDDEN))(x)
        # 3x3 depthwise conv mixes local position info (SegFormer's
        # positional-encoding-free trick); feature_group_count = channels
        x = x.reshape(B, h, w, hidden)
        x = nn.Conv(
            hidden, (3, 3), padding=1, feature_group_count=hidden,
            dtype=self.dtype, name="dw",
        )(x)
        x = x.reshape(B, N, hidden)
        x = nn.gelu(x)
        return _dense(self.dim, self.dtype, "fc2", (HIDDEN, EMBED))(x)


class Block(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Any
    use_pallas: bool = False
    nat_window: int = 0

    @nn.compact
    def __call__(self, x, hw):
        x = x + EfficientAttention(
            self.dim, self.heads, self.sr_ratio, self.dtype, self.use_pallas,
            self.nat_window,
        )(nn.LayerNorm(dtype=self.dtype)(x), hw)
        x = x + MixFFN(self.dim, self.mlp_ratio, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), hw
        )
        return x


class SegFormer(nn.Module):
    config: SegFormerConfig = SegFormerConfig()

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] float in [0,1]. Returns [B, H, W, num_classes]
        float32 logits at input resolution."""
        cfg = self.config
        x = images.astype(cfg.dtype)
        B, H, W, _ = x.shape

        feats = []
        for s in range(4):
            x = OverlapPatchEmbed(
                cfg.embed_dims[s], cfg.patch_sizes[s], cfg.patch_strides[s],
                cfg.dtype, name=f"patch_embed{s}",
            )(x)
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
            for d in range(cfg.depths[s]):
                x = Block(
                    cfg.embed_dims[s], cfg.num_heads[s], cfg.sr_ratios[s],
                    cfg.mlp_ratio, cfg.dtype, cfg.use_pallas_attention,
                    cfg.nat_windows[s] if s < len(cfg.nat_windows) else 0,
                    name=f"stage{s}_block{d}",
                )(x, (h, w))
            x = nn.LayerNorm(dtype=cfg.dtype)(x)
            x = x.reshape(b, h, w, c)
            feats.append(x)

        # All-MLP decoder: project every stage to decoder_dim, upsample to
        # the stride-4 grid, concat, fuse, classify.
        h4, w4 = feats[0].shape[1:3]
        ups = []
        for s, f in enumerate(feats):
            f = _dense(cfg.decoder_dim, cfg.dtype, f"linear_c{s}", (EMBED, HIDDEN))(f)
            if f.shape[1] != h4:
                f = jax.image.resize(
                    f, (f.shape[0], h4, w4, f.shape[-1]), method="bilinear"
                )
            ups.append(f)
        x = jnp.concatenate(ups[::-1], axis=-1)
        if cfg.head == "hf":
            # HF SegformerDecodeHead parity (decode_head.linear_fuse +
            # batch_norm + ReLU): 1x1 conv == dense over channels, no
            # bias; BatchNorm runs on imported running stats, stored as
            # ordinary params (inference-frozen — exactly eval()-mode
            # torch, which is the only mode an imported head is used in)
            x = nn.Dense(
                cfg.decoder_dim, dtype=cfg.dtype, use_bias=False,
                kernel_init=nn.with_partitioning(
                    nn.initializers.xavier_uniform(), (HIDDEN, EMBED)
                ),
                name="fuse",
            )(x)
            shape = (cfg.decoder_dim,)
            bn_s = self.param("bn_scale", nn.initializers.ones, shape)
            bn_b = self.param("bn_bias", nn.initializers.zeros, shape)
            bn_m = self.param("bn_mean", nn.initializers.zeros, shape)
            bn_v = self.param("bn_var", nn.initializers.ones, shape)
            x = (x.astype(jnp.float32) - bn_m) * (
                bn_s * jax.lax.rsqrt(bn_v + 1e-5)
            ) + bn_b
            x = nn.relu(x).astype(cfg.dtype)
        else:
            x = _dense(cfg.decoder_dim, cfg.dtype, "fuse", (HIDDEN, EMBED))(x)
            x = nn.gelu(nn.LayerNorm(dtype=cfg.dtype)(x))
        logits = nn.Dense(
            cfg.num_classes, dtype=jnp.float32,
            kernel_init=nn.with_partitioning(
                nn.initializers.xavier_uniform(), (EMBED, None)
            ),
            name="classifier",
        )(x)
        # upsample logits to input resolution (bilinear, f32)
        logits = jax.image.resize(
            logits, (B, H, W, cfg.num_classes), method="bilinear"
        )
        return logits


def create_model(
    config: SegFormerConfig = SegFormerConfig(),
    rng: jax.Array | int = 0,
    input_hw: Tuple[int, int] = (512, 512),
):
    """Init a SegFormer; returns (module, params)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = SegFormer(config)
    dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
    # unbox nn.Partitioned wrappers: plain arrays for inference/checkpoints
    # (parallel/sharding.py re-derives the logical specs from a boxed
    # eval_shape trace when sharding for training)
    params = nn.meta.unbox(model.init(rng, dummy)["params"])
    return model, params
