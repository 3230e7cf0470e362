"""Pallas SR-attention kernel: fallback parity + (TPU-only) kernel parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fusion3dseg_tpu.ops import attention


def _ref(q, k, v):
    D = q.shape[-1]
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32) / np.sqrt(D), k.astype(jnp.float32)
    )
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))


class TestSRAttention:
    def test_fallback_matches_reference(self, rng):
        B, N, H, D, M = 2, 1024, 2, 32, 64
        q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.float32)
        out = attention.sr_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-3
        )

    @pytest.mark.skipif(
        jax.devices()[0].platform != "tpu", reason="pallas kernel needs TPU"
    )
    def test_kernel_matches_reference_on_tpu(self, rng):
        B, N, H, D, M = 2, 2048, 2, 64, 128
        q = jnp.asarray(rng.normal(size=(B, N, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
        out = attention.sr_attention(q, k, v)
        err = np.abs(
            np.asarray(out, np.float32) - np.asarray(_ref(q, k, v))
        ).max()
        assert err < 0.05

    def test_model_flag_runs(self):
        from fusion3dseg_tpu.models import SegFormerConfig, create_model

        cfg = SegFormerConfig(
            num_classes=134, embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 3, 4), decoder_dim=32, dtype=jnp.float32,
            use_pallas_attention=True,
        )
        model, params = create_model(cfg, 0, (64, 64))
        out = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 64, 64, 134)
