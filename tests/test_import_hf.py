"""HF SegFormer weight importer: mapping correctness + encoder equivalence.

Uses a RANDOM-initialized transformers SegformerForSemanticSegmentation (no
downloads) as the source checkpoint: if the transplanted encoder reproduces
the torch encoder's stage outputs on the same input, the name/transpose
mapping is right for any real checkpoint with this architecture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fusion3dseg_tpu.models import SegFormer  # noqa: E402
from fusion3dseg_tpu.models.import_hf import (  # noqa: E402
    config_from_hf, params_from_hf_segformer,
)


@pytest.fixture(scope="module")
def hf_pair():
    hf_cfg = transformers.SegformerConfig(
        num_encoder_blocks=4, depths=[1, 2, 1, 1], hidden_sizes=[8, 16, 24, 32],
        num_attention_heads=[1, 2, 3, 4], sr_ratios=[8, 4, 2, 1],
        strides=[4, 2, 2, 2], patch_sizes=[7, 3, 3, 3],
        decoder_hidden_size=32, num_labels=10,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0, drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, num_classes=10, dtype=jnp.float32)
    model = SegFormer(cfg)
    import flax.linen as nn

    template = nn.meta.unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    )
    params = params_from_hf_segformer(
        hf_model.state_dict(), cfg, params_template=template
    )
    return hf_model, model, cfg, params, template


class TestMapping:
    def test_transplant_exact(self, hf_pair):
        hf_model, _, _, params, _ = hf_pair
        sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
        # dense: transposed
        np.testing.assert_array_equal(
            params["stage0_block0"]["EfficientAttention_0"]["q"]["kernel"],
            sd["segformer.encoder.block.0.0.attention.self.query.weight"].T)
        # conv: [out,in,kh,kw] -> [kh,kw,in,out]
        np.testing.assert_array_equal(
            params["patch_embed0"]["Conv_0"]["kernel"],
            sd["segformer.encoder.patch_embeddings.0.proj.weight"
               ].transpose(2, 3, 1, 0))
        # depthwise conv
        np.testing.assert_array_equal(
            params["stage0_block0"]["MixFFN_0"]["dw"]["kernel"],
            sd["segformer.encoder.block.0.0.mlp.dwconv.dwconv.weight"
               ].transpose(2, 3, 1, 0))
        # stage norms
        np.testing.assert_array_equal(
            params["LayerNorm_2"]["scale"],
            sd["segformer.encoder.layer_norm.2.weight"])
        # decoder projections transplanted when widths match
        np.testing.assert_array_equal(
            params["linear_c1"]["kernel"],
            sd["decode_head.linear_c.1.proj.weight"].T)

    def test_decoder_head_not_transplanted(self, hf_pair):
        _, _, _, params, template = hf_pair
        # fuse/classifier stay at template init (HF's BN+ReLU head is
        # architecturally different — transplanting would be wrong)
        np.testing.assert_array_equal(
            params["classifier"]["kernel"], template["classifier"]["kernel"])
        np.testing.assert_array_equal(
            params["fuse"]["kernel"], template["fuse"]["kernel"])

    def test_missing_key_raises(self, hf_pair):
        hf_model, _, cfg, _, _ = hf_pair
        sd = dict(hf_model.state_dict())
        sd.pop("segformer.encoder.block.0.0.attention.self.query.weight")
        with pytest.raises(KeyError, match="query"):
            params_from_hf_segformer(sd, cfg)

    def test_geometry_mismatch_raises(self, hf_pair):
        hf_model, model, cfg, _, template = hf_pair
        import dataclasses

        bad = dataclasses.replace(cfg, embed_dims=(8, 16, 24, 48))
        with pytest.raises((ValueError, KeyError)):
            params_from_hf_segformer(
                hf_model.state_dict(), bad, params_template=template)


class TestEncoderEquivalence:
    def test_stage_outputs_match_torch(self, hf_pair):
        hf_model, model, cfg, params, _ = hf_pair
        rng = np.random.default_rng(3)
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            hf_out = hf_model.segformer(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                output_hidden_states=True,
            )
        _, inter = model.apply(
            {"params": params}, jnp.asarray(x), capture_intermediates=True)
        inter = inter["intermediates"]
        for s, hs in enumerate(hf_out.hidden_states):
            theirs = hs.numpy()  # [B, C, h, w]
            B, C, h, w = theirs.shape
            ours = np.asarray(inter[f"LayerNorm_{s}"]["__call__"][0])
            ours = ours.reshape(B, h, w, C).transpose(0, 3, 1, 2)
            # not bit-exact: HF LN eps 1e-5 vs flax 1e-6, erf vs tanh GELU
            err = np.abs(ours - theirs).max()
            scale = np.abs(theirs).max()
            assert err < 0.02 * scale + 1e-3, (s, err, scale)


class TestInferConfig:
    def test_geometry_read_from_weights(self, hf_pair):
        from fusion3dseg_tpu.models.import_hf import (
            infer_config_from_state_dict,
        )

        hf_model, _, cfg, _, _ = hf_pair
        got = infer_config_from_state_dict(
            hf_model.state_dict(), num_classes=10, dtype=jnp.float32)
        assert got.embed_dims == cfg.embed_dims
        assert got.depths == cfg.depths
        assert got.sr_ratios == cfg.sr_ratios
        assert got.patch_sizes == cfg.patch_sizes
        assert got.mlp_ratio == cfg.mlp_ratio
        assert got.decoder_dim == cfg.decoder_dim
