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

    def test_with_head_reads_num_labels(self, hf_pair):
        from fusion3dseg_tpu.models.import_hf import (
            infer_config_from_state_dict,
        )

        hf_model, _, _, _, _ = hf_pair
        got = infer_config_from_state_dict(
            hf_model.state_dict(), with_head=True, dtype=jnp.float32)
        assert got.head == "hf"
        assert got.num_classes == 10  # the checkpoint's own num_labels


class TestFullModelEquivalence:
    """VERDICT r4 #3: --with-head transplants the WHOLE
    SegformerForSemanticSegmentation (bias-free fuse + frozen BatchNorm +
    ReLU + classifier) so a real-imagery checkpoint predicts with no
    fine-tune. Equivalence is through final LOGITS at input resolution
    (torch logits come out at stride 4 and are bilinearly upsampled with
    the same align_corners=False convention jax.image.resize uses)."""

    @pytest.fixture(scope="class")
    def head_pair(self, hf_pair):
        from fusion3dseg_tpu.models.import_hf import (
            config_from_hf, params_from_hf_segformer,
        )

        hf_model, _, _, _, _ = hf_pair
        # make BN stats non-trivial — random init's mean-0/var-1 would
        # hide a stats-mapping bug entirely
        torch.manual_seed(7)
        with torch.no_grad():
            hf_model.decode_head.batch_norm.running_mean.uniform_(-0.5, 0.5)
            hf_model.decode_head.batch_norm.running_var.uniform_(0.5, 2.0)
        cfg = config_from_hf(hf_model.config, dtype=jnp.float32,
                             with_head=True)
        model = SegFormer(cfg)
        import flax.linen as nn

        template = nn.meta.unbox(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)))["params"])
        params = params_from_hf_segformer(
            hf_model.state_dict(), cfg, params_template=template,
            include_head=True)
        return hf_model, model, cfg, params

    def test_logits_match_torch(self, head_pair):
        hf_model, model, cfg, params = head_pair
        rng = np.random.default_rng(11)
        x = rng.random((2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            t = hf_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits
            t = torch.nn.functional.interpolate(
                t, size=(64, 64), mode="bilinear", align_corners=False
            ).numpy()
        ours = np.asarray(
            model.apply({"params": params}, jnp.asarray(x))
        ).transpose(0, 3, 1, 2)
        err = np.abs(ours - t).max()
        scale = np.abs(t).max()
        # measured 6e-7 relative on this configuration; the loose bar
        # absorbs erf-vs-tanh GELU and LN-eps drift at bigger widths
        assert err < 0.02 * scale + 1e-3, (err, scale)
        agree = (ours.argmax(1) == t.argmax(1)).mean()
        assert agree >= 0.999, agree

    def test_snapshot_drops_into_segmenter2d(self, head_pair, tmp_path):
        """The import-hf --with-head product: an npz whose recorded
        config (head='hf', checkpoint taxonomy) Segmenter2D rebuilds
        without the caller passing any architecture — and whose masks
        match the torch model's."""
        from fusion3dseg_tpu.pipeline.get2dseg import (
            Segmenter2D, checkpoint_config, save_params_npz,
        )

        hf_model, model, cfg, params = head_pair
        p = tmp_path / "imported.npz"
        save_params_npz(p, params, input_hw=(64, 64), config=cfg)
        got = checkpoint_config(p)
        assert got == cfg
        seg = Segmenter2D(checkpoint_dir=p)  # NO config/input_hw passed
        assert seg.config.head == "hf"
        assert seg.config.num_classes == 10
        assert seg.input_hw == (64, 64)
        rng = np.random.default_rng(5)
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        sem = seg.predict_batch(img[None], conf_threshold=0.0)[0]
        with torch.no_grad():
            t = hf_model(torch.from_numpy(
                (img.astype(np.float32) / 255.0)[None].transpose(0, 3, 1, 2)
            )).logits
            t = torch.nn.functional.interpolate(
                t, size=(64, 64), mode="bilinear", align_corners=False)
            t_sem = t.argmax(1)[0].numpy()
        # fp16 snapshot quantization can flip near-ties; bulk must agree
        assert (sem == t_sem).mean() > 0.98

    def test_include_head_requires_hf_head_config(self, hf_pair):
        from fusion3dseg_tpu.models.import_hf import (
            config_from_hf, params_from_hf_segformer,
        )

        hf_model, _, _, _, _ = hf_pair
        cfg = config_from_hf(hf_model.config, num_classes=10,
                             dtype=jnp.float32)  # native head
        with pytest.raises(ValueError, match="head"):
            params_from_hf_segformer(
                hf_model.state_dict(), cfg, include_head=True)

    def test_with_head_on_encoder_only_checkpoint_raises(self, hf_pair):
        from fusion3dseg_tpu.models.import_hf import (
            infer_config_from_state_dict,
        )

        hf_model, _, _, _, _ = hf_pair
        sd = {k: v for k, v in hf_model.state_dict().items()
              if not k.startswith("decode_head.")}
        with pytest.raises(KeyError, match="classifier"):
            infer_config_from_state_dict(sd, with_head=True)
