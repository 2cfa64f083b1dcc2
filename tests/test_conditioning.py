"""CLIP tower parity vs HF transformers (random-init, no download)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')
transformers = pytest.importorskip('transformers')

from ln3diff_tpu.conditioning.clip import (CLIPTextConfig, CLIPTextModel,
                                           CLIPVisionConfig, CLIPVisionModel)
from ln3diff_tpu.conditioning.convert import (convert_hf_clip_text,
                                              convert_hf_clip_vision)


class TestCLIPTextParity:

    def test_matches_hf_random_init(self):
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77)
        torch.manual_seed(0)
        hf = transformers.CLIPTextModel(hf_cfg).eval()

        ours = CLIPTextModel(CLIPTextConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, max_length=77))
        params = convert_hf_clip_text(hf.state_dict(), num_layers=2)

        ids = np.array([[49, 3, 7, 999, 0, 0], [49, 12, 999, 0, 0, 0]],
                       np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state

        out = ours.apply({'params': params}, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(out['last_hidden_state']),
                                   ref.numpy(), rtol=2e-4, atol=2e-5)

    def test_pooled_matches_hf(self):
        hf_cfg = transformers.CLIPTextConfig(
            vocab_size=500, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            max_position_embeddings=77, eos_token_id=499)
        torch.manual_seed(1)
        hf = transformers.CLIPTextModel(hf_cfg).eval()
        ours = CLIPTextModel(CLIPTextConfig(
            vocab_size=500, hidden_size=32, intermediate_size=64,
            num_layers=1, num_heads=2))
        params = convert_hf_clip_text(hf.state_dict(), num_layers=1)
        ids = np.array([[3, 17, 499, 0]], np.int64)
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids))
        out = ours.apply({'params': params}, jnp.asarray(ids, jnp.int32))
        # HF pooled = eos position hidden state (pre-projection)
        np.testing.assert_allclose(np.asarray(out['pooler_output']),
                                   ref.pooler_output.numpy(), rtol=2e-4,
                                   atol=2e-5)


class TestCLIPVisionParity:

    def test_matches_hf_random_init(self):
        hf_cfg = transformers.CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8)
        torch.manual_seed(2)
        hf = transformers.CLIPVisionModel(hf_cfg).eval()
        ours = CLIPVisionModel(CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64,
            intermediate_size=128, num_layers=2, num_heads=4))
        params = convert_hf_clip_vision(hf.state_dict(), num_layers=2)

        img = np.random.default_rng(0).standard_normal(
            (2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = hf(pixel_values=torch.from_numpy(img))
        out = ours.apply({'params': params},
                         jnp.asarray(img.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out['tokens']),
                                   ref.last_hidden_state.numpy(), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out['pooler_output']),
                                   ref.pooler_output.numpy(), rtol=2e-4,
                                   atol=2e-5)


class TestDINOv2Parity:

    def test_matches_hf_random_init(self):
        hf_cfg = transformers.Dinov2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=128, image_size=28, patch_size=14)
        torch.manual_seed(0)
        hf = transformers.Dinov2Model(hf_cfg).eval()
        # random-init layerscale gammas are 1.0 in HF init; perturb so the
        # test actually exercises the layerscale path
        with torch.no_grad():
            for layer in hf.encoder.layer:
                layer.layer_scale1.lambda1.mul_(0.7)
                layer.layer_scale2.lambda1.mul_(1.3)

        from ln3diff_tpu.conditioning.convert import convert_hf_dinov2
        from ln3diff_tpu.models.vit import ViTConfig, VisionTransformer

        ours = VisionTransformer(ViTConfig(
            img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=4, layerscale=True, exact_gelu=True))
        params = convert_hf_dinov2(hf.state_dict(), depth=2)

        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf(pixel_values=torch.from_numpy(
                img.transpose(0, 3, 1, 2))).last_hidden_state

        out = ours.apply({'params': params}, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=2e-4, atol=2e-5)
