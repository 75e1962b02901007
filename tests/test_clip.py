"""Golden tests: our flax CLIP vs transformers' torch CLIP with identical
(random) weights — the strongest parity oracle available offline (SURVEY.md §4:
"golden-tensor tests against the PyTorch reference")."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from anyv2v_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
)
from anyv2v_tpu.utils.convert import convert_clip_text, convert_clip_vision


@pytest.fixture(scope="module")
def tiny_text():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        hidden_act="gelu", eos_token_id=98, bos_token_id=97, projection_dim=24,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_position_embeddings=16, hidden_act="gelu",
        eos_token_id=98, projection_dim=24,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_text(sd, num_layers=2)}
    return hf, CLIPTextModel(cfg), params


def test_text_encoder_matches_hf(tiny_text):
    hf, model, params = tiny_text
    ids = np.array([[97, 5, 6, 7, 98, 0, 0, 0], [97, 12, 98, 0, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))
    got_hidden, got_proj = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got_hidden), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_proj), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5
    )


def test_vision_encoder_matches_hf():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        hidden_act="gelu", projection_dim=24,
    )
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        image_size=32, patch_size=8, hidden_act="gelu", projection_dim=24,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_vision(sd, num_layers=2)}

    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(img))
    _, got_embeds = CLIPVisionModel(cfg).apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got_embeds), out.image_embeds.numpy(), rtol=2e-4, atol=2e-5
    )

    # penultimate hidden states (IP-Adapter Plus/Full input) vs HF
    # hidden_states[-2]
    with torch.no_grad():
        out_h = hf(torch.from_numpy(img), output_hidden_states=True)
    got_pen, _ = CLIPVisionModel(cfg).apply(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)), penultimate=True
    )
    np.testing.assert_allclose(
        np.asarray(got_pen), out_h.hidden_states[-2].numpy(),
        rtol=2e-4, atol=2e-5
    )


def test_text_encoder_quick_gelu_variant():
    """OpenAI-family checkpoints use quick_gelu; verify that path too."""
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=50, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, max_position_embeddings=8,
        hidden_act="quick_gelu", eos_token_id=49, bos_token_id=48,
    )
    torch.manual_seed(3)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=50, hidden_size=16, intermediate_size=32, num_layers=1,
        num_heads=2, max_position_embeddings=8, hidden_act="quick_gelu",
        eos_token_id=49, projection_dim=None,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_text(sd, num_layers=1)}
    ids = np.array([[48, 3, 4, 49, 0, 0]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    got, _ = CLIPTextModel(cfg).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_text_encoder_penultimate_matches_hf(tiny_text):
    """SDXL clip-skip semantics: penultimate=True must equal HF
    hidden_states[-2] (pre-final-layer, no final layer norm)."""
    hf, flax_model, params = tiny_text
    ids = np.array([[97, 5, 7, 98, 0, 0]], np.int64)
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    want = out.hidden_states[-2].numpy()
    got, _ = flax_model.apply(params, jnp.asarray(ids), penultimate=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
