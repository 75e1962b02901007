"""Real-checkpoint dress rehearsal (VERDICT r4 item 9): the converter must
accept a state dict bearing the reference checkpoints' LITERAL keys at the
FULL architecture, consuming every weight.

The SEINE fixture (`tests/fixtures/seine_unet_keys.json`) is extracted from
the reference's own model source at the real seine.pt architecture
(`tests/ref_keys/extract_seine.py` — meta-device instantiation of
`/root/reference/seine/models/unet.py` with the literal config the
reference transcribes from SD1.4). `seine.pt["ema"]` is strict-loaded into
that model (`run_pnp_edit.py:53-66`), so these keys+shapes ARE the
checkpoint's; a converter that passes here will accept the real file.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import anyv2v_tpu.utils.convert as C

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "seine_unet_keys.json")
FIXTURE_C2V = os.path.join(os.path.dirname(__file__), "fixtures",
                           "consisti2v_unet_keys.json")


class _TrackingSD(dict):
    """Records which checkpoint keys the converter consumed."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def _load_fixture():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.mark.slow
def test_seine_fixture_matches_reference_source():
    """Fixture freshness: re-extract the key list from the reference source
    (meta device, no memory) and require exact agreement with the committed
    fixture."""
    ref = "/root/reference/seine/models/unet.py"
    if not os.path.exists(ref):
        pytest.skip("reference source not available")
    from tests.ref_keys.extract_seine import seine_unet_state_dict_shapes

    live = seine_unet_state_dict_shapes()
    assert live == _load_fixture()


@pytest.mark.slow
def test_seine_converter_accepts_real_checkpoint_keys_full_size():
    """convert_unet_seine over a synthetic snapshot bearing the literal
    seine.pt keys at FULL size must produce exactly the flax init tree of
    the production SeineUNet config, consuming every learned weight (the
    only permitted leftovers are the rotary `freqs` Parameters, which are
    deterministic constants — rotary_embedding_torch registers the
    non-learned inverse-frequency table as a Parameter; our kernels
    recompute it)."""
    from anyv2v_tpu.models.unet_seine import SeineUNet, SeineUNetConfig

    fixture = _load_fixture()
    sd = _TrackingSD(
        {k: np.zeros(s, np.float32) for k, s in fixture.items()})

    converted = C.convert_unet_seine(sd)

    cfg = SeineUNetConfig(dtype=jnp.float32)  # production defaults
    unet = SeineUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 2, 8, 8, 9)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, cfg.cross_attention_dim)),
        ))
    C.assert_params_match(shapes, converted)

    leftovers = set(fixture) - sd.accessed
    non_rotary = {k for k in leftovers if not k.endswith("rotary_emb.freqs")}
    assert not non_rotary, (
        f"converter silently dropped {len(non_rotary)} checkpoint weights, "
        f"e.g. {sorted(non_rotary)[:5]}")

@pytest.mark.slow
def test_consisti2v_fixture_matches_reference_source():
    """Fixture freshness for the ConsistI2V UNet (meta-device extraction
    from the vendored reference source)."""
    ref = "/root/reference/consisti2v/consisti2v/models/videoldm_unet.py"
    if not os.path.exists(ref):
        pytest.skip("reference source not available")
    from tests.ref_keys.extract_consisti2v import (
        consisti2v_unet_state_dict_shapes)

    live = consisti2v_unet_state_dict_shapes()
    with open(FIXTURE_C2V) as f:
        assert live == json.load(f)


@pytest.mark.slow
def test_consisti2v_converter_accepts_real_checkpoint_keys_full_size():
    """convert_unet_videoldm over a synthetic snapshot bearing the literal
    TIGER-Lab/ConsistI2V unet keys at FULL size -> exact flax init tree of
    the production VideoLDMUNet config; every learned weight consumed.
    Permitted leftovers: rotary `freqs` (deterministic constants) and the
    `rotary_bias.relative_attention_bias` tables (the reference constructs
    this LaVie-style bias but its rotary processor never applies it —
    `videoldm_attention.py:560,566+` use only the rotary embedding; our
    temporal attention mirrors the applied math, not the dead parameter)."""
    from anyv2v_tpu.models.unet_videoldm import (VideoLDMUNet,
                                                 VideoLDMUNetConfig)

    with open(FIXTURE_C2V) as f:
        fixture = json.load(f)
    sd = _TrackingSD(
        {k: np.zeros(s, np.float32) for k, s in fixture.items()})

    converted = C.convert_unet_videoldm(sd)

    cfg = VideoLDMUNetConfig(dtype=jnp.float32)  # production defaults
    unet = VideoLDMUNet(cfg)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            sample=jnp.zeros((1, 3, 8, 8, 4)),
            timestep=jnp.int32(0),
            encoder_hidden_states=jnp.zeros((1, 4, cfg.cross_attention_dim)),
            first_frame_latents=jnp.zeros((1, 1, 8, 8, 4)),
            frame_stride=jnp.int32(3),
        ))
    C.assert_params_match(shapes, converted)

    leftovers = set(fixture) - sd.accessed
    allowed = {k for k in leftovers
               if k.endswith("rotary_emb.freqs")
               or k.endswith("rotary_bias.relative_attention_bias.weight")
               # TemporalResnetBlock constructs a time_emb_proj at its
               # default temb_channels=512, but every forward calls
               # conv3d(hidden_states) with NO temb
               # (videoldm_unet_blocks.py:523,728,929,942,1041,1153) — a
               # dead parameter the checkpoint carries and we drop
               or (".conv3ds." in k and ".time_emb_proj." in k)}
    assert leftovers == allowed, (
        f"converter silently dropped {len(leftovers - allowed)} weights, "
        f"e.g. {sorted(leftovers - allowed)[:5]}")
