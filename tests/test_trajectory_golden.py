"""Two-phase TRAJECTORY golden: N-step DDIM inversion + M-step CFG edit in
torch (diffusers-semantics stepping, fp32, channels-first idiom) vs the JAX
pipeline scans.

The suite's forward goldens (tests/test_full_model_golden.py) pin single UNet
forwards, and the scheduler tests pin single steps — but the reference's hot
loops compose hundreds of steps (``pipeline_i2vgen_xl.py:1385-1433`` inversion,
``:1130-1179`` editing with the per-step latent-cache read), and
accumulation-order drift across a multi-step scan is exactly where parity
would die silently (VERDICT r3 item 4). Here the torch oracle runs the whole
two-phase flow step by step in the diffusers idiom:

- DDIM inversion: ascending leading-spaced grid, x0 extracted at the SOURCE
  level t - ratio (diffusers ``DDIMInverseScheduler.step``), trajectory saved
  per step (the ``torch.save`` bus, ``:1424-1428``).
- Editing: truncated grid ``timesteps[t_idx:]``, per-step trajectory read at
  the current t (``:1134``), 3-row CFG batch [src, x, x]
  (``:1135-1138``), combine eps_neg + cfg*(eps_edit - eps_neg)
  (``:1159-1165``), DDIM step to t - ratio.

PnP injection is OFF in both implementations (thresholds 0) — the injection
points themselves are pinned by the per-family target tests; this golden pins
the multi-step numerical composition. The JAX side runs the monolithic
batch-3 scan (split_scan=False) so the in-scan trajectory gather is the code
under test, and the split batch-2 path is asserted equal to it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from anyv2v_tpu.utils import convert as C
from anyv2v_tpu.schedulers import make_schedule, inversion_timesteps, sampling_timesteps
from test_full_model_golden import TI2VGenUNet
from test_convert_golden import sd_np, t2j


N_INV = 8      # inversion steps (ratio 125)
N_EDIT = 4     # sampling steps (ratio 250; grid nests in the inversion grid)
T_IDX = 1      # ddim_init_latents_t_idx (reference template.yaml:31)
CFG = 9.0      # reference group_pnp_edit/template.yaml:26


def _build():
    torch.manual_seed(23)
    ch = (8, 16, 16, 16)
    skel = TI2VGenUNet(ch=ch).eval()
    converted = C.convert_unet_i2vgen(sd_np(skel), block_out_channels=ch,
                                      layers_per_block=1,
                                      num_attention_heads=2)

    from anyv2v_tpu.models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig
    from anyv2v_tpu.pipelines.i2vgen import I2VGenPipeline

    cfg = I2VGenUNetConfig(block_out_channels=ch, layers_per_block=1,
                           cross_attention_dim=16, attention_head_dim=4,
                           num_attention_heads=2, norm_num_groups=4,
                           num_image_context_tokens=2, dtype=jnp.float32)
    unet = I2VGenUNet(cfg)
    schedule = make_schedule()
    pipe = I2VGenPipeline(
        unet=unet, vae=None, text_encoder=None, vision_encoder=None,
        schedule=schedule,
        params={"unet": jax.tree_util.tree_map(jnp.asarray, converted)},
    )
    return skel, pipe, schedule


def _alpha(acp, t):
    """alphas_cumprod[t] with t < 0 -> alphas_cumprod[0] (the zoo schedule
    runs diffusers set_alpha_to_one=False, so the out-of-grid boundary is the
    first trained alpha, not 1.0)."""
    return acp[t] if t >= 0 else acp[0]


def _torch_two_phase(skel, schedule, sample, text, img_lat, img_emb,
                     text3, img_lat3, img_emb3):
    """fp32 torch oracle for invert + edit; returns (traj rows, edited x)."""
    acp = torch.from_numpy(np.asarray(schedule.alphas_cumprod)).double()
    n_train = schedule.num_train_timesteps

    # --- inversion grid: ascending leading spacing + offset -------------
    ratio_inv = n_train // N_INV
    inv_ts = np.arange(N_INV) * ratio_inv + schedule.steps_offset

    x = sample.double()
    traj = []
    with torch.no_grad():
        for t in inv_ts:
            eps = skel(x.float(), torch.tensor([int(t)]), text,
                       torch.tensor([8]), img_lat, img_emb).double()
            a_src = _alpha(acp, int(t) - ratio_inv)
            a_to = acp[int(t)]
            x0 = (x - torch.sqrt(1 - a_src) * eps) / torch.sqrt(a_src)
            x = torch.sqrt(a_to) * x0 + torch.sqrt(1 - a_to) * eps
            traj.append(x.clone())

    # --- editing: truncated descending grid, 3-row CFG ------------------
    ratio = n_train // N_EDIT
    ts_edit = ((np.arange(N_EDIT) * ratio)[::-1] + schedule.steps_offset)[T_IDX:]
    t_to_row = {int(t): i for i, t in enumerate(inv_ts)}
    x = traj[t_to_row[int(ts_edit[0])]].clone()
    with torch.no_grad():
        for t in ts_edit:
            src = traj[t_to_row[int(t)]]
            inp = torch.cat([src, x, x], dim=0).float()
            eps3 = skel(inp, torch.tensor([int(t)] * 3), text3,
                        torch.tensor([8] * 3), img_lat3, img_emb3).double()
            _eps_src, eps_neg, eps_edit = eps3.chunk(3, dim=0)
            eps = eps_neg + CFG * (eps_edit - eps_neg)
            a_t = acp[int(t)]
            a_prev = _alpha(acp, int(t) - ratio)
            x0 = (x - torch.sqrt(1 - a_t) * eps) / torch.sqrt(a_t)
            x = torch.sqrt(a_prev) * x0 + torch.sqrt(1 - a_prev) * eps
    return traj, x


def test_two_phase_trajectory_golden():
    from anyv2v_tpu.pipelines.i2vgen import PnPConfig

    skel, pipe, schedule = _build()
    b, f, h = 1, 2, 32
    torch.manual_seed(29)
    sample = torch.randn(b, 4, f, h, h)
    img_lat_src = torch.randn(b, 4, f, h, h)
    img_lat_edit = torch.randn(b, 4, f, h, h)
    text_inv = torch.randn(b, 5, 16) * 0.2
    text_neg = torch.randn(b, 5, 16) * 0.2
    text_edit = torch.randn(b, 5, 16) * 0.2
    emb_src = torch.randn(b, 1, 16) * 0.2
    emb_edit = torch.randn(b, 1, 16) * 0.2

    text3 = torch.cat([text_inv, text_neg, text_edit], dim=0)
    img_lat3 = torch.cat([img_lat_src, img_lat_edit, img_lat_edit], dim=0)
    emb3 = torch.cat([emb_src, emb_edit, emb_edit], dim=0)

    want_traj, want_x = _torch_two_phase(
        skel, schedule, sample, text_inv, img_lat_src, emb_src,
        text3, img_lat3, emb3)

    # grid equality is part of the golden (leading spacing + offset)
    inv_ts = inversion_timesteps(schedule, N_INV)
    np.testing.assert_array_equal(
        inv_ts, np.arange(N_INV) * (schedule.num_train_timesteps // N_INV)
        + schedule.steps_offset)
    assert set(sampling_timesteps(schedule, N_EDIT)) <= set(inv_ts)

    traj, got_inv_ts = pipe.invert(
        t2j(sample), jnp.asarray(text_inv.numpy()), t2j(img_lat_src),
        jnp.asarray(emb_src.numpy()), num_inversion_steps=N_INV)
    np.testing.assert_array_equal(got_inv_ts, inv_ts)

    # per-row trajectory comparison (the torch.save bus as an HBM array)
    want_rows = np.stack([t2j(w) for w in want_traj])
    np.testing.assert_allclose(np.asarray(traj), want_rows, atol=2e-3,
                               rtol=2e-3)

    kw = dict(
        text_embeds_all=jnp.asarray(text3.numpy()),
        image_latents_all=t2j(img_lat3),
        image_embeds_all=jnp.asarray(emb3.numpy()),
        num_inference_steps=N_EDIT, t_idx=T_IDX, guidance_scale=CFG,
        pnp=PnPConfig(conv=0.0, spatial=0.0, temporal=0.0),
    )
    got = pipe.sample_with_pnp(traj, got_inv_ts, split_scan=False, **kw)
    np.testing.assert_allclose(np.asarray(got), t2j(want_x), atol=4e-3,
                               rtol=4e-3)

    # the split batch-2 tail scan is mathematically identical
    got_split = pipe.sample_with_pnp(traj, got_inv_ts, split_scan=True, **kw)
    np.testing.assert_allclose(np.asarray(got_split), np.asarray(got),
                               atol=1e-5, rtol=1e-5)
