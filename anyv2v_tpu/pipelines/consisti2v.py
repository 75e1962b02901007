"""ConsistI2V AnyV2V pipeline: jitted inversion + dual-CFG PnP editing.

Rebuilds the reference ``ConditionalVideoEditingPipeline``
(``consisti2v/consisti2v/pipelines/pipeline_video_editing.py``):

- the video's frame 0 is split off as clean conditioning (``:875-877`` /
  ``:1494-1495``); the denoising state is frames 1..F-1;
- the per-step cache stores the clean first-frame latent concatenated at
  frame 0 (``:932-941``); editing strips it back off (``:1506-1507``);
- dual CFG (``:1319-1326``): guidance mode None / "text" / "both" from
  (cfg_txt, cfg_img); batches [src, x], [src, x, x], [src, x, x, x];
  text rows [inv, text], [inv, uncond, text], [inv, uncond, uncond, text];
  first-frame rows [src_ff, edit_ff], [src_ff, edit_ff, edit_ff],
  [src_ff, cache_ff, edit_ff, edit_ff] (``:1516-1524`` — the "uncond" image
  row uses the initial cache's frame 0);
- eps = uncond + s_img (img - uncond) + s_txt (both - img) (``:1548-1549``),
  with optional guidance rescale (``:50``, arXiv:2305.08891);
- output frame 0 is *copied* from the edited image latent (``:1569``).

FreeInit noise re-init (``use_frameinit``, ``:208-227``) is exposed via
:func:`apply_frameinit`.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextModel
from .common import LatentCodecMixin, resolve_chunk_steps
from ..models.unet_videoldm import VideoLDMUNet
from ..models.unet_i2vgen import PnPFlags
from ..models.vae import AutoencoderKL
from ..ops.freeinit import FILTERS, freq_mix_3d
from ..ops.pnp import injection_step_mask
from ..schedulers import (
    DiffusionSchedule,
    add_noise,
    ddim_inverse_step,
    ddim_step,
    inversion_timesteps,
    sampling_timesteps,
)
from .i2vgen import PnPConfig


def guidance_mode(cfg_txt: float, cfg_img: float) -> Optional[str]:
    """Reference ``pipeline_video_editing.py:1321-1326``."""
    mode = None
    if cfg_txt > 1.0:
        mode = "text"
    if cfg_img > 1.0:
        mode = "both"
    return mode


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """Guidance rescale (reference ``:50-61``, arXiv:2305.08891 §3.4)."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


@dataclasses.dataclass
class ConsistI2VPipeline(LatentCodecMixin):
    """``mesh`` (optional): a ('cfg', 'frame') mesh. Video state tensors
    shard over 'frame'; the first-frame conditioning latent ([B, 1, h, w, 4])
    is replicated — the UNet forward runs as ONE manual-SPMD shard_map
    region (:meth:`_apply_unet`): the concat (reference
    ``videoldm_unet.py:712-714``) prepends the replicated frame 0 INSIDE the
    region and the temporal ops assemble the true F+1 sequence around their
    explicit all_to_alls — the SURVEY §7 'replicate frame 0, shard the rest'
    decision."""

    unet: VideoLDMUNet
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    schedule: DiffusionSchedule
    params: Dict[str, Any]
    cache_dtype: jnp.dtype = jnp.float32
    mesh: Optional[Any] = None

    def __post_init__(self):
        self._shard_params_if_mesh()

    # encoders/decoders come from LatentCodecMixin; sharding helpers from
    # ShardingMixin (identity when mesh is None)

    # -- inversion -----------------------------------------------------------

    @cached_property
    def _invert(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("total_steps",))
        def fn(params, x0_rest, first_frame_latents, text_embeds, frame_stride,
               inv_ts, *, total_steps):
            n_steps = total_steps

            def body(x, t):
                eps = self._apply_unet(
                    self.unet, params["unet"],
                    sample=x,
                    timestep=t,
                    encoder_hidden_states=text_embeds,
                    first_frame_latents=first_frame_latents,
                    frame_stride=frame_stride,
                )
                x_next = self._constrain_video(ddim_inverse_step(
                    self.schedule, x, eps.astype(jnp.float32), t, n_steps
                ))
                # cache row includes the clean frame-0 latent (reference :932-941)
                row = jnp.concatenate([first_frame_latents, x_next], axis=1)
                return x_next, row.astype(self.cache_dtype)

            _, traj = jax.lax.scan(body, x0_rest.astype(jnp.float32), inv_ts)
            return traj

        return fn

    def invert(
        self,
        video_latents: jax.Array,   # [1, F, h, w, 4] incl. frame 0
        text_embeds: jax.Array,     # [1, S, D]
        num_inversion_steps: int = 500,
        frame_stride: int = 3,
        chunk_steps: Optional[int] = None,
        traj_store: str = "device",
    ):
        """cfg_txt = cfg_img = 1.0 inversion (reference
        ``configs/pipeline_512/ddim_inversion_512.yaml:24-31``). Dispatched in
        ``chunk_steps`` segments (remote-TPU per-execution time limit).
        ``traj_store="host"``: offload the full grid to host RAM per segment
        (long-video route — see ``I2VGenPipeline.invert``)."""
        from .common import HostTrajectory

        assert traj_store in ("device", "host"), traj_store
        ff = self._put_replicated(video_latents[:, :1])
        rest = self._put_video(video_latents[:, 1:])
        inv_ts = inversion_timesteps(self.schedule, num_inversion_steps)
        store = HostTrajectory() if traj_store == "host" else None
        chunks = []
        step = min(resolve_chunk_steps(chunk_steps), num_inversion_steps)
        x = rest
        for start in range(0, num_inversion_steps, step):
            traj_chunk = self._invert(
                self.params, x, ff, self._put_replicated(text_embeds),
                jnp.int32(frame_stride),
                jnp.asarray(inv_ts[start:start + step], jnp.int32),
                total_steps=num_inversion_steps,
            )
            x = traj_chunk[-1][:, 1:].astype(jnp.float32)  # strip cached frame 0
            if store is not None:
                store.append(traj_chunk)
            else:
                chunks.append(traj_chunk)
        if store is not None:
            return store, inv_ts
        traj = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
        return traj, inv_ts  # traj rows: [1, F, h, w, 4] WITH clean frame 0

    # -- PnP editing -----------------------------------------------------------

    def _unet_for_chunks(self, n_chunks: int) -> VideoLDMUNet:
        if self.unet.config.pnp_chunks == n_chunks:
            return self.unet
        return VideoLDMUNet(dataclasses.replace(self.unet.config, pnp_chunks=n_chunks))

    def _apply_unet(self, unet, params, *, sample, timestep,
                    encoder_hidden_states, first_frame_latents, frame_stride,
                    pnp_flags=None):
        """One UNet forward. With a mesh, the whole forward runs as ONE
        jax.shard_map region (manual SPMD, same design as
        ``I2VGenPipeline._apply_unet``): the REAL frames shard; the
        conditioning frame (``first_frame_latents``) enters REPLICATED and
        rides the whole UNet replicated — concat mode prepends it INSIDE the
        region, the temporal ops assemble the true F+1 sequence around their
        all_to_alls, and the spatial first-frame K/V read the locally-held
        row 0 (``models/unet_videoldm._assemble_true_sequence``).
        ``pnp_flags``: optional (conv, spatial, temporal) traced bools.
        Falls back to the plain apply when the mesh is absent, frames don't
        divide, or ANYV2V_MANUAL_SPMD=0."""
        import os

        mesh = self.mesh
        n = mesh.shape["frame"] if mesh is not None else 1
        F = sample.shape[1]
        use_manual = (
            mesh is not None and n > 1 and F % n == 0
            and mesh.shape.get("cfg", 1) == 1
            and os.environ.get("ANYV2V_MANUAL_SPMD", "1") != "0"
        )

        def mk_pnp(flags):
            return PnPFlags(conv=flags[0], spatial=flags[1],
                            temporal=flags[2])

        if not use_manual:
            kw = {"pnp": mk_pnp(pnp_flags)} if pnp_flags is not None else {}
            return unet.apply(
                params, sample=sample, timestep=timestep,
                encoder_hidden_states=encoder_hidden_states,
                first_frame_latents=first_frame_latents,
                frame_stride=frame_stride, **kw)

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import manual_axis

        vspec = P(None, "frame", None, None, None)
        has_pnp = pnp_flags is not None
        # static python-bool flags ride the closure (see I2VGenPipeline)
        static_pnp = has_pnp and all(isinstance(f, bool) for f in pnp_flags)
        flags = pnp_flags if (has_pnp and not static_pnp) else ()

        def local(params, sample, timestep, text, ffl, frame_stride, flags):
            with manual_axis("frame", n):
                if static_pnp:
                    kw = {"pnp": mk_pnp(pnp_flags)}
                else:
                    kw = {"pnp": mk_pnp(flags)} if has_pnp else {}
                return unet.apply(
                    params, sample=sample, timestep=timestep,
                    encoder_hidden_states=text, first_frame_latents=ffl,
                    frame_stride=frame_stride, **kw)

        rep = P()
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(rep, vspec, rep, rep, rep, rep, rep),
            out_specs=vspec, check_vma=False,
        )(params, sample, timestep, encoder_hidden_states,
          first_frame_latents, frame_stride, flags)

    @cached_property
    def _sample_pnp(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("mode", "static_flags"))
        def fn(params, init_latent, cache_ff, traj, text_all, ff_src, ff_edit,
               frame_stride, step_data, cfg_txt, cfg_img, rescale, *, mode,
               static_flags=None):
            n_chunks = {None: 2, "text": 3, "both": 4}[mode]
            unet = self._unet_for_chunks(n_chunks)

            def body(x, step):
                if static_flags is None:
                    t, t_prev, cache_i, inj_conv, inj_sp, inj_tmp = step
                    flags = (inj_conv, inj_sp, inj_tmp)
                else:
                    t, t_prev, cache_i = step
                    flags = static_flags
                row = jax.lax.dynamic_index_in_dim(traj, cache_i, 0, keepdims=False)
                src = row[:, 1:].astype(jnp.float32)   # strip cached frame 0
                if mode is None:
                    inp = jnp.concatenate([src, x], axis=0)
                    ffl = jnp.concatenate([ff_src, ff_edit], axis=0)
                elif mode == "text":
                    inp = jnp.concatenate([src, x, x], axis=0)
                    ffl = jnp.concatenate([ff_src, ff_edit, ff_edit], axis=0)
                else:
                    inp = jnp.concatenate([src, x, x, x], axis=0)
                    ffl = jnp.concatenate([ff_src, cache_ff, ff_edit, ff_edit], axis=0)
                eps_all = self._apply_unet(
                    unet, params["unet"],
                    sample=inp,
                    timestep=t,
                    encoder_hidden_states=text_all,
                    first_frame_latents=ffl,
                    frame_stride=frame_stride,
                    pnp_flags=flags,
                ).astype(jnp.float32)
                if mode is None:
                    _s, eps = jnp.split(eps_all, 2, axis=0)
                elif mode == "text":
                    _s, e_u, e_t = jnp.split(eps_all, 3, axis=0)
                    eps = e_u + cfg_txt * (e_t - e_u)
                    # guidance rescale supports text mode only (reference :1556
                    # would NameError in "both" mode)
                    eps = jnp.where(rescale > 0.0,
                                    rescale_noise_cfg(eps, e_t, rescale), eps)
                else:
                    _s, e_u, e_i, e_b = jnp.split(eps_all, 4, axis=0)
                    eps = e_u + cfg_img * (e_i - e_u) + cfg_txt * (e_b - e_i)
                x = self._constrain_video(ddim_step(self.schedule, x, eps, t, t_prev))
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), step_data)
            return out

        return fn

    @cached_property
    def _sample_pnp_tail(self):
        """Post-injection tail of the PnP scan: identical row composition and
        CFG combine as :attr:`_sample_pnp` minus the source branch (whose eps
        the combine discards), so the batch drops by one row."""
        from functools import partial

        @partial(jax.jit, static_argnames=("mode",))
        def fn(params, init_latent, cache_ff, text_all, ff_edit,
               frame_stride, step_data, cfg_txt, cfg_img, rescale, *, mode):
            n_chunks = {None: 1, "text": 2, "both": 3}[mode]
            unet = self._unet_for_chunks(max(n_chunks, 2))

            def body(x, step):
                t, t_prev = step
                if mode is None:
                    inp, ffl = x, ff_edit
                elif mode == "text":
                    inp = jnp.concatenate([x, x], axis=0)
                    ffl = jnp.concatenate([ff_edit, ff_edit], axis=0)
                else:
                    inp = jnp.concatenate([x, x, x], axis=0)
                    ffl = jnp.concatenate([cache_ff, ff_edit, ff_edit], axis=0)
                eps_all = self._apply_unet(
                    unet, params["unet"],
                    sample=inp,
                    timestep=t,
                    encoder_hidden_states=text_all,
                    first_frame_latents=ffl,
                    frame_stride=frame_stride,
                ).astype(jnp.float32)
                if mode is None:
                    eps = eps_all
                elif mode == "text":
                    e_u, e_t = jnp.split(eps_all, 2, axis=0)
                    eps = e_u + cfg_txt * (e_t - e_u)
                    eps = jnp.where(rescale > 0.0,
                                    rescale_noise_cfg(eps, e_t, rescale), eps)
                else:
                    e_u, e_i, e_b = jnp.split(eps_all, 3, axis=0)
                    eps = e_u + cfg_img * (e_i - e_u) + cfg_txt * (e_b - e_i)
                x = self._constrain_video(ddim_step(self.schedule, x, eps, t, t_prev))
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), step_data)
            return out

        return fn

    def sample_with_pnp(
        self,
        traj: jax.Array,            # [n, 1, F, h, w, 4] rows incl. clean frame 0
        inv_ts: np.ndarray,
        text_embeds_all: jax.Array,  # rows per guidance mode (see module doc)
        edited_ff_latent: jax.Array,  # [1, 1, h, w, 4]
        src_ff_latent: jax.Array,     # [1, 1, h, w, 4]
        num_inference_steps: int = 50,
        t_idx: int = 4,
        cfg_txt: float = 35.0,
        cfg_img: float = 1.0,
        guidance_rescale: float = 0.0,
        pnp: Optional[PnPConfig] = None,
        frame_stride: int = 3,
        init_latent: Optional[jax.Array] = None,
        split_scan: bool = True,
    ) -> jax.Array:
        """Returns edited latents [1, F, h, w, 4] with frame 0 = edited image
        latent (copied, not generated — reference ``:1569``).

        ``split_scan``: run the steps after every injection schedule expires
        as a source-row-free scan (the CFG combine discards the source eps) —
        identical math, one less UNet row for the tail steps."""
        pnp = pnp or PnPConfig(0.2, 0.2, 0.5)
        mode = guidance_mode(cfg_txt, cfg_img)
        ts = sampling_timesteps(self.schedule, num_inference_steps)
        m_conv = injection_step_mask(ts, pnp.conv, num_inference_steps)[t_idx:]
        m_sp = injection_step_mask(ts, pnp.spatial, num_inference_steps)[t_idx:]
        m_tmp = injection_step_mask(ts, pnp.temporal, num_inference_steps)[t_idx:]
        ts_run = ts[t_idx:]
        step_ratio = self.schedule.num_train_timesteps // num_inference_steps

        t_to_row = {int(t): i for i, t in enumerate(inv_ts)}
        try:
            cache_idx = np.array([t_to_row[int(t)] for t in ts_run], np.int32)
        except KeyError as e:
            raise ValueError(f"timestep {e} not on the inversion grid") from None

        init_row = traj[cache_idx[0]]
        cache_ff = init_row[:, :1].astype(jnp.float32)  # "noisy" ff = cache frame 0
        if init_latent is None:
            init_latent = init_row[:, 1:]

        m_any = m_conv | m_sp | m_tmp
        n_run = len(ts_run)
        k_inj = int(np.max(np.nonzero(m_any)[0])) + 1 if m_any.any() else 0
        if not split_scan:
            k_inj = n_run

        # host-resident grid: device-load only the injection scan's rows
        traj, cache_idx = self._device_rows_for_scan(traj, cache_idx, k_inj)

        out = self._put_video(init_latent)
        cache_ff = self._put_replicated(cache_ff)
        text_embeds_all = self._put_replicated(text_embeds_all)
        if k_inj > 0:
            import os

            ff_src3 = self._put_replicated(src_ff_latent.astype(jnp.float32))
            ff_edit3 = self._put_replicated(
                edited_ff_latent.astype(jnp.float32))
            fstride = jnp.int32(frame_stride)
            cfgs = (jnp.float32(cfg_txt), jnp.float32(cfg_img),
                    jnp.float32(guidance_rescale))

            def run_pnp(out, step_data, static_flags):
                return self._sample_pnp(
                    self.params, out, cache_ff, traj, text_embeds_all,
                    ff_src3, ff_edit3, fstride, step_data, *cfgs,
                    mode=mode, static_flags=static_flags)

            if os.environ.get("ANYV2V_PNP_STATIC", "1") != "0":
                # constant-flag runs compiled with STATIC flags (see
                # I2VGenPipeline.sample_with_pnp): the traced-where Q/K
                # materialization folds away wherever a flag is off
                from .common import group_constant_runs

                runs = group_constant_runs((m_conv, m_sp, m_tmp), k_inj)
                for start, pat, stop in runs:
                    step_data = (
                        jnp.asarray(ts_run[start:stop], jnp.int32),
                        jnp.asarray(ts_run[start:stop] - step_ratio, jnp.int32),
                        jnp.asarray(cache_idx[start:stop], jnp.int32),
                    )
                    out = run_pnp(out, step_data, pat)
            else:
                step_data = (
                    jnp.asarray(ts_run[:k_inj], jnp.int32),
                    jnp.asarray(ts_run[:k_inj] - step_ratio, jnp.int32),
                    jnp.asarray(cache_idx[:k_inj], jnp.int32),
                    jnp.asarray(m_conv[:k_inj]), jnp.asarray(m_sp[:k_inj]),
                    jnp.asarray(m_tmp[:k_inj]),
                )
                out = run_pnp(out, step_data, None)
        if k_inj < n_run:
            step_data2 = (
                jnp.asarray(ts_run[k_inj:], jnp.int32),
                jnp.asarray(ts_run[k_inj:] - step_ratio, jnp.int32),
            )
            out = self._sample_pnp_tail(
                self.params, out, cache_ff, text_embeds_all[1:],
                self._put_replicated(edited_ff_latent.astype(jnp.float32)),
                jnp.int32(frame_stride), step_data2,
                jnp.float32(cfg_txt), jnp.float32(cfg_img),
                jnp.float32(guidance_rescale), mode=mode,
            )
        return jnp.concatenate([edited_ff_latent.astype(out.dtype), out], axis=1)

    # -- plain generation (reference __call__, :469-700) --------------------

    @cached_property
    def _sample_plain(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("mode",))
        def fn(params, init_latent, noisy_ff, text_all, ff, frame_stride,
               step_data, cfg_txt, cfg_img, rescale, *, mode):
            n_chunks = {None: 1, "text": 2, "both": 3}[mode]
            unet = self._unet_for_chunks(max(n_chunks, 2))

            def body(x, step):
                t, t_prev = step
                if mode is None:
                    inp, ffl = x, ff
                elif mode == "text":
                    inp = jnp.concatenate([x, x], axis=0)
                    ffl = jnp.concatenate([ff, ff], axis=0)
                else:
                    inp = jnp.concatenate([x, x, x], axis=0)
                    # rows [uncond, img, both]; the image-uncond row uses the
                    # NOISY frame 0 split off the initial noise (:654-661)
                    ffl = jnp.concatenate([noisy_ff, ff, ff], axis=0)
                eps_all = self._apply_unet(
                    unet, params["unet"], sample=inp, timestep=t,
                    encoder_hidden_states=text_all, first_frame_latents=ffl,
                    frame_stride=frame_stride,
                ).astype(jnp.float32)
                if mode is None:
                    eps = eps_all
                elif mode == "text":
                    e_u, e_t = jnp.split(eps_all, 2, axis=0)
                    eps = e_u + cfg_txt * (e_t - e_u)
                    eps = jnp.where(rescale > 0.0,
                                    rescale_noise_cfg(eps, e_t, rescale), eps)
                else:
                    e_u, e_i, e_b = jnp.split(eps_all, 3, axis=0)
                    eps = e_u + cfg_img * (e_i - e_u) + cfg_txt * (e_b - e_i)
                x = self._constrain_video(ddim_step(self.schedule, x, eps, t, t_prev))
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), step_data)
            return out

        return fn

    def sample(
        self,
        first_frame_latent: jax.Array,   # [1, 1, h, w, 4] clean (encoded image)
        text_embeds_all: jax.Array,      # rows: [text] | [uncond, text] |
                                         # [uncond, uncond, text]
        num_frames: int = 16,
        num_inference_steps: int = 50,
        cfg_txt: float = 7.5,
        cfg_img: float = 1.0,
        guidance_rescale: float = 0.0,
        frame_stride: int = 3,
        key: Optional[jax.Array] = None,
        noise_sampling_method: str = "vanilla",
        noise_alpha: float = 1.0,
        use_frameinit: bool = False,
        frameinit_noise_level: int = 999,
        init_latent: Optional[jax.Array] = None,
        t_idx: int = 0,
    ) -> jax.Array:
        """Plain image-to-video generation (reference ``__call__``,
        ``pipeline_video_editing.py:469``): sample (optionally pyoco) noise,
        optionally FreeInit-reinitialize, split frame 0 off as the noisy
        image-uncond conditioning row, denoise frames 1.., re-attach the
        clean first-frame latent."""
        mode = guidance_mode(cfg_txt, cfg_img)
        h, w = first_frame_latent.shape[2:4]
        if init_latent is None:
            key = jax.random.PRNGKey(0) if key is None else key
            noise = sample_video_noise(
                key, (1, num_frames, h, w, 4), noise_sampling_method, noise_alpha)
            if use_frameinit:
                noise = self.apply_frameinit(
                    noise, first_frame_latent, noise_level=frameinit_noise_level)
            init_latent = noise
        noisy_ff = init_latent[:, :1].astype(jnp.float32)
        state = init_latent[:, 1:]

        ts = sampling_timesteps(self.schedule, num_inference_steps)[t_idx:]
        step_ratio = self.schedule.num_train_timesteps // num_inference_steps
        step_data = (jnp.asarray(ts, jnp.int32),
                     jnp.asarray(ts - step_ratio, jnp.int32))
        out = self._sample_plain(
            self.params, self._put_video(state),
            self._put_replicated(noisy_ff),
            self._put_replicated(text_embeds_all),
            self._put_replicated(first_frame_latent.astype(jnp.float32)),
            jnp.int32(frame_stride),
            step_data, jnp.float32(cfg_txt), jnp.float32(cfg_img),
            jnp.float32(guidance_rescale), mode=mode,
        )
        return jnp.concatenate([first_frame_latent.astype(out.dtype), out], axis=1)

    # -- FreeInit ---------------------------------------------------------------

    def apply_frameinit(
        self,
        latents: jax.Array,          # [1, F, h, w, 4] initial noise
        first_frame_latent: jax.Array,  # [1, 1, h, w, 4] clean
        noise_level: int = 999,
        filter_type: str = "butterworth",
        filter_order: int = 4,
        d_s: float = 0.25,
        d_t: float = 0.25,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """FreeInit re-initialization (reference ``:208-227`` applied at
        ``:623-633``): diffuse the static first-frame video to ``noise_level``
        and keep its low frequencies, the input noise's high frequencies."""
        f, h, w = latents.shape[1:4]
        static_vid = jnp.tile(first_frame_latent, (1, f, 1, 1, 1))
        z_t = add_noise(self.schedule, static_vid, latents, jnp.int32(noise_level))
        if filter_type == "butterworth":
            lpf = FILTERS[filter_type]((f, h, w), n=filter_order, d_s=d_s, d_t=d_t)
        else:
            lpf = FILTERS[filter_type]((f, h, w), d_s=d_s, d_t=d_t)
        return freq_mix_3d(z_t.astype(jnp.float32), latents.astype(jnp.float32),
                           jnp.asarray(lpf))


# ---------------------------------------------------------------------------
# pyoco correlated video noise (reference prepare_latents, :408-458)
# ---------------------------------------------------------------------------


def sample_video_noise(
    key: jax.Array,
    shape,                       # [B, F, h, w, C]
    method: str = "vanilla",     # vanilla | pyoco_mixed | pyoco_progressive
    noise_alpha: float = 1.0,
) -> jax.Array:
    """Reference ``prepare_latents`` noise sampling
    (``pipeline_video_editing.py:408-458``): pyoco_mixed = shared base frame
    noise + per-frame noise; pyoco_progressive = AR(1) chain over frames with
    coefficient sqrt(a^2/(1+a^2))."""
    b, f, h, w, c = shape
    a2 = noise_alpha**2
    k1, k2 = jax.random.split(key)
    if method == "vanilla":
        return jax.random.normal(k1, shape, jnp.float32)
    if method == "pyoco_mixed":
        base = jax.random.normal(k1, (b, 1, h, w, c), jnp.float32) * np.sqrt(a2 / (1 + a2))
        ind = jax.random.normal(k2, shape, jnp.float32) * np.sqrt(1 / (1 + a2))
        return base + ind
    if method == "pyoco_progressive":
        init = jax.random.normal(k1, shape, jnp.float32)
        ind = jax.random.normal(k2, shape, jnp.float32) * np.sqrt(1 / (1 + a2))
        coef = np.sqrt(a2 / (1 + a2))

        def body(prev, xs):
            ind_j = xs
            cur = prev * coef + ind_j
            return cur, cur

        # frame 0 keeps the raw draw; frames 1.. follow the AR(1) chain
        first = init[:, 0]
        _, rest = jax.lax.scan(body, first, jnp.moveaxis(ind[:, 1:], 1, 0))
        rest = jnp.moveaxis(rest, 0, 1)
        return jnp.concatenate([first[:, None], rest], axis=1)
    raise ValueError(f"unknown noise_sampling_method: {method}")
