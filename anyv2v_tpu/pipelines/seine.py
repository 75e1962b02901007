"""SEINE AnyV2V pipeline: masked-video-conditioned inversion + DDPM/DDIM PnP edit.

Rebuilds the reference ``seine/run_ddim_inversion.py`` (``SEINEDDIMInversion
Pipeline``) and ``seine/run_pnp_edit.py`` (``SEINEPnPPipeline``):

- conditioning: "first1" mask (0 = keep, frame 0; 1 = generate) and the
  VAE-encoded masked video (frame 0 real, rest zero-padded) — built at
  ``run_ddim_inversion.py:222-256``, mask semantics ``seine_utils.py:5-29``;
  model input is the 9-channel concat [x, mask, masked_latent];
- inversion: manual mu/sigma DDIM update over the reversed 500-step grid
  (``:141-188``), numerically identical to :func:`ddim_transfer` with the
  model evaluated at the ascending target t and x0 extracted at the previous
  grid level; latents saved only on a 250-step sub-grid (``:295-308``,
  ``configs/ddim_inversion.yaml:30-31``);
- editing: per-step batch [src, cond, uncond] where the source branch is
  [cached_latent, mask, masked_SRC_latent] and edit branches use the masked
  EDITED-first-frame latent (``run_pnp_edit.py:174-219``); text rows
  [inv, cond, uncond]; cfg = uncond + scale (cond - uncond); default sampler
  DDPM with the cache looked up at t+1 (``:180``, ``configs/pnp_edit.yaml:29``).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property, partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextModel
from .common import LatentCodecMixin, resolve_chunk_steps
from ..models.unet_seine import SeinePnPFlags, SeineUNet
from ..models.vae import AutoencoderKL
from ..ops.pnp import injection_step_mask
from ..schedulers import (
    DiffusionSchedule,
    ddim_step,
    ddim_transfer,
    ddpm_step,
    inversion_timesteps,
    sampling_timesteps,
)


@dataclasses.dataclass
class SeinePnPConfig:
    """pnp_f_t / spatial / temporal / cross thresholds
    (``seine/configs/pnp_edit.yaml``: 0.2 / 0.2 / 0.5 / 0.0)."""

    conv: float = 0.2
    spatial: float = 0.2
    temporal: float = 0.5
    cross: float = 0.0


def ddpm_grid(schedule: DiffusionSchedule, num_inference_steps: int) -> np.ndarray:
    """DDPMScheduler grid: leading spacing WITHOUT steps_offset
    ([980, 960, ..., 0] for 50 steps) — hence the t+1 cache lookup aligning
    with the 250-step save grid {1, 5, ..., 997}."""
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    return (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)


@dataclasses.dataclass
class SeinePipeline(LatentCodecMixin):
    """``mesh`` (optional): a ('cfg', 'frame') mesh. The latent state, the
    frame mask and the masked-video latent (the 9-channel conditioning built
    per step from ``run_pnp_edit.py:183-187``) all shard over 'frame' — the
    per-frame channel concat is local, temporal attention all-gathers."""

    unet: SeineUNet
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

    def build_masked_inputs(self, first_frame01: jax.Array, num_frames: int
                            ) -> Tuple[jax.Array, jax.Array]:
        """Returns (mask [1, F, h, w, 1], masked_latent [1, F, h, w, 4]):
        frame 0 = encoded first frame (mask 0), frames 1.. = encoded zeros
        (mask 1) — reference ``run_ddim_inversion.py:222-256`` (the zero
        frames are VAE-encoded too, not zero latents)."""
        f0 = self._encode_frames(self.params, first_frame01[None])  # [1, h, w, 4]
        zero_img = jnp.full_like(first_frame01[None], 0.5)  # pixel 0 in [-1,1]
        z0 = self._encode_frames(self.params, zero_img)
        h, w = f0.shape[1:3]
        masked = jnp.concatenate(
            [f0[None], jnp.tile(z0[None], (1, num_frames - 1, 1, 1, 1))], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((1, 1, h, w, 1), jnp.float32),
             jnp.ones((1, num_frames - 1, h, w, 1), jnp.float32)], axis=1)
        return mask, masked

    def _nine_channel(self, x, mask, masked):
        return jnp.concatenate([x, mask.astype(x.dtype), masked.astype(x.dtype)], axis=-1)

    def _apply_unet(self, params, *, sample, timestep, encoder_hidden_states,
                    pnp_flags=None):
        """One UNet forward. With a mesh, the whole forward runs as ONE
        jax.shard_map region (manual SPMD, same design as
        ``I2VGenPipeline._apply_unet``): frames sharded, spatial/cross
        attention + resnets frame-local, the temporal attention all_to_alls
        frames<->pixels inside ``_SeineTransformerBlock``. ``pnp_flags``:
        optional (conv, spatial, cross, temporal) traced bools. Falls back
        to the plain apply when the mesh is absent, frames don't divide, or
        ANYV2V_MANUAL_SPMD=0."""
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
            return SeinePnPFlags(conv=flags[0], spatial=flags[1],
                                 cross=flags[2], temporal=flags[3])

        if not use_manual:
            kw = {"pnp": mk_pnp(pnp_flags)} if pnp_flags is not None else {}
            return self.unet.apply(
                params, sample=sample, timestep=timestep,
                encoder_hidden_states=encoder_hidden_states, **kw)

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import manual_axis

        vspec = P(None, "frame", None, None, None)
        has_pnp = pnp_flags is not None
        # static python-bool flags ride the closure (see I2VGenPipeline)
        static_pnp = has_pnp and all(isinstance(f, bool) for f in pnp_flags)
        flags = pnp_flags if (has_pnp and not static_pnp) else ()

        def local(params, sample, timestep, text, flags):
            with manual_axis("frame", n):
                if static_pnp:
                    kw = {"pnp": mk_pnp(pnp_flags)}
                else:
                    kw = {"pnp": mk_pnp(flags)} if has_pnp else {}
                return self.unet.apply(
                    params, sample=sample, timestep=timestep,
                    encoder_hidden_states=text, **kw)

        rep = P()
        return jax.shard_map(
            local, mesh=mesh, in_specs=(rep, vspec, rep, rep, rep),
            out_specs=vspec, check_vma=False,
        )(params, sample, timestep, encoder_hidden_states, flags)

    # -- inversion ---------------------------------------------------------

    @cached_property
    def _invert(self):
        @partial(jax.jit, static_argnames=("total_steps",))
        def fn(params, x0, mask, masked, text, inv_ts, *, total_steps):
            step_ratio = self.schedule.num_train_timesteps // total_steps

            def body(x, t):
                inp = self._nine_channel(x, mask, masked)
                eps = self._apply_unet(
                    params["unet"], sample=inp, timestep=t,
                    encoder_hidden_states=text,
                ).astype(jnp.float32)
                t_src = jnp.minimum(t - step_ratio, self.schedule.num_train_timesteps - 1)
                x_next = self._constrain_video(ddim_transfer(self.schedule, x, eps, t_src, t))
                return x_next, x_next.astype(self.cache_dtype)

            _, traj = jax.lax.scan(body, x0.astype(jnp.float32), inv_ts)
            return traj

        return fn

    def invert(
        self,
        video_latents: jax.Array,   # [1, F, h, w, 4]
        mask: jax.Array,
        masked_latent: jax.Array,
        text_embeds: jax.Array,
        num_inversion_steps: int = 500,
        num_save_steps: int = 250,
        chunk_steps: Optional[int] = None,
        traj_store: str = "device",
    ):
        """Returns (trajectory at the save grid, its timesteps) — the
        reference persists only the 250-step toy-scheduler sub-grid
        (``run_ddim_inversion.py:295-308``). Dispatched in ``chunk_steps``
        segments (remote-TPU per-execution time limit).
        ``traj_store="host"``: offload the save-grid rows to host RAM per
        segment (long-video route — see ``I2VGenPipeline.invert``)."""
        from .common import HostTrajectory

        assert traj_store in ("device", "host"), traj_store
        inv_ts = inversion_timesteps(self.schedule, num_inversion_steps)
        save_ts = np.sort(sampling_timesteps(self.schedule, num_save_steps))
        keep = np.isin(inv_ts, save_ts)
        store = HostTrajectory() if traj_store == "host" else None
        chunks = []
        step = min(resolve_chunk_steps(chunk_steps), num_inversion_steps)
        x = self._put_video(video_latents)
        mask = self._put_video(mask)
        masked_latent = self._put_video(masked_latent)
        for start in range(0, num_inversion_steps, step):
            traj_chunk = self._invert(
                self.params, x, mask, masked_latent,
                self._put_replicated(text_embeds),
                jnp.asarray(inv_ts[start:start + step], jnp.int32),
                total_steps=num_inversion_steps,
            )
            x = traj_chunk[-1].astype(jnp.float32)
            # subselect the save grid per chunk (peak footprint = one chunk)
            rows = np.nonzero(keep[start:start + step])[0]
            traj_chunk = jnp.take(traj_chunk, jnp.asarray(rows), axis=0)
            if store is not None:
                store.append(traj_chunk)
            else:
                chunks.append(traj_chunk)
        if store is not None:
            return store, inv_ts[keep]
        traj = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
        return traj, inv_ts[keep]

    # -- PnP editing -------------------------------------------------------

    @cached_property
    def _sample_pnp(self):
        @partial(jax.jit, static_argnames=("sampler", "do_cfg",
                                           "static_flags"))
        def fn(params, init_latent, traj, text_all, mask, masked_edit, masked_src,
               step_data, cfg, noises, *, sampler, do_cfg, static_flags=None):
            def body(x, step):
                if static_flags is None:
                    (t, t_prev, cache_i, inj_conv, inj_sp, inj_tmp, inj_x,
                     noise) = step
                    flags = (inj_conv, inj_sp, inj_x, inj_tmp)
                else:
                    t, t_prev, cache_i, noise = step
                    flags = static_flags
                src = jax.lax.dynamic_index_in_dim(traj, cache_i, 0, keepdims=False
                                                   ).astype(jnp.float32)
                src_in = self._nine_channel(src, mask, masked_src)
                x_in = self._nine_channel(x, mask, masked_edit)
                inp = jnp.concatenate([src_in, x_in, x_in], axis=0)
                eps3 = self._apply_unet(
                    params["unet"], sample=inp, timestep=t,
                    encoder_hidden_states=text_all,
                    pnp_flags=flags,
                ).astype(jnp.float32)
                # SEINE order: [src, cond, uncond] (run_pnp_edit.py:183-215)
                _s, e_cond, e_uncond = jnp.split(eps3, 3, axis=0)
                eps = e_uncond + cfg * (e_cond - e_uncond) if do_cfg else e_cond
                if sampler == "ddpm":
                    x = ddpm_step(self.schedule, x, eps, t, t_prev, noise)
                else:
                    x = ddim_step(self.schedule, x, eps, t, t_prev)
                return self._constrain_video(x), None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32),
                                  (*step_data, noises))
            return out

        return fn

    @cached_property
    def _sample_pnp_tail(self):
        """Post-injection tail: same rows/CFG as :attr:`_sample_pnp` minus the
        source branch (its eps is discarded by the combine)."""
        @partial(jax.jit, static_argnames=("sampler", "do_cfg"))
        def fn(params, init_latent, text_all, mask, masked_edit,
               step_data, cfg, noises, *, sampler, do_cfg):
            def body(x, step):
                t, t_prev, noise = step
                x_in = self._nine_channel(x, mask, masked_edit)
                inp = jnp.concatenate([x_in, x_in], axis=0)
                eps2 = self._apply_unet(
                    params["unet"], sample=inp, timestep=t,
                    encoder_hidden_states=text_all,
                ).astype(jnp.float32)
                e_cond, e_uncond = jnp.split(eps2, 2, axis=0)
                eps = e_uncond + cfg * (e_cond - e_uncond) if do_cfg else e_cond
                if sampler == "ddpm":
                    x = ddpm_step(self.schedule, x, eps, t, t_prev, noise)
                else:
                    x = ddim_step(self.schedule, x, eps, t, t_prev)
                return self._constrain_video(x), None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32),
                                  (*step_data, noises))
            return out

        return fn

    def sample_with_pnp(
        self,
        traj: jax.Array,
        traj_ts: np.ndarray,
        text_embeds_all: jax.Array,   # [3, S, D] rows [inv, cond, uncond]
        mask: jax.Array,
        masked_edit_latent: jax.Array,
        masked_src_latent: jax.Array,
        num_inference_steps: int = 50,
        cfg_scale: float = 4.0,
        sampler: str = "ddpm",
        pnp: Optional[SeinePnPConfig] = None,
        key: Optional[jax.Array] = None,
        init_latent: Optional[jax.Array] = None,
        split_scan: bool = True,
    ) -> jax.Array:
        pnp = pnp or SeinePnPConfig()
        if sampler == "ddpm":
            ts = ddpm_grid(self.schedule, num_inference_steps)
            lookup = ts + 1  # cache at t+1 (run_pnp_edit.py:180)
        else:
            ts = sampling_timesteps(self.schedule, num_inference_steps)
            lookup = ts
        step_ratio = self.schedule.num_train_timesteps // num_inference_steps
        ts_prev = ts - step_ratio

        m_conv = injection_step_mask(ts, pnp.conv, num_inference_steps)
        m_sp = injection_step_mask(ts, pnp.spatial, num_inference_steps)
        m_tmp = injection_step_mask(ts, pnp.temporal, num_inference_steps)
        m_x = injection_step_mask(ts, pnp.cross, num_inference_steps)

        t_to_row = {int(t): i for i, t in enumerate(traj_ts)}
        try:
            cache_idx = np.array([t_to_row[int(t)] for t in lookup], np.int32)
        except KeyError as e:
            raise ValueError(f"timestep {e} not in the saved trajectory grid") from None

        if init_latent is None:
            init_latent = traj[cache_idx[0]]
        if key is None:
            key = jax.random.PRNGKey(0)
        noises = jax.random.normal(
            key, (len(ts),) + tuple(init_latent.shape), jnp.float32)

        m_any = m_conv | m_sp | m_tmp | m_x
        n_run = len(ts)
        k_inj = int(np.max(np.nonzero(m_any)[0])) + 1 if m_any.any() else 0
        if not split_scan:
            k_inj = n_run

        # host-resident grid: device-load only the injection scan's rows
        traj, cache_idx = self._device_rows_for_scan(traj, cache_idx, k_inj)

        x = self._put_video(init_latent)
        mask = self._put_video(mask)
        text_embeds_all = self._put_replicated(text_embeds_all)
        if k_inj > 0:
            import os

            m_edit = self._put_video(masked_edit_latent.astype(jnp.float32))
            m_src = self._put_video(masked_src_latent.astype(jnp.float32))
            if os.environ.get("ANYV2V_PNP_STATIC", "1") != "0":
                # constant-flag runs compiled with STATIC flags (see
                # I2VGenPipeline.sample_with_pnp); pattern order matches the
                # traced tuple: (conv, spatial, cross, temporal)
                from .common import group_constant_runs

                runs = group_constant_runs((m_conv, m_sp, m_x, m_tmp), k_inj)
                for start, pat, stop in runs:
                    step_data = (
                        jnp.asarray(ts[start:stop], jnp.int32),
                        jnp.asarray(ts_prev[start:stop], jnp.int32),
                        jnp.asarray(cache_idx[start:stop], jnp.int32),
                    )
                    x = self._sample_pnp(
                        self.params, x, traj, text_embeds_all, mask,
                        m_edit, m_src, step_data, jnp.float32(cfg_scale),
                        noises[start:stop], sampler=sampler,
                        do_cfg=cfg_scale > 1.0, static_flags=pat,
                    )
            else:
                step_data = (
                    jnp.asarray(ts[:k_inj], jnp.int32),
                    jnp.asarray(ts_prev[:k_inj], jnp.int32),
                    jnp.asarray(cache_idx[:k_inj], jnp.int32),
                    jnp.asarray(m_conv[:k_inj]), jnp.asarray(m_sp[:k_inj]),
                    jnp.asarray(m_tmp[:k_inj]), jnp.asarray(m_x[:k_inj]),
                )
                x = self._sample_pnp(
                    self.params, x, traj, text_embeds_all, mask,
                    m_edit, m_src, step_data, jnp.float32(cfg_scale),
                    noises[:k_inj], sampler=sampler, do_cfg=cfg_scale > 1.0,
                )
        if k_inj < n_run:
            # injection over: drop the source branch from the batch
            step_data2 = (jnp.asarray(ts[k_inj:], jnp.int32),
                          jnp.asarray(ts_prev[k_inj:], jnp.int32))
            x = self._sample_pnp_tail(
                self.params, x, text_embeds_all[1:], mask,
                self._put_video(masked_edit_latent.astype(jnp.float32)),
                step_data2, jnp.float32(cfg_scale), noises[k_inj:],
                sampler=sampler, do_cfg=cfg_scale > 1.0,
            )
        return x


def seine_frame_mask(mask_type: str, num_frames: int, h: int, w: int) -> jnp.ndarray:
    """Reference ``seine/seine_utils.py:5-29`` frame-mask builder, channels-
    last [1, F, h, w, 1]: 0 = keep (conditioning frame), 1 = generate.

    - "firstN": first N frames kept;
    - "all": everything generated;
    - "onelastN": N frames kept at each end (SEINE's transition mode).
    AnyV2V uses "first1" (``run_ddim_inversion.py:222-256``).
    """
    if mask_type.startswith("first"):
        num = int(mask_type.split("first")[-1])
        per_frame = np.concatenate(
            [np.zeros(num, np.float32), np.ones(num_frames - num, np.float32)])
    elif mask_type.startswith("all"):
        per_frame = np.ones(num_frames, np.float32)
    elif mask_type.startswith("onelast"):
        num = int(mask_type.split("onelast")[-1])
        per_frame = np.concatenate(
            [np.zeros(num, np.float32),
             np.ones(num_frames - 2 * num, np.float32),
             np.zeros(num, np.float32)])
    else:
        raise ValueError(f"Invalid mask type: {mask_type}")
    return jnp.asarray(per_frame)[None, :, None, None, None] * jnp.ones(
        (1, num_frames, h, w, 1), jnp.float32)
