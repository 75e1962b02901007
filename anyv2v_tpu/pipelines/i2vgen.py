"""I2VGen-XL AnyV2V pipeline: jitted DDIM inversion + PnP editing scans.

Replaces the reference's ``I2VGenXLPipeline.{invert, sample_with_pnp,
__call__}`` drivers (``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:1195/890/652``)
with two ``lax.scan`` programs:

- the per-step ``torch.save``/``torch.load`` latent-cache filesystem bus
  (``:1424-1428`` / ``:1134``) becomes a trajectory array resident in HBM,
  gathered per step by index;
- the per-step ``register_time`` + monkey-patched hooks (``:1143``,
  ``pnp_utils.py``) become boolean per-step injection vectors scanned
  alongside the timesteps;
- CFG batch layout matches the reference exactly (``:1135-1165``):
  rows = [src, x, x]; context rows = [inv_prompt, negative, edit]; image
  conditioning rows = [source 1st frame, edited, edited] (``:1040-1094``);
  eps = eps_neg + cfg * (eps_edit - eps_neg), src row discarded.

Precision policy (validated in tests/verification): scan carries and the
trajectory cache are fp32; the UNet computes in its configured dtype (bf16 on
TPU). The reference runs fp16 end-to-end and tolerates drift only because
sampling restarts from a *cached* latent — we keep that property and remove
the drift.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..models.clip import CLIPTextModel, CLIPVisionModel
from .common import HostTrajectory, LatentCodecMixin, resolve_chunk_steps
from ..models.unet_i2vgen import I2VGenUNet, PnPFlags
from ..models.vae import AutoencoderKL
from ..schedulers import (
    DiffusionSchedule,
    ddim_inverse_step,
    ddim_step,
    inversion_timesteps,
    sampling_timesteps,
)
from ..ops.pnp import injection_step_mask


@dataclasses.dataclass
class PnPConfig:
    """pnp_f_t / pnp_spatial_attn_t / pnp_temp_attn_t thresholds
    (reference ``group_pnp_edit/template.yaml:36-38`` defaults)."""

    conv: float = 0.2
    spatial: float = 0.2
    temporal: float = 0.5


@dataclasses.dataclass
class I2VGenPipeline(LatentCodecMixin):
    """Module bundle + compiled drivers. Params are a single dict with keys
    ``unet / vae / text / vision`` (each a flax variables dict).

    ``mesh`` (optional): a ('cfg', 'frame') mesh from
    :func:`anyv2v_tpu.parallel.mesh.make_mesh`. When set, video tensors are
    sharded over the frame axis and CFG rows over the cfg axis (SURVEY.md
    §2.6): spatial UNet layers and the VAE are embarrassingly parallel over
    frames; temporal layers all-gather over ICI. Params are replicated. The
    inversion trajectory stays frame-sharded in HBM. With mesh=None the
    pipeline is the plain single-device program (the CI/CPU default).
    """

    unet: I2VGenUNet
    vae: AutoencoderKL
    text_encoder: CLIPTextModel
    vision_encoder: CLIPVisionModel
    schedule: DiffusionSchedule
    params: Dict[str, Any]
    cache_dtype: jnp.dtype = jnp.float32
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        self._shard_params_if_mesh()

    # sharding helpers (_put_video/_put_replicated/_constrain_video/
    # _put_frames) come from ShardingMixin via LatentCodecMixin

    # ------------------------------------------------------------------
    # UNet dispatch: manual-SPMD region over the mesh
    # ------------------------------------------------------------------

    def _apply_unet(self, params, *, sample, timestep, encoder_hidden_states,
                    fps, image_latents, image_embeddings, pnp_flags=None):
        """One UNet forward. With a mesh, the whole forward runs as ONE
        jax.shard_map region (manual SPMD): frames sharded, spatial compute
        local, temporal ops all_to_all frames<->pixels inside
        (parallel/mesh.py). GSPMD never partitions the UNet interior — the
        Pallas calls are SPMD-opaque and GSPMD's replicate-fallback both
        ICEd and miscompiled around per-op boundaries on this XLA build.

        ``image_latents`` enters REPLICATED (its temporal encoder needs all
        frames; the path is step-invariant and hoisted out of the scan).
        ``pnp_flags``: optional (conv, spatial, temporal) traced bools —
        requires the cfg mesh axis unsharded (the injection row swap is a
        cross-CFG-row operation). Falls back to the plain single-program
        apply when the mesh is absent, frames don't divide, or
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
        if not use_manual:
            kw = {}
            if pnp_flags is not None:
                kw["pnp"] = PnPFlags(conv=pnp_flags[0], spatial=pnp_flags[1],
                                     temporal=pnp_flags[2])
            return self.unet.apply(
                params, sample=sample, timestep=timestep,
                encoder_hidden_states=encoder_hidden_states, fps=fps,
                image_latents=image_latents,
                image_embeddings=image_embeddings, **kw)

        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import manual_axis

        vspec = P(None, "frame", None, None, None)
        has_pnp = pnp_flags is not None
        # STATIC flags (python bools, the per-pattern segmented scan) ride
        # the closure — an operand would re-trace them into arrays and undo
        # the compile-time fold
        static_pnp = has_pnp and all(
            isinstance(f, bool) for f in pnp_flags)
        flags = pnp_flags if (has_pnp and not static_pnp) else ()

        def local(params, sample, timestep, text, fps, image_latents,
                  image_embeddings, flags):
            with manual_axis("frame", n):
                kw = {}
                if static_pnp:
                    kw["pnp"] = PnPFlags(conv=pnp_flags[0],
                                         spatial=pnp_flags[1],
                                         temporal=pnp_flags[2])
                elif has_pnp:
                    kw["pnp"] = PnPFlags(conv=flags[0], spatial=flags[1],
                                         temporal=flags[2])
                return self.unet.apply(
                    params, sample=sample, timestep=timestep,
                    encoder_hidden_states=text, fps=fps,
                    image_latents=image_latents,
                    image_embeddings=image_embeddings, **kw)

        rep = P()
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(rep, vspec, rep, rep, rep, rep, rep, rep),
            out_specs=vspec, check_vma=False,
        )(params, sample, timestep, encoder_hidden_states, fps,
          image_latents, image_embeddings, flags)

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------

    # _encode_frames / encode_video / _decode / decode_latents / encode_text
    # come from LatentCodecMixin; _put_frames (below) shards over the mesh.

    def prepare_image_latents(self, image01: jax.Array, num_frames: int) -> jax.Array:
        """Conditioning-frame latent + (F-1) position-mask frames scaled
        (i+1)/(F-1) (reference ``prepare_image_latents``,
        ``pipeline_i2vgen_xl.py:532-562``). Returns [1, F, h, w, 4]."""
        z = self._encode_frames(self.params, image01[None])  # [1, h, w, 4]
        h, w, c = z.shape[1:]
        masks = [
            jnp.full((1, h, w, c), (i + 1) / (num_frames - 1), jnp.float32)
            for i in range(num_frames - 1)
        ]
        return jnp.stack([z[0], *[m[0] for m in masks]], axis=0)[None]

    def encode_image_clip(self, image_clip: jax.Array) -> jax.Array:
        """CLIP-normalized [1, 224, 224, 3] -> [1, 1, proj_dim]
        (reference ``_encode_image``, ``pipeline_i2vgen_xl.py:411``)."""
        _, embeds = self.vision_encoder.apply(self.params["vision"], image_clip)
        return embeds[:, None, :]

    # ------------------------------------------------------------------
    # inversion
    # ------------------------------------------------------------------

    @cached_property
    def _invert(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("total_steps",))
        def fn(params, video_latents, text_embeds, image_latents, image_embeds,
               inv_ts, fps, *, total_steps):
            n_steps = total_steps

            def body(x, t):
                eps = self._apply_unet(
                    params["unet"],
                    sample=x,
                    timestep=t,
                    encoder_hidden_states=text_embeds,
                    fps=fps,
                    image_latents=image_latents,
                    image_embeddings=image_embeds,
                )
                x_next = self._constrain_video(ddim_inverse_step(
                    self.schedule, x, eps.astype(jnp.float32), t, n_steps
                ))
                return x_next, x_next.astype(self.cache_dtype)

            _, traj = jax.lax.scan(body, video_latents.astype(jnp.float32), inv_ts)
            return traj  # [n_steps, 1, F, h, w, 4] ascending-t order

        return fn

    def invert(
        self,
        video_latents: jax.Array,     # [1, F, h, w, 4] clean scaled latents
        text_embeds: jax.Array,       # [1, S, D] (empty prompt for inversion)
        image_latents: jax.Array,     # [1, F, h, w, 4] src-frame conditioning
        image_embeds: jax.Array,      # [1, 1, D]
        num_inversion_steps: int = 500,
        fps: int = 8,
        chunk_steps: Optional[int] = None,
        num_save_steps: Optional[int] = None,
        traj_store: str = "device",
    ):
        """Returns (trajectory [n, 1, F, h, w, 4], ascending timesteps [n]).

        Reference: 500 UNet forwards at batch 1, cfg 1.0, empty prompt
        (``template.yaml:29-33``; hot loop ``pipeline_i2vgen_xl.py:1385-1433``).

        The scan is dispatched in ``chunk_steps`` segments (one compiled
        program, re-invoked with the carried latent): a single 500-step
        device execution (~2 min) exceeds the remote-TPU per-execution limit,
        and chunking also bounds peak trajectory workspace.

        ``num_save_steps`` (SEINE's save-grid precedent,
        ``seine/configs/ddim_inversion.yaml:31``): keep only trajectory rows
        whose timesteps lie on the coarser ``num_save_steps`` grid. With
        leading spacing the 50-step sampling grid nests inside any save grid
        that is a multiple of 50, so editing is unaffected while the
        retained trajectory shrinks proportionally — the difference between
        fitting and not fitting a 128-frame 500-point inversion in one
        chip's HBM (a full fp32 grid there is 16.8 GB).

        ``traj_store="host"``: keep the FULL grid, but in host memory — the
        reference's per-step disk cache (``pipeline_i2vgen_xl.py:1424-1428``)
        without the disk. Each scan segment is offloaded as it completes
        (peak device footprint = one ``chunk_steps`` segment), and the
        returned :class:`~anyv2v_tpu.pipelines.common.HostTrajectory` feeds
        the editor only the rows on its sampling grid. This is how a
        128-frame 500-point FULL grid runs on one 16 GB chip.
        """
        assert traj_store in ("device", "host"), traj_store
        inv_ts = inversion_timesteps(self.schedule, num_inversion_steps)
        keep = None
        if num_save_steps is not None and num_save_steps < num_inversion_steps:
            save_ts = set(
                int(t) for t in
                inversion_timesteps(self.schedule, num_save_steps))
            keep = np.array([int(t) in save_ts for t in inv_ts])
        args = (
            self._put_replicated(text_embeds),
            # replicated (not frame-sharded): the manual-SPMD UNet region
            # consumes all frames of the conditioning latents on every chip
            # (see _apply_unet)
            self._put_replicated(image_latents),
            self._put_replicated(image_embeds),
        )
        x = self._put_video(video_latents)
        store = HostTrajectory() if traj_store == "host" else None
        chunks = []
        step = min(resolve_chunk_steps(chunk_steps), num_inversion_steps)
        for start in range(0, num_inversion_steps, step):
            ts_chunk = inv_ts[start:start + step]
            traj_chunk = self._invert(
                self.params, x, *args,
                jnp.asarray(ts_chunk, jnp.int32), jnp.int32(fps),
                total_steps=num_inversion_steps,
            )
            x = traj_chunk[-1].astype(jnp.float32)
            if keep is not None:
                # subselect per chunk so the peak footprint is one chunk +
                # the retained rows, never the full grid
                rows = np.nonzero(keep[start:start + step])[0]
                traj_chunk = jnp.take(traj_chunk, jnp.asarray(rows), axis=0)
            if store is not None:
                store.append(traj_chunk)  # device -> host, frees the chunk
            else:
                chunks.append(traj_chunk)
        kept_ts = inv_ts[keep] if keep is not None else inv_ts
        if store is not None:
            return store, kept_ts
        traj = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
        return traj, kept_ts

    # ------------------------------------------------------------------
    # PnP editing / plain sampling
    # ------------------------------------------------------------------

    @cached_property
    def _sample_pnp(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("static_flags",))
        def fn(params, init_latent, traj, text_embeds_all, image_latents_all,
               image_embeds_all, fps3, step_data, cfg, static_flags=None):
            def body(x, step):
                if static_flags is None:
                    t, t_prev, cache_i, inj_conv, inj_sp, inj_tmp = step
                    flags = (inj_conv, inj_sp, inj_tmp)
                else:
                    # per-pattern segmented scan: the flags are trace-time
                    # constants, so clean layers compile with zero injection
                    # traffic (the traced-where keeps both operands live)
                    t, t_prev, cache_i = step
                    flags = static_flags
                src = jax.lax.dynamic_index_in_dim(
                    traj, cache_i, axis=0, keepdims=False
                ).astype(jnp.float32)
                inp = self._constrain_cfg_rows(jnp.concatenate([src, x, x], axis=0))
                eps3 = self._apply_unet(
                    params["unet"],
                    sample=inp,
                    timestep=t,
                    encoder_hidden_states=text_embeds_all,
                    fps=fps3,
                    image_latents=image_latents_all,
                    image_embeddings=image_embeds_all,
                    pnp_flags=flags,
                ).astype(jnp.float32)
                _eps_src, eps_neg, eps_edit = jnp.split(eps3, 3, axis=0)
                eps = eps_neg + cfg * (eps_edit - eps_neg)
                x = self._constrain_video(ddim_step(self.schedule, x, eps, t, t_prev))
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), step_data)
            return out

        return fn

    def sample_with_pnp(
        self,
        traj: jax.Array,               # inversion trajectory (ascending t)
        inv_ts: np.ndarray,            # its timesteps
        text_embeds_all: jax.Array,    # [3, S, D]: [inv_prompt, negative, edit]
        image_latents_all: jax.Array,  # [3, F, h, w, 4]: [src, edited, edited]
        image_embeds_all: jax.Array,   # [3, 1, D]:       [src, edited, edited]
        num_inference_steps: int = 50,
        t_idx: int = 0,                # ddim_init_latents_t_idx
        guidance_scale: float = 9.0,
        pnp: Optional[PnPConfig] = None,
        fps: int = 8,
        init_latent: Optional[jax.Array] = None,
        split_scan: bool = True,
    ) -> jax.Array:
        """PnP editing loop (reference ``sample_with_pnp``,
        ``pipeline_i2vgen_xl.py:890``; driver ``run_group_pnp_edit.py:59``).

        Starts from the cached inverted latent at ``timesteps[t_idx]`` (or an
        explicit ``init_latent``, e.g. blended with noise by ``random_ratio``),
        runs the truncated grid ``timesteps[t_idx:]``, injecting source
        conv/attention features per the PnP threshold schedules.

        ``split_scan`` (default): once every injection schedule has expired
        (step >= max threshold, known statically), the source branch's output
        is discarded by the CFG combine — so the remaining steps run a
        batch-2 scan without it. Mathematically identical to the monolithic
        batch-3 scan (asserted by tests); at default thresholds (temporal
        0.5) this removes a third of the UNet work from half the edit steps.
        The reference keeps the dead source row in the batch for all 50
        steps (``pipeline_i2vgen_xl.py:1130-1179``).
        """
        pnp = pnp or PnPConfig()
        ts = sampling_timesteps(self.schedule, num_inference_steps)

        # per-step injection masks on the FULL grid, then truncate — matches
        # init_pnp slicing scheduler.timesteps[:k] (run_group_pnp_edit.py:36-45)
        m_conv = injection_step_mask(ts, pnp.conv, num_inference_steps)[t_idx:]
        m_sp = injection_step_mask(ts, pnp.spatial, num_inference_steps)[t_idx:]
        m_tmp = injection_step_mask(ts, pnp.temporal, num_inference_steps)[t_idx:]

        ts_run = ts[t_idx:]
        step_ratio = self.schedule.num_train_timesteps // num_inference_steps
        ts_prev = ts_run - step_ratio

        # map each sampling timestep to its inversion-trajectory row
        t_to_row = {int(t): i for i, t in enumerate(inv_ts)}
        try:
            cache_idx = np.array([t_to_row[int(t)] for t in ts_run], np.int32)
        except KeyError as e:
            raise ValueError(
                f"sampling timestep {e} not on the inversion grid; invert with "
                f"a step count that is a multiple of {num_inference_steps}"
            ) from None

        if init_latent is None:
            init_latent = traj[cache_idx[0]]

        m_any = m_conv | m_sp | m_tmp
        n_run = len(ts_run)
        k_inj = int(np.max(np.nonzero(m_any)[0])) + 1 if m_any.any() else 0
        if not split_scan:
            k_inj = n_run

        # host-resident full grid: device-load only the rows the injection
        # scan reads (the batch-2 tail reads none), indices remapped
        traj, cache_idx = self._device_rows_for_scan(traj, cache_idx, k_inj)

        x = self._put_video(init_latent)
        if k_inj > 0:
            import os

            fps3 = jnp.full((3,), fps, jnp.int32)
            rep_args = (
                self._put_replicated(text_embeds_all),
                self._put_replicated(image_latents_all),
                self._put_replicated(image_embeds_all),
            )
            if os.environ.get("ANYV2V_PNP_STATIC", "1") != "0":
                # group the injection prefix into runs of constant
                # (conv, spatial, temporal) pattern — the masks are
                # host-known and monotone thresholds give at most ~3 runs —
                # and compile each run with STATIC flags: the traced-where
                # injection formatting (a second Q/K materialization per
                # attention, every step) folds away wherever a flag is off.
                from .common import group_constant_runs

                runs = group_constant_runs((m_conv, m_sp, m_tmp), k_inj)
                for start, pat, stop in runs:
                    step_data = (
                        jnp.asarray(ts_run[start:stop], jnp.int32),
                        jnp.asarray(ts_prev[start:stop], jnp.int32),
                        jnp.asarray(cache_idx[start:stop], jnp.int32),
                    )
                    x = self._sample_pnp(
                        self.params, x, traj, *rep_args, fps3, step_data,
                        jnp.float32(guidance_scale), static_flags=pat,
                    )
            else:
                step_data = (
                    jnp.asarray(ts_run[:k_inj], jnp.int32),
                    jnp.asarray(ts_prev[:k_inj], jnp.int32),
                    jnp.asarray(cache_idx[:k_inj], jnp.int32),
                    jnp.asarray(m_conv[:k_inj]),
                    jnp.asarray(m_sp[:k_inj]),
                    jnp.asarray(m_tmp[:k_inj]),
                )
                x = self._sample_pnp(
                    self.params, x, traj, *rep_args, fps3, step_data,
                    jnp.float32(guidance_scale),
                )
        if k_inj < n_run:
            # injection over: the source row's eps is discarded by the CFG
            # combine, so the remaining steps drop it from the batch
            step_data2 = (
                jnp.asarray(ts_run[k_inj:], jnp.int32),
                jnp.asarray(ts_prev[k_inj:], jnp.int32),
            )
            x = self._sample_plain(
                self.params, x,
                self._put_replicated(text_embeds_all[1:]),
                self._put_replicated(image_latents_all[1:]),
                self._put_replicated(image_embeds_all[1:]),
                jnp.full((2,), fps, jnp.int32), step_data2,
                jnp.float32(guidance_scale), do_cfg=True,
            )
        return x

    @cached_property
    def _sample_plain(self):
        from functools import partial

        @partial(jax.jit, static_argnames=("do_cfg",))
        def fn(params, init_latent, text_embeds_all, image_latents_all,
               image_embeds_all, fps_n, step_data, cfg, *, do_cfg):
            def body(x, step):
                t, t_prev = step
                inp = (self._constrain_cfg_rows(jnp.concatenate([x, x], axis=0))
                       if do_cfg else x)
                eps = self._apply_unet(
                    params["unet"],
                    sample=inp,
                    timestep=t,
                    encoder_hidden_states=text_embeds_all,
                    fps=fps_n,
                    image_latents=image_latents_all,
                    image_embeddings=image_embeds_all,
                ).astype(jnp.float32)
                if do_cfg:
                    eps_neg, eps_cond = jnp.split(eps, 2, axis=0)
                    eps = eps_neg + cfg * (eps_cond - eps_neg)
                x = self._constrain_video(ddim_step(self.schedule, x, eps, t, t_prev))
                return x, None

            out, _ = jax.lax.scan(body, init_latent.astype(jnp.float32), step_data)
            return out

        return fn

    def sample(
        self,
        init_latent: jax.Array,        # [1, F, h, w, 4] (e.g. cached inverted)
        text_embeds_all: jax.Array,    # [2B or B, S, D] ([neg, cond] if cfg)
        image_latents_all: jax.Array,
        image_embeds_all: jax.Array,
        num_inference_steps: int = 50,
        t_idx: int = 0,
        guidance_scale: float = 9.0,
        fps: int = 8,
    ) -> jax.Array:
        """Vanilla DDIM sampling (reference ``__call__`` /
        the reconstruction oracle in ``run_group_ddim_inversion.py:159-192``)."""
        do_cfg = guidance_scale > 1.0
        ts = sampling_timesteps(self.schedule, num_inference_steps)[t_idx:]
        step_ratio = self.schedule.num_train_timesteps // num_inference_steps
        step_data = (jnp.asarray(ts, jnp.int32), jnp.asarray(ts - step_ratio, jnp.int32))
        n = 2 if do_cfg else 1
        fps_n = jnp.full((n,), fps, jnp.int32)
        return self._sample_plain(
            self.params, self._put_video(init_latent),
            self._put_replicated(text_embeds_all),
            self._put_replicated(image_latents_all),
            self._put_replicated(image_embeds_all),
            fps_n, step_data, jnp.float32(guidance_scale),
            do_cfg=do_cfg,
        )

