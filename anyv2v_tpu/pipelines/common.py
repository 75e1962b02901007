"""Shared pipeline plumbing: the VAE latent codec and text encoding that all
backbone pipelines use identically (the reference duplicates these per
backbone tree — ``encode_vae_video`` / ``decode_latents`` clones in
``pipeline_i2vgen_xl.py:565/443``, ``pipeline_video_editing.py:1226/358``,
``seine/run_ddim_inversion.py:222+``)."""

from __future__ import annotations

import os
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import sample_from_moments


DEFAULT_CHUNK_STEPS = 25


class HostTrajectory:
    """Full-grid inversion trajectory stored in HOST memory.

    The reference keeps the whole per-step latent cache on disk
    (``torch.save`` of ``ddim_latents_{t}.npy`` per step,
    ``i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:1424-1428``) and reloads
    individual rows during editing — so the full 500-point grid never has to
    fit in accelerator memory. This is that bus, minus the disk: the invert
    loop appends each scan chunk here (device -> host), and the edit reads
    back ONLY the rows on its sampling grid (<= ~50 of 500). A 128-frame
    500-step fp32 grid is 16.8 GB — over a single v5e chip's HBM but trivial
    in host RAM; the device-resident subset for a 50-step edit is 1/10th of
    that.

    Drop-in where a device trajectory array is accepted: ``__getitem__``
    returns a device row, ``__array__`` the full host grid (the CLI's
    ``save_ddim_trajectory``), ``gather_rows`` a device array of selected
    rows. Rows arrive in ascending-t order, matching ``inv_ts``.
    """

    def __init__(self):
        self._chunks: list[np.ndarray] = []

    def append(self, chunk: jax.Array) -> None:
        """Store a [k, B, F, h, w, C] trajectory chunk host-side. The
        device_get synchronizes the segment (the chunked invert loop already
        serializes on the carried latent, so this adds no extra sync)."""
        self._chunks.append(np.asarray(jax.device_get(chunk)))

    def __len__(self) -> int:
        return sum(c.shape[0] for c in self._chunks)

    @property
    def shape(self):
        return (len(self),) + tuple(self._chunks[0].shape[1:])

    @property
    def nbytes(self) -> int:
        return sum(c.nbytes for c in self._chunks)

    def _rows(self, rows: np.ndarray) -> np.ndarray:
        """Gather rows ACROSS chunks without materializing the full grid —
        the edit path reads <= ~50 of 500 rows, and building the grid would
        transiently double host RAM at exactly the 128-frame workload this
        store exists for."""
        rows = np.asarray(rows)
        out = np.empty((len(rows),) + tuple(self.shape[1:]),
                       self._chunks[0].dtype)
        starts = np.cumsum([0] + [c.shape[0] for c in self._chunks])
        ci = np.searchsorted(starts, rows, side="right") - 1
        for j, (r, c) in enumerate(zip(rows, ci)):
            out[j] = self._chunks[c][r - starts[c]]
        return out

    def __array__(self, dtype=None):
        # full-grid materialization (the CLI's save path); transiently
        # holds grid + chunks — fine at save time, avoided on the edit path
        g = (self._chunks[0] if len(self._chunks) == 1
             else np.concatenate(self._chunks, axis=0))
        return g if dtype is None else g.astype(dtype)

    def __getitem__(self, i):
        if isinstance(i, (int, np.integer)):
            n = len(self)
            i = int(i)
            if not -n <= i < n:   # wrap negatives only — out-of-range raises
                raise IndexError(f"row {i} out of range for {n}-row store")
            return jnp.asarray(self._rows(np.array([i % n]))[0])
        raise TypeError("HostTrajectory supports integer row indexing and "
                        "gather_rows; use np.asarray() for the full grid")

    def gather_rows(self, rows) -> jax.Array:
        """[len(rows), B, F, h, w, C] device array of the selected rows."""
        return jnp.asarray(self._rows(np.asarray(rows)))


def resolve_chunk_steps(requested: int | None = None) -> int:
    """Scan-dispatch segment length for the long inversion scans.

    Each segment is one device execution; the remote-TPU transport enforces a
    per-execution wall-clock limit (a 125-step segment at the checkpoint-true
    heads=64 step cost exceeds it and kills the worker, measured round 4).
    The default 25 keeps every architecture's segment well under the limit.

    Precedence: an EXPLICIT ``requested`` value (pipeline arg / CLI
    ``chunk_steps`` config field) always wins; ``ANYV2V_SCAN_CHUNK`` only
    fills in when the caller passed None (ADVICE r2: the env var must not
    silently override an argument a test passed on purpose)."""
    if requested is not None:
        return max(1, int(requested))
    env = os.environ.get("ANYV2V_SCAN_CHUNK", "").strip()
    if not env:
        return DEFAULT_CHUNK_STEPS
    try:
        return max(1, int(env))
    except ValueError as e:
        raise ValueError(
            f"ANYV2V_SCAN_CHUNK must be an integer, got {env!r}") from e


def group_constant_runs(masks, k: int):
    """Group steps [0, k) into maximal runs of a constant per-step flag
    pattern. ``masks``: tuple of boolean arrays (one per flag). Returns
    [(start, pattern_tuple, stop), ...] — the static-segment PnP scans
    compile one program per run (see ``I2VGenPipeline.sample_with_pnp``)."""
    runs = []
    for i in range(k):
        pat = tuple(bool(m[i]) for m in masks)
        if runs and runs[-1][1] == pat:
            runs[-1] = (runs[-1][0], pat, i + 1)
        else:
            runs.append((i, pat, i + 1))
    return runs


class ShardingMixin:
    """Frame-axis SPMD helpers shared by every backbone pipeline (SURVEY.md
    §2.6): video tensors shard over the mesh's 'frame' axis, conditioning is
    replicated, params are replicated. All helpers are identity when the
    pipeline's ``mesh`` attribute is None (the single-device default), so the
    same driver code covers both paths."""

    @property
    def _mesh(self):
        return getattr(self, "mesh", None)

    def _shard_params_if_mesh(self) -> None:
        """Call from ``__post_init__``: replicate params across the mesh."""
        if self._mesh is not None:
            from ..parallel.mesh import shard_params

            self.params = shard_params(self.params, self._mesh)

    def _video_spec(self):
        from jax.sharding import PartitionSpec as P

        return P(None, "frame", None, None, None)

    def _put_video(self, x: jax.Array) -> jax.Array:
        """Shard [B, F, h, w, C] over the frame axis."""
        if self._mesh is None:
            return x
        from jax.sharding import NamedSharding

        return jax.device_put(x, NamedSharding(self._mesh, self._video_spec()))

    def _put_replicated(self, x: jax.Array) -> jax.Array:
        if self._mesh is None:
            return x
        from ..parallel.mesh import replicated

        return jax.device_put(x, replicated(self._mesh))

    def _constrain_video(self, x: jax.Array) -> jax.Array:
        """In-jit frame-sharding constraint for scan carries (keeps XLA from
        drifting to a replicated layout between steps)."""
        if self._mesh is None:
            return x
        from jax.sharding import NamedSharding

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self._mesh, self._video_spec())
        )

    def _put_traj(self, x: jax.Array) -> jax.Array:
        """Shard a trajectory [n, B, F, h, w, C] over the frame axis (the
        at-rest layout of the inversion cache on a mesh). Replicates when F
        doesn't divide the mesh (ConsistI2V rows carry the conditioning
        frame: F_real + 1)."""
        if self._mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_frame = self._mesh.shape.get("frame", 1)
        spec = (P(None, None, "frame", None, None, None)
                if x.shape[2] % n_frame == 0 else P())
        return jax.device_put(x, NamedSharding(self._mesh, spec))

    def _device_rows_for_scan(self, traj, cache_idx: "np.ndarray", k: int):
        """Resolve a trajectory for the injection scan: a HostTrajectory is
        replaced by a device array of ONLY the rows the scan reads
        (``cache_idx[:k]``), with the indices remapped into the gathered
        subset. Device trajectories pass through unchanged. With k == 0 the
        scan never reads the trajectory — callers must not use the returned
        ``traj`` (None for a host store) outside a ``k > 0`` branch."""
        if not isinstance(traj, HostTrajectory):
            return traj, cache_idx
        if k == 0:
            return None, cache_idx
        need = np.unique(cache_idx[:k])
        traj = self._put_traj(traj.gather_rows(need))
        return traj, np.searchsorted(need, cache_idx).astype(np.int32)

    def _put_frames(self, x: jax.Array) -> jax.Array:
        """Shard a flat frame batch [N, H, W, C] over all devices (VAE path)."""
        if self._mesh is None:
            return x
        from ..parallel.mesh import frames_sharding

        return jax.device_put(x, frames_sharding(self._mesh))

    def _constrain_cfg_rows(self, x: jax.Array) -> jax.Array:
        """In-jit constraint for the concatenated CFG batch [N_cfg, F, ...]:
        rows shard over 'cfg' (pure data parallelism — the reference's only
        batch axis, ``pipeline_i2vgen_xl.py:1136-1138``), frames over 'frame'.
        Falls back to frame-only sharding on a (1, n) mesh, where the cfg
        axis is size 1."""
        if self._mesh is None:
            return x
        if self._mesh.shape.get("cfg", 1) == 1:
            return self._constrain_video(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self._mesh, P("cfg", "frame", None, None, None))
        )


class LatentCodecMixin(ShardingMixin):
    """Expects ``vae``, ``text_encoder``, ``params`` attributes. Sharding
    hooks come from :class:`ShardingMixin` (identity when ``mesh`` is None)."""

    @cached_property
    def _encode_frames(self):
        @jax.jit
        def fn(params, frames01):
            """[N, H, W, 3] in [0,1] -> scaled latents [N, h, w, 4] (mode)."""
            x = frames01 * 2.0 - 1.0
            moments = self.vae.apply(params["vae"], x, method="encode_moments")
            z = sample_from_moments(moments)
            return z.astype(jnp.float32) * self.vae.config.scaling_factor

        return fn

    def encode_video(self, frames01: jax.Array, chunk_size: int = 16) -> jax.Array:
        """[F, H, W, 3] -> [1, F, h, w, 4].

        Frames run in ``chunk_size`` batches: one 128-frame 512^2 VAE encode
        needs ~24 GB of activations — over a single chip's HBM (the reference
        hits the same wall and loops per frame / uses decode_chunk_size;
        frame-axis sharding subsumes this on a mesh, but the single-chip path
        must bound peak memory). Equal chunks reuse one compiled program."""
        n = frames01.shape[0]
        if n <= chunk_size:
            return self._encode_frames(self.params, self._put_frames(frames01))[None]
        outs = [
            self._encode_frames(self.params, self._put_frames(frames01[i:i + chunk_size]))
            for i in range(0, n, chunk_size)
        ]
        return jnp.concatenate(outs, axis=0)[None]

    @cached_property
    def _decode(self):
        @jax.jit
        def fn(params, latents):
            z = latents / self.vae.config.scaling_factor
            img = self.vae.apply(params["vae"], z, method="decode")
            return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

        return fn

    def decode_latents(self, latents: jax.Array, chunk_size: int = 16) -> jax.Array:
        """[1, F, h, w, 4] -> video [F, H, W, 3] in [0, 1] (chunked like
        encode; the reference's ``decode_chunk_size`` equivalent)."""
        z = latents[0]
        n = z.shape[0]
        if n <= chunk_size:
            return self._decode(self.params, self._put_frames(z))
        outs = [
            self._decode(self.params, self._put_frames(z[i:i + chunk_size]))
            for i in range(0, n, chunk_size)
        ]
        return jnp.concatenate(outs, axis=0)

    def encode_text(self, input_ids: jax.Array) -> jax.Array:
        hidden, _ = self.text_encoder.apply(self.params["text"], input_ids)
        return hidden
