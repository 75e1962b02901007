"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §2.6 — no torch.distributed
anywhere); its memory-scaling stand-ins (VAE slicing/tiling, chunked decode,
CPU offload) are replaced here by real SPMD sharding over an ICI mesh:

- axis "frame": video frames. Spatial UNet layers and the VAE fold frames
  into batch, so the frame axis is embarrassingly parallel there; temporal
  attention/conv need cross-frame communication, which XLA lowers to
  all-gathers over ICI (F <= 128 -> cheap; SURVEY.md §2.6).
- axis "cfg": the CFG branch batch (source / uncond / cond run as one batch,
  reference ``pipeline_i2vgen_xl.py:1136-1138``) — pure data parallelism.

Inference-only framework: no optimizer state, so sharding = activations +
replicated params (params fit: ~1.4B bf16 UNet ~3 GB/chip on v5e-16GB).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_cfg: int = 1,
    n_frame: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_frame is None:
        n_frame = len(devices) // n_cfg
    if n_cfg * n_frame != len(devices):
        raise ValueError(f"{n_cfg}x{n_frame} mesh != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_cfg, n_frame)
    return Mesh(arr, axis_names=("cfg", "frame"))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """[B, F, H, W, C]: CFG rows over 'cfg', frames over 'frame'."""
    return NamedSharding(mesh, P("cfg", "frame", None, None, None))


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """[N, H, W, C] flat frame batches (VAE): frames over both axes."""
    return NamedSharding(mesh, P(("cfg", "frame"), None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (inference: no optimizer state;
    ZeRO-style param sharding is unnecessary at these sizes)."""
    return jax.device_put(params, replicated(mesh))
