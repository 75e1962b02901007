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


# ---------------------------------------------------------------------------
# Manual-SPMD region for the video UNet
# ---------------------------------------------------------------------------
#
# Pallas calls lower to tpu_custom_call, which the SPMD partitioner cannot
# partition: on a real multi-chip mesh it would all-gather every operand and
# replicate the kernel on all chips — for this model that is most of the
# step. And leaving GSPMD to invent reshardings around per-op shard_map
# boundaries proved fragile (its replicate-as-last-resort fallback both
# ICEd the HLO verifier and miscompiled the batch-2 tail scan on this XLA
# build). So the whole UNet forward runs as ONE jax.shard_map region
# (manual SPMD, scaling-book style):
#
# - frames are the sharded axis; spatial layers (convs, spatial/cross
#   attention, FFN, per-frame norms) are frame-local and need NOTHING;
# - frame-coupled ops (temporal attention, (3,1,1) temporal conv)
#   all_to_all to PIXEL sharding, compute with all frames local, and
#   all_to_all back — per-chip volume ~2/n of the tensor each way vs
#   (n-1)/n for an all-gather strategy;
# - temporal-conv groupnorm statistics pmean over the frame axis.
#
# Model/op code discovers it is inside the region via manual_axis(); with no
# region active everything is the plain single-device program.

import contextlib
import threading

import jax.numpy as jnp

_MANUAL_AXIS = threading.local()


@contextlib.contextmanager
def manual_axis(name: str, size: int):
    """Mark the dynamic extent of a shard_map region whose ``name`` axis
    shards the video frame dimension (``size`` devices). Read at trace time
    by the frame-coupled ops."""
    prev = getattr(_MANUAL_AXIS, "value", None)
    prev_mock = getattr(_MANUAL_AXIS, "mock", False)
    _MANUAL_AXIS.value = (name, size)
    _MANUAL_AXIS.mock = False
    try:
        yield
    finally:
        _MANUAL_AXIS.value = prev
        _MANUAL_AXIS.mock = prev_mock


@contextlib.contextmanager
def mock_manual_axis(name: str, size: int):
    """SINGLE-DEVICE timing emulation of a ``size``-chip manual-SPMD region.

    Inside this context the frame-coupled ops trace exactly the per-chip
    program of the real shard_map region — same kernel shapes, same grid
    sizes, same local data movement — but every collective is replaced by a
    shape-equivalent LOCAL op (all_to_all -> split+concat, all_gather ->
    tile, pmean -> identity, axis_index -> 0). The outputs are numerically
    meaningless (the other chips' frames don't exist); the point is to
    MEASURE the v5e-8 compute leg on one real chip: feed the chip-local
    shard shapes (F/n frames) and time the forward (used by
    ``scripts/bench_shard_workload.py``; VERDICT r4 item 1).

    Local-traffic fidelity: a tiled all_to_all reads the full local tensor
    and writes a full local tensor (plus ICI, modeled separately); the mock
    split+concat does the same HBM round-trip. all_gather writes n copies;
    so does the mock tile."""
    prev = getattr(_MANUAL_AXIS, "value", None)
    prev_mock = getattr(_MANUAL_AXIS, "mock", False)
    _MANUAL_AXIS.value = (name, size)
    _MANUAL_AXIS.mock = True
    try:
        yield
    finally:
        _MANUAL_AXIS.value = prev
        _MANUAL_AXIS.mock = prev_mock


def current_manual_axis():
    """(axis_name, n_devices) inside a manual-SPMD UNet region, else None."""
    return getattr(_MANUAL_AXIS, "value", None)


def _mock_size(name: str):
    """``size`` when a MOCK manual region for axis ``name`` is active."""
    if getattr(_MANUAL_AXIS, "mock", False):
        v = getattr(_MANUAL_AXIS, "value", None)
        if v is not None and v[0] == name:
            return v[1]
    return None


def frames_to_pixels(x: jax.Array, name: str, frame_axis: int,
                     pixel_axis: int) -> jax.Array:
    """[..., F_loc, ..., P, ...] -> [..., F, ..., P/n, ...] via tiled
    all_to_all over mesh axis ``name`` (frames complete, pixels split)."""
    n = _mock_size(name)
    if n is not None:
        return jnp.concatenate(jnp.split(x, n, axis=pixel_axis),
                               axis=frame_axis)
    return jax.lax.all_to_all(x, name, split_axis=pixel_axis,
                              concat_axis=frame_axis, tiled=True)


def pixels_to_frames(x: jax.Array, name: str, frame_axis: int,
                     pixel_axis: int) -> jax.Array:
    """Inverse of :func:`frames_to_pixels`."""
    n = _mock_size(name)
    if n is not None:
        return jnp.concatenate(jnp.split(x, n, axis=frame_axis),
                               axis=pixel_axis)
    return jax.lax.all_to_all(x, name, split_axis=frame_axis,
                              concat_axis=pixel_axis, tiled=True)


def gather_frames(x: jax.Array, name: str, frame_axis: int) -> jax.Array:
    """All-gather the frame axis (fallback when the pixel count doesn't
    divide the mesh — deep UNet levels with tiny grids, where the tensors
    are small enough that gathering is cheap)."""
    n = _mock_size(name)
    if n is not None:
        return jnp.concatenate([x] * n, axis=frame_axis)
    return jax.lax.all_gather(x, name, axis=frame_axis, tiled=True)


def gather_pixels(x: jax.Array, name: str, pixel_axis: int) -> jax.Array:
    """All-gather the pixel axis — used to re-replicate the conditioning
    frame's updated activations after a frame-coupled op computed it
    pixel-sharded (ConsistI2V concat mode: frame 0 rides REPLICATED through
    the sharded UNet; volume = one frame per temporal layer)."""
    n = _mock_size(name)
    if n is not None:
        return jnp.concatenate([x] * n, axis=pixel_axis)
    return jax.lax.all_gather(x, name, axis=pixel_axis, tiled=True)


def axis_index(name: str) -> jax.Array:
    """``jax.lax.axis_index`` that returns 0 inside a mock manual region
    (single-device timing emulation — there is no mesh axis to query)."""
    if _mock_size(name) is not None:
        return jnp.zeros((), jnp.int32)
    return jax.lax.axis_index(name)


def pmean_axis(x: jax.Array, name: str) -> jax.Array:
    """``jax.lax.pmean`` that is the identity inside a mock manual region
    (the real call moves a [B, G]-sized moment vector — negligible)."""
    if _mock_size(name) is not None:
        return x
    return jax.lax.pmean(x, name)


def local_pixel_slice(x: jax.Array, name: str, n: int,
                      pixel_axis: int) -> jax.Array:
    """This chip's contiguous pixel-shard slice of a REPLICATED tensor —
    the slice that aligns with :func:`frames_to_pixels`' tiled all_to_all
    split (chip i owns pixels [i*P/n, (i+1)*P/n))."""
    p_loc = x.shape[pixel_axis] // n
    i = axis_index(name)
    return jax.lax.dynamic_slice_in_dim(x, i * p_loc, p_loc, axis=pixel_axis)
