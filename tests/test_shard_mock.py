"""Mock manual-SPMD region (single-device timing emulation) — VERDICT r4
item 1 infrastructure.

``parallel.mesh.mock_manual_axis`` must trace exactly the per-chip program
of the real shard_map region: same shapes in/out of every resharding helper
and a full UNet forward at chip-local shard shapes that runs and stays
finite. Used by ``scripts/bench_shard_workload.py`` to measure the v5e-8
compute leg on the one real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyv2v_tpu.parallel.mesh import (axis_index, frames_to_pixels,
                                      gather_frames, gather_pixels,
                                      local_pixel_slice, make_mesh,
                                      manual_axis, mock_manual_axis,
                                      pixels_to_frames, pmean_axis)


def _real_local_shape(fn, x, n, in_axis=1, out_axis=1):
    """LOCAL output shape of ``fn`` inside a REAL n-device shard_map region
    (global output shape with the sharded out_axis divided by n)."""
    mesh = make_mesh(n_cfg=1, n_frame=n, devices=jax.devices()[:n])
    from jax.sharding import PartitionSpec as P

    def local(x):
        with manual_axis("frame", n):
            return fn(x)

    in_spec = [None] * x.ndim
    in_spec[in_axis] = "frame"

    def probe_out_spec(shape_ndim):
        spec = [None] * shape_ndim
        spec[out_axis] = "frame"
        return P(*spec)

    out = jax.shard_map(local, mesh=mesh, in_specs=P(*in_spec),
                        out_specs=probe_out_spec(x.ndim),
                        check_vma=False)(x)
    shape = list(out.shape)
    shape[out_axis] //= n
    return tuple(shape)


def test_mock_helpers_match_real_collective_shapes():
    """Every mock helper's LOCAL output shape equals the real collective's
    local output shape — asserted against an ACTUAL n-device shard_map
    run of the same helper, not just hardcoded expectations."""
    n = 4
    b, f_loc, p, c = 2, 2, 16, 3
    x = jnp.asarray(np.random.RandomState(0).randn(b, f_loc, p, c),
                    jnp.float32)
    x_glob = jnp.tile(x, (1, n, 1, 1))  # global input for the real region
    with mock_manual_axis("frame", n):
        a2a = frames_to_pixels(x, "frame", 1, 2)
        assert a2a.shape == (b, f_loc * n, p // n, c)
        back = pixels_to_frames(a2a, "frame", 1, 2)
        assert back.shape == x.shape
        ag_f = gather_frames(x, "frame", 1)
        assert ag_f.shape == (b, f_loc * n, p, c)
        ag_p = gather_pixels(x, "frame", 2)
        assert ag_p.shape == (b, f_loc, p * n, c)
        sl = local_pixel_slice(x, "frame", n, 2)
        assert sl.shape == (b, f_loc, p // n, c)
        assert int(axis_index("frame")) == 0
        assert pmean_axis(x, "frame") is x

    # cross-check vs the REAL collectives: an actual shard_map run of the
    # same helpers must produce the same local shard shapes (the all_to_all
    # pair keeps a sharded output; the gathers replicate and are covered by
    # the hardcoded expectations above)
    assert a2a.shape == _real_local_shape(
        lambda v: frames_to_pixels(v, "frame", 1, 2), x_glob, n,
        in_axis=1, out_axis=2)
    assert back.shape == _real_local_shape(
        lambda v: pixels_to_frames(frames_to_pixels(v, "frame", 1, 2),
                                   "frame", 1, 2), x_glob, n,
        in_axis=1, out_axis=1)


def test_mock_roundtrip_is_identity():
    """split+concat then concat+split must reproduce the input exactly —
    the mock all_to_all pair is a permutation, not a lossy reshape."""
    x = jnp.arange(2 * 2 * 8 * 3, dtype=jnp.float32).reshape(2, 2, 8, 3)
    with mock_manual_axis("frame", 4):
        y = pixels_to_frames(frames_to_pixels(x, "frame", 1, 2), "frame", 1, 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_mock_region_runs_full_unet_at_shard_shapes():
    """A tiny i2vgen UNet forward at chip-local shapes (F_local = F/n,
    image_latents replicated at full F) traces and runs under the mock
    region, producing the local-shard output shape, finite values."""
    from anyv2v_tpu.models.unet_i2vgen import I2VGenUNet, I2VGenUNetConfig

    n, F, f_loc, hw = 4, 8, 2, 16
    cfg = I2VGenUNetConfig(
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4, norm_num_groups=4,
        num_image_context_tokens=2, dtype=jnp.float32,
    )
    unet = I2VGenUNet(cfg)
    rng = np.random.RandomState(0)
    kw = dict(
        sample=jnp.asarray(rng.randn(1, f_loc, hw, hw, 4) * 0.2, jnp.float32),
        timestep=jnp.int32(500),
        encoder_hidden_states=jnp.asarray(rng.randn(1, 5, 16) * 0.1,
                                          jnp.float32),
        fps=jnp.int32(8),
        image_latents=jnp.asarray(rng.randn(1, F, hw, hw, 4) * 0.2,
                                  jnp.float32),
        image_embeddings=jnp.asarray(rng.randn(1, 1, 16) * 0.1, jnp.float32),
    )
    init_kw = dict(kw, sample=jnp.zeros((1, f_loc, hw, hw, 4)),
                   image_latents=jnp.zeros((1, F, hw, hw, 4)))
    with mock_manual_axis("frame", n):
        params = unet.init(jax.random.PRNGKey(0), **init_kw)

        def fwd(params, kw):
            with mock_manual_axis("frame", n):
                return unet.apply(params, **kw)

        out = jax.jit(fwd)(params, kw)
    assert out.shape == (1, f_loc, hw, hw, 4)
    assert np.isfinite(np.asarray(out)).all()
