"""Mesh/sharding tests on the virtual 8-device CPU mesh: sharded execution
must be numerically identical to single-device, with frames partitioned over
the 'frame' axis (temporal layers force XLA all-gathers over the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.models.layers import TemporalConvLayer, TemporalTransformer
from anyv2v_tpu.parallel.mesh import (
    frames_sharding,
    make_mesh,
    replicated,
    shard_params,
    video_sharding,
)


def test_mesh_construction():
    mesh = make_mesh(n_cfg=1, n_frame=8)
    assert mesh.shape == {"cfg": 1, "frame": 8}
    with pytest.raises(ValueError):
        make_mesh(n_cfg=3)  # 3 does not divide 8


def test_sharded_temporal_transformer_matches_replicated():
    mesh = make_mesh(n_cfg=1, n_frame=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 4, 4, 16).astype(np.float32))
    tt = TemporalTransformer(heads=2, head_dim=8, groups=4)
    params = tt.init(jax.random.PRNGKey(0), x)

    want = tt.apply(params, x)

    xs = jax.device_put(x, video_sharding(mesh))
    ps = shard_params(params, mesh)
    with mesh:
        got = jax.jit(tt.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sharded_temporal_conv_matches_replicated():
    mesh = make_mesh(n_cfg=1, n_frame=8)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 4, 4, 8).astype(np.float32))
    layer = TemporalConvLayer(channels=8, groups=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    want = layer.apply(params, x)
    with mesh:
        got = jax.jit(layer.apply)(
            shard_params(params, mesh), jax.device_put(x, video_sharding(mesh))
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_frames_sharding_spec():
    mesh = make_mesh(n_cfg=2, n_frame=4)
    x = jnp.zeros((8, 4, 4, 3))
    xs = jax.device_put(x, frames_sharding(mesh))
    assert xs.sharding.is_fully_replicated is False
    y = jax.device_put(jnp.zeros((3, 3)), replicated(mesh))
    assert y.sharding.is_fully_replicated
