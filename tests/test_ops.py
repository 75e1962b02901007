"""Ops layer tests: attention vs numpy reference, PnP row injection semantics
(matching the reference's in-place batch-thirds overwrite), rotary rotation
properties, T5 rel-pos bucketing, FreeInit frequency mixing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anyv2v_tpu.ops import (
    freq_mix_3d,
    inject_source_rows,
    injection_step_mask,
    multi_head_attention,
    relative_position_bias,
    relative_position_bucket,
    rotary_freqs,
    rotate_queries_or_keys,
)
from anyv2v_tpu.ops.freeinit import gaussian_low_pass_filter, ideal_low_pass_filter


def numpy_sdpa(q, k, v, heads, bias=None, scale=None):
    """Straight-line fp64 reference attention."""
    b, sq, d = q.shape
    dh = d // heads
    q = q.reshape(b, sq, heads, dh).transpose(0, 2, 1, 3).astype(np.float64)
    k = k.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3).astype(np.float64)
    v = v.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3).astype(np.float64)
    scale = scale if scale is not None else 1.0 / np.sqrt(dh)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        logits = logits + bias
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bhqk,bhkd->bhqd", w, v)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d)


def test_attention_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 7, 32).astype(np.float32)
    k = rng.randn(2, 13, 32).astype(np.float32)
    v = rng.randn(2, 13, 32).astype(np.float32)
    got = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=4)
    want = numpy_sdpa(q, k, v, heads=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_attention_with_bias_matches_numpy():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 5, 16).astype(np.float32)
    k = rng.randn(1, 5, 16).astype(np.float32)
    v = rng.randn(1, 5, 16).astype(np.float32)
    bias = rng.randn(1, 2, 5, 5).astype(np.float32)
    got = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=2, bias=jnp.asarray(bias)
    )
    want = numpy_sdpa(q, k, v, heads=2, bias=bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_inject_source_rows_matches_reference_overwrite():
    """Reference (pnp_utils.py:189-196): x[b:2b] = x[:b]; x[2b:] = x[:b]."""
    rng = np.random.RandomState(2)
    x = rng.randn(6, 4, 8).astype(np.float32)
    want = x.copy()
    want[2:4] = x[:2]
    want[4:6] = x[:2]
    got_on = inject_source_rows(jnp.asarray(x), jnp.bool_(True), num_chunks=3)
    got_off = inject_source_rows(jnp.asarray(x), jnp.bool_(False), num_chunks=3)
    np.testing.assert_allclose(np.asarray(got_on), want)
    np.testing.assert_allclose(np.asarray(got_off), x)


def test_inject_source_rows_traced_one_compile():
    traces = []

    def f(x, flag):
        traces.append(1)
        return inject_source_rows(x, flag, 3)

    jf = jax.jit(f)
    x = jnp.ones((3, 2))
    jf(x, jnp.bool_(True))
    jf(x, jnp.bool_(False))
    assert len(traces) == 1


def test_injection_step_mask_semantics():
    """run_group_pnp_edit.py:35-48 — first int(n*thr) steps of the FULL grid."""
    full_grid = np.arange(981, 0, -20)  # 50 steps
    mask = injection_step_mask(full_grid, threshold=0.2, num_inference_steps=50)
    assert mask.sum() == 10 and mask[:10].all() and not mask[10:].any()
    # threshold 1.0 -> all steps
    assert injection_step_mask(full_grid, 1.0, 50).all()
    # threshold 0.0 -> none
    assert not injection_step_mask(full_grid, 0.0, 50).any()
    # truncation semantics: slicing the mask matches slicing the grid
    t_idx = 3
    assert (mask[t_idx:] == injection_step_mask(full_grid, 0.2, 50)[t_idx:]).all()


def test_rotary_preserves_norm_and_relative_angles():
    rng = np.random.RandomState(3)
    freqs = jnp.asarray(rotary_freqs(16))
    x = jnp.asarray(rng.randn(2, 8, 16).astype(np.float32))
    rot = rotate_queries_or_keys(x, freqs)
    # rotation preserves pairwise L2 norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rot), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # relative property: <R(p)q, R(p+d)k> depends only on d
    q = jnp.asarray(rng.randn(1, 1, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 16).astype(np.float32))
    def dot_at(pq, pk):
        rq = rotate_queries_or_keys(q, freqs, seq_pos=jnp.asarray([float(pq)]))
        rk = rotate_queries_or_keys(k, freqs, seq_pos=jnp.asarray([float(pk)]))
        return float(jnp.sum(rq * rk))
    np.testing.assert_allclose(dot_at(0, 3), dot_at(5, 8), rtol=1e-4)
    # position 0 is identity
    r0 = rotate_queries_or_keys(q, freqs, seq_pos=jnp.asarray([0.0]))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(q), rtol=1e-6)


def test_relative_position_bucket_t5_properties():
    rel = np.arange(-64, 65)
    buckets = relative_position_bucket(rel[None, :], num_buckets=32, max_distance=128)[0]
    assert buckets.min() >= 0 and buckets.max() < 32
    assert buckets[64] == 0  # relative position 0
    # sign split: negative relative positions (future keys) occupy the upper half
    assert (buckets[65:] >= 16).all() and (buckets[:64] < 16).all()


def test_relative_position_bias_shape():
    emb = jnp.asarray(np.random.RandomState(4).randn(32, 8).astype(np.float32))
    bias = relative_position_bias(emb, q_len=16, k_len=16)
    assert bias.shape == (8, 16, 16)
    # same relative distance -> same bias value
    b = np.asarray(bias)
    np.testing.assert_allclose(b[:, 0, 3], b[:, 5, 8], rtol=1e-6)


def test_freq_mix_3d_limits():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 4, 8, 8, 2).astype(np.float32))
    noise = jnp.asarray(rng.randn(1, 4, 8, 8, 2).astype(np.float32))
    ones = jnp.ones((4, 8, 8), jnp.float32)
    zeros = jnp.zeros((4, 8, 8), jnp.float32)
    # all-pass filter returns x; all-block returns noise
    np.testing.assert_allclose(np.asarray(freq_mix_3d(x, noise, ones)), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(freq_mix_3d(x, noise, zeros)), np.asarray(noise), atol=1e-4)


def test_low_pass_filters():
    g = gaussian_low_pass_filter((8, 16, 16), d_s=0.25, d_t=0.25)
    assert g.shape == (8, 16, 16) and g.max() <= 1.0 and g.min() >= 0.0
    # peak at the (fftshifted) center
    assert g.argmax() == np.ravel_multi_index((4, 8, 8), g.shape)
    i = ideal_low_pass_filter((8, 16, 16))
    assert set(np.unique(i)) <= {0.0, 1.0}


def test_injection_step_mask_t1000_membership():
    """The reference always injects at t == 1000 (``pnp_utils.py:109``):
    on a grid that CONTAINS 1000 (trailing-spacing style grids) the mask is
    set there even when the threshold schedule does not reach it."""
    grid = np.array([1000, 800, 600, 400, 200, 0])
    mask = injection_step_mask(grid, threshold=0.0, num_inference_steps=6)
    assert mask[0] and not mask[1:].any()
    # and the standard leading-spacing grid (981, 961, ...) has no 1000 entry
    std = np.arange(981, -1, -20)
    assert not (std == 1000).any()
    assert not injection_step_mask(std, 0.0, 50).any()


def test_resolve_chunk_steps_env_and_precedence(monkeypatch):
    """ADVICE r2: explicit arg wins over ANYV2V_SCAN_CHUNK; env fills in only
    for None; empty/invalid env values are handled loudly."""
    from anyv2v_tpu.pipelines.common import DEFAULT_CHUNK_STEPS, resolve_chunk_steps

    monkeypatch.delenv("ANYV2V_SCAN_CHUNK", raising=False)
    assert resolve_chunk_steps(None) == DEFAULT_CHUNK_STEPS
    assert resolve_chunk_steps(40) == 40

    monkeypatch.setenv("ANYV2V_SCAN_CHUNK", "125")
    assert resolve_chunk_steps(None) == 125
    assert resolve_chunk_steps(40) == 40   # explicit arg still wins

    monkeypatch.setenv("ANYV2V_SCAN_CHUNK", "")
    assert resolve_chunk_steps(None) == DEFAULT_CHUNK_STEPS

    monkeypatch.setenv("ANYV2V_SCAN_CHUNK", "0")
    assert resolve_chunk_steps(None) == 1   # clamped, not range(..., 0)

    monkeypatch.setenv("ANYV2V_SCAN_CHUNK", "-3")
    assert resolve_chunk_steps(None) == 1

    monkeypatch.setenv("ANYV2V_SCAN_CHUNK", "fast")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ANYV2V_SCAN_CHUNK"):
        resolve_chunk_steps(None)


def test_apply_rotary_partial_matches_at_set():
    """apply_rotary_partial == the at[..., :rot_dim].set(apply_rotary(...))
    form it replaces (which lowered to a 10.9 ms/step dynamic-update-slice
    chain on the ConsistI2V trace)."""
    import numpy as np
    from anyv2v_tpu.ops.rotary import (apply_rotary, apply_rotary_partial,
                                       rotary_angles, rotary_freqs)

    rng = np.random.RandomState(0)
    for shape, rot in [((2, 16, 7, 64), 32),    # videoldm attn: [B,F,HW,C]
                       ((3, 8, 5, 4, 40), 32),  # seine: [B,F,HW,heads,dh]
                       ((2, 16, 3, 48), 48)]:   # full-width rotation
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        freqs = jnp.asarray(rotary_freqs(rot))
        pos = jnp.arange(shape[1], dtype=jnp.float32)
        a = rotary_angles(pos, freqs).reshape(
            (1, shape[1]) + (1,) * (len(shape) - 3) + (rot,))
        want = x.at[..., :rot].set(apply_rotary(x[..., :rot], a))
        got = apply_rotary_partial(x, a, rot)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_attention_backend_routing_pins_measured_decisions(monkeypatch):
    """The dispatcher's shape->kernel map encodes on-chip A/B results
    (PERF.md); pin the decisions for the documented classes so a routine
    edit can't silently re-route a hot path. Backend check is patched to
    'tpu' — _resolve is pure shape logic."""
    from anyv2v_tpu.ops import attention as att

    monkeypatch.setattr(att.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("ANYV2V_ATTN_BACKEND", raising=False)

    def r(sq, sk, dh, batch, heads):
        return att._resolve("auto", sq, sk, dh, None, None, batch=batch,
                            heads=heads)

    # i2vgen checkpoint-true L0 self (padded dh=8, heads=64)
    assert r(4096, 4096, 8, 16, 64) == "pallas_packed"   # full F=16
    # round-5 gate fix: the F_local=2 per-chip shard shape stays packed
    # (probe_flash_layout: packed 7.08 vs flash 7.74 ms at batch*sq=8192)
    assert r(4096, 4096, 8, 2, 64) == "pallas_packed"
    # below the widened gate the generic flash still wins
    assert r(1024, 1024, 16, 2, 64) == "pallas"
    # VideoLDM/SEINE spatial self (dh=40 not window-packable) -> flash
    assert r(4096, 8192, 40, 15, 8) == "pallas"
    # temporal attention over frames -> packed short kernel
    assert r(16, 16, 40, 4096, 8) == "pallas_short"
    # checkpoint-true text cross-attention (sk=157, packable heads) rides
    # the packed family — its internal variant dispatch picks wide_t there
    assert r(4096, 157, 8, 48, 64) == "pallas_packed"
    # non-packable narrow heads on short K/V -> the whole-K/V cross kernel
    from anyv2v_tpu.ops.pallas_cross_attention import cross_kv_is_supported
    if cross_kv_is_supported(4096, 157, 40):
        assert r(4096, 157, 40, 16, 8) == "pallas_cross"
