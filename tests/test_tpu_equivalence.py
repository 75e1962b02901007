"""On-TPU model-level kernel equivalence (skipped off-TPU).

The CPU suite exercises every Pallas kernel in interpret mode; this test is
the real-chip gate: a full-size i2vgen UNet forward with the auto kernel
policy must match the XLA-attention build to within bf16 noise. Run with
``ANYV2V_TESTS_TPU=1 pytest -m "" tests/test_tpu_equivalence.py`` on a TPU
host (conftest pins the suite to CPU otherwise; the full-size build + two
compiles take several minutes).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="real-chip kernel equivalence needs a TPU"),
]


def test_unet_forward_auto_matches_xla_within_bf16_noise():
    """Checkpoint-true i2vgen (heads=64): full production size runs the auto
    kernel policy (finiteness gate — the XLA oracle CANNOT run there: its
    unfused bf16[16,64,4096,4096] score tensor is 32 GB on a 16 GB chip,
    PERF.md kernel A/B table); the auto-vs-XLA comparison runs at latent
    hw=32, where the L0 packed-flash route (heads=64, dh=8, sq=1024) and the
    temporal/cross kernels still trip but XLA's scores fit."""
    import jax.numpy as jnp

    from anyv2v_tpu.utils.model_zoo import build_i2vgen_pipeline

    pipe = build_i2vgen_pipeline(
        arch="i2vgen-xl", init="random", dtype=jnp.bfloat16,
        sample_hw=(512, 512), num_frames=16,
        param_dtype=jnp.bfloat16, components=("unet",),
    )
    unet, params = pipe.unet, pipe.params
    D = unet.config.cross_attention_dim
    rng = np.random.RandomState(0)

    def make_args(hw):
        return dict(
            sample=jnp.asarray(rng.randn(1, 16, hw, hw, 4), jnp.float32),
            timestep=jnp.int32(981),
            encoder_hidden_states=jnp.asarray(rng.randn(1, 77, D) * 0.02,
                                              jnp.float32),
            fps=jnp.int32(8),
            image_latents=jnp.asarray(rng.randn(1, 16, hw, hw, 4),
                                      jnp.float32),
            image_embeddings=jnp.asarray(rng.randn(1, 1, D) * 0.02,
                                         jnp.float32),
        )

    # production size: auto policy must execute and stay finite
    full = make_args(64)
    out_full = np.asarray(
        jax.jit(lambda p: unet.apply(p["unet"], **full))(params), np.float32)
    assert np.isfinite(out_full).all()

    # reduced size: auto vs XLA oracle
    args = make_args(32)
    out_auto = np.asarray(
        jax.jit(lambda p: unet.apply(p["unet"], **args))(params), np.float32)

    os.environ["ANYV2V_ATTN_BACKEND"] = "xla"
    try:
        out_xla = np.asarray(
            jax.jit(lambda p: unet.apply(p["unet"], **args))(params),
            np.float32)
    finally:
        del os.environ["ANYV2V_ATTN_BACKEND"]

    assert np.isfinite(out_auto).all()
    dev = np.abs(out_auto - out_xla).max()
    std = out_xla.std()
    # measured bf16-noise scale for this model: ~0.10-0.12 max-abs at
    # out std ~0.63 (PERF.md rounds 3-4)
    assert dev < 0.35 * std, f"kernel deviation {dev} vs out std {std}"


def test_videoldm_forward_auto_matches_xla_within_bf16_noise():
    """Production-channel VideoLDM forward: exercises the wide-head temporal
    route (C=1280, heads=8, dh=160), the augmented first-frame window
    (rectangular sk = t + 8 packing), and the ff-concat spatial K/V
    (sk = 2*sq flash) on the real chip. Smaller spatial extent than
    production keeps the two compiles to ~a minute each."""
    import jax.numpy as jnp

    from anyv2v_tpu.models.unet_videoldm import VideoLDMUNet
    from anyv2v_tpu.utils.model_zoo import CONSISTI2V, fast_random_params

    unet = VideoLDMUNet(
        type(CONSISTI2V["unet"])(**{**CONSISTI2V["unet"].__dict__,
                                    "dtype": jnp.bfloat16}))
    D = unet.config.cross_attention_dim
    rng = np.random.RandomState(1)
    F, hw = 8, 32
    args = dict(
        sample=jnp.asarray(rng.randn(1, F, hw, hw, 4), jnp.float32),
        timestep=jnp.int32(801),
        encoder_hidden_states=jnp.asarray(rng.randn(1, 77, D) * 0.02,
                                          jnp.float32),
        first_frame_latents=jnp.asarray(rng.randn(1, 1, hw, hw, 4),
                                        jnp.float32),
        frame_stride=jnp.int32(3),
    )
    params = fast_random_params(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            **{**args, "sample": args["sample"][:, :2]}), 0)

    out_auto = np.asarray(
        jax.jit(lambda p: unet.apply(p, **args))(params), np.float32)
    os.environ["ANYV2V_ATTN_BACKEND"] = "xla"
    try:
        out_xla = np.asarray(
            jax.jit(lambda p: unet.apply(p, **args))(params), np.float32)
    finally:
        del os.environ["ANYV2V_ATTN_BACKEND"]

    assert np.isfinite(out_auto).all()
    dev = np.abs(out_auto - out_xla).max()
    std = out_xla.std()
    assert dev < 0.35 * std, f"kernel deviation {dev} vs out std {std}"


def test_temporal_ew_production_shape_matches_xla():
    """Compiled elementwise-product temporal kernel at the exact routed
    production shape (checkpoint-true L0: heads=64, padded dh=8, hw=4096)
    vs XLA attention on the same bf16 inputs."""
    import jax.numpy as jnp

    from anyv2v_tpu.ops.attention import temporal_attention

    rng = np.random.RandomState(0)
    b, s, hw, heads, dh = 1, 16, 4096, 64, 8
    c = heads * dh
    q = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)

    prev = os.environ.get("ANYV2V_TEMPORAL_VARIANT")
    os.environ["ANYV2V_TEMPORAL_VARIANT"] = "ew"
    try:
        out_ew = np.asarray(
            temporal_attention(q, k, v, heads=heads), np.float32)
    finally:
        if prev is None:
            os.environ.pop("ANYV2V_TEMPORAL_VARIANT", None)
        else:
            os.environ["ANYV2V_TEMPORAL_VARIANT"] = prev
    out_xla = np.asarray(
        temporal_attention(q, k, v, heads=heads, backend="xla"), np.float32)

    assert np.isfinite(out_ew).all()
    dev = np.abs(out_ew - out_xla).max()
    std = out_xla.std()
    assert dev < 0.35 * std, f"ew deviation {dev} vs out std {std}"


def test_temporal_bias_compiled_matches_xla():
    """Compiled (non-interpret) bias path of the temporal kernels on the real
    chip: SEINE's T5 relative-position bias shape (heads=8, [heads, S, Sk]
    additive scores). The CPU suite only ever runs this in interpret mode;
    this covers the Mosaic-compiled bias blocks for both the strided/packed
    router default and the forced ew variant."""
    import jax.numpy as jnp

    from anyv2v_tpu.ops.attention import temporal_attention

    rng = np.random.RandomState(2)
    b, s, hw, heads, dh = 2, 16, 1024, 8, 40
    c = heads * dh
    q = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, s, hw, c) * 0.3, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(heads, s, s) * 0.5, jnp.float32)

    out_xla = np.asarray(
        temporal_attention(q, k, v, heads=heads, bias=bias, backend="xla"),
        np.float32)
    std = out_xla.std()

    for variant in ("strided", "ew"):
        prev = os.environ.get("ANYV2V_TEMPORAL_VARIANT")
        os.environ["ANYV2V_TEMPORAL_VARIANT"] = variant
        try:
            out = np.asarray(
                temporal_attention(q, k, v, heads=heads, bias=bias),
                np.float32)
        finally:
            if prev is None:
                os.environ.pop("ANYV2V_TEMPORAL_VARIANT", None)
            else:
                os.environ["ANYV2V_TEMPORAL_VARIANT"] = prev
        assert np.isfinite(out).all()
        dev = np.abs(out - out_xla).max()
        assert dev < 0.35 * std, \
            f"{variant} bias deviation {dev} vs out std {std}"
