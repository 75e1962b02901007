"""Config / IO / tokenizer tests: OmegaConf-compatible merge+interpolation,
latent-cache round-trip in the reference-compatible layout, CLIP BPE vs
transformers' tokenizer (when its vocab can be built locally)."""

import json
import os

import numpy as np
import pytest

from anyv2v_tpu.utils.config import (
    from_dotlist,
    load_group_configs,
    load_yaml,
    merge,
    resolve,
)
from anyv2v_tpu.utils import io as vio


def test_merge_and_interpolation(tmp_path):
    tmpl = tmp_path / "template.yaml"
    tmpl.write_text(
        """
data_dir: /data
video_name: ReplaceMe
output_dir: ${data_dir}/out/${video_name}
inverse:
  n_steps: 500
  cfg: 1.0
nested:
  path: "prefix_${inverse.n_steps}_suffix"
""")
    group = tmp_path / "group.json"
    json.dump(
        [
            {"active": True, "video_name": "walk"},
            {"active": False, "video_name": "skip-me"},
            {"video_name": "run", "inverse": {"n_steps": 100}},
        ],
        group.open("w"),
    )
    cfgs = load_group_configs(str(tmpl), str(group))
    assert len(cfgs) == 2  # inactive skipped
    assert cfgs[0].output_dir == "/data/out/walk"
    assert cfgs[0].inverse.n_steps == 500 and cfgs[0].inverse.cfg == 1.0
    assert cfgs[1].output_dir == "/data/out/run"
    assert cfgs[1].inverse.n_steps == 100  # deep merge kept cfg
    assert cfgs[1].inverse.cfg == 1.0
    assert cfgs[0].nested.path == "prefix_500_suffix"  # embedded interp stringifies


def test_dotlist_overrides():
    cfg = merge(
        {"a": {"b": 1, "c": "x"}, "d": [1, 2]},
        from_dotlist(["a.b=5", "d=[3,4]", "e.f=hello", "g=null"]),
    )
    assert cfg.a.b == 5 and cfg.a.c == "x"
    assert cfg.d == [3, 4] and cfg.e.f == "hello" and cfg.g is None


def test_interpolation_whole_value_keeps_type(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text('x: 512\ny: ${x}\nsize: ["${x}", "${x}"]\n')
    cfg = resolve(load_yaml(str(p)))
    assert cfg.y == 512 and isinstance(cfg.y, int)
    assert cfg.size == [512, 512]


def test_latent_cache_roundtrip(tmp_path):
    traj = np.random.RandomState(0).randn(5, 1, 2, 4, 4, 4).astype(np.float32)
    ts = np.array([1, 201, 401, 601, 801])
    vio.save_ddim_trajectory(str(tmp_path), traj, ts)
    # consolidated load
    t2, ts2 = vio.load_ddim_trajectory(str(tmp_path))
    np.testing.assert_allclose(t2, traj)
    np.testing.assert_array_equal(ts2, ts)
    # per-timestep load (reference-compatible naming)
    lat = vio.load_ddim_latents_at_t(401, str(tmp_path))
    np.testing.assert_allclose(lat, traj[2])
    # reconstruct from per-step files only
    os.remove(tmp_path / "ddim_trajectory.npz")
    t3, ts3 = vio.load_ddim_trajectory(str(tmp_path))
    np.testing.assert_allclose(t3, traj)
    np.testing.assert_array_equal(ts3, ts)


def test_center_crop_wide():
    from PIL import Image

    img = Image.new("RGB", (640, 360), (255, 0, 0))
    out = vio.center_crop_wide(img, (512, 512))
    assert out.size == (512, 512)


def test_tokenizer_matches_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    # build a tiny-but-real BPE vocab locally (no network): character vocab +
    # a few merges, same file format as HF checkpoints
    chars = list("abcdefghijklmnopqrstuvwxyz ,.!")
    vocab = {}
    for c in chars:
        vocab.setdefault(c, len(vocab))
        vocab.setdefault(c + "</w>", len(vocab))
    merges = ["t h", "th e</w>", "a n", "an d</w>", "c a", "ca t</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        vocab.setdefault(tok, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")

    hf = transformers.CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"), model_max_length=16
    )
    from anyv2v_tpu.utils.tokenizer import CLIPTokenizer

    ours = CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"), max_length=16
    )
    for text in ["the cat and the hat.", "a man, walking!", ""]:
        want = hf(
            [text], padding="max_length", max_length=16, truncation=True,
            return_tensors="np",
        ).input_ids
        got = ours([text])
        np.testing.assert_array_equal(got, want)


def test_profiling_timers_and_trace_noop(tmp_path):
    import jax.numpy as jnp

    from anyv2v_tpu.utils.profiling import PhaseTimers, trace_if

    timers = PhaseTimers()
    x = jnp.ones((4,))
    with timers.phase("a", sync=x):
        y = x * 2
    with timers.phase("a"):
        pass
    rep = timers.report()
    assert "a" in rep and rep["a"] >= 0.0
    with trace_if(None):   # no-op path
        pass
    with trace_if(str(tmp_path / "trace")):
        _ = (x + 1).sum()
    import os
    assert os.path.exists(tmp_path / "trace")


def test_metrics_module():
    from anyv2v_tpu.utils.metrics import (frechet_distance, psnr, ssim,
                                          temporal_consistency, video_report)

    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    noisy = np.clip(a + rng.randn(*a.shape) * 0.05, 0, 1)
    p = psnr(a, noisy)
    assert 20 < p < 35
    s = ssim(a, noisy)
    assert 0.0 < s < 1.0
    # a static video is perfectly temporally consistent
    static = np.repeat(a[:1], 4, axis=0)
    tc = temporal_consistency(static)
    assert tc["psnr_t"] == float("inf") and abs(tc["ssim_t"] - 1.0) < 1e-9
    rep = video_report(noisy, a)
    assert set(rep) == {"psnr", "ssim", "psnr_t", "ssim_t"}
    # identical Gaussians -> zero Frechet distance
    mu = np.zeros(4); sig = np.eye(4)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8
