"""Product-layer tests (SURVEY.md §2.5): video prep utilities, in-process
AnyV2V runner, headless gradio flow, Replicate-style predictor."""

import os

import numpy as np
import pytest
from PIL import Image

from anyv2v_tpu.utils.io import save_video
from anyv2v_tpu.utils.video_prep import crop_and_resize_video, extract_frames


def _make_video(path, n=8, h=72, w=96, fps=4):
    rng = np.random.RandomState(0)
    frames = rng.rand(n, h, w, 3).astype(np.float32)
    save_video(frames, str(path), fps=fps)
    return frames


def test_extract_frames_even_spacing(tmp_path):
    video = tmp_path / "v.mp4"
    _make_video(video, n=8)
    frames = extract_frames(str(video), frame_count=4)
    assert len(frames) == 4
    assert frames[0].size == (96, 72)


def test_crop_and_resize_video(tmp_path):
    video = tmp_path / "v.mp4"
    _make_video(video, n=8, fps=4)  # 2 s long
    out = crop_and_resize_video(
        str(video), str(tmp_path / "out"), clip_duration=1,
        width=32, height=32, start_time=0.0, n_frames=4, center_crop=True,
    )
    assert out and os.path.exists(out)
    from anyv2v_tpu.utils.video_prep import _read_video

    arr, fps = _read_video(out)
    assert arr.shape[1:3] == (32, 32)

    # plain resize path (no center crop)
    out2 = crop_and_resize_video(
        str(video), str(tmp_path / "out2"), use_full_clip=True,
        width=48, height=24, n_frames=8,
    )
    arr2, _ = _read_video(out2)
    assert arr2.shape[1:3] == (24, 48)


@pytest.mark.slow
def test_headless_gradio_flow_e2e(tmp_path):
    """Three-stage product flow on tiny archs: preprocess -> ip2p first-frame
    edit -> in-process AnyV2V. The reference equivalent is one gradio run
    (gradio_demo.py:240-330)."""
    from anyv2v_tpu.product.gradio_app import run_headless

    video = tmp_path / "v.mp4"
    _make_video(video, n=4, h=64, w=64)

    out = run_headless(
        str(video), "a snowy scene", "make it snowy",
        variant="instructpix2pix", editor="instructpix2pix-tiny",
        out_dir=str(tmp_path / "out"),
        runner_kwargs=dict(arch="i2vgen-tiny", dtype="float32"),
        ddim_inversion_steps=10, num_inference_steps=5,
        image_edit_steps=2,
    )
    assert os.path.exists(out)
    assert out.endswith("edited_video.mp4")
    assert os.path.exists(str(tmp_path / "out" / "edited_first_frame.png"))


@pytest.mark.slow
def test_predictor_e2e(tmp_path):
    """Cog-style service: setup once, predict end-to-end (predict.py parity)."""
    from anyv2v_tpu.product.predictor import Predictor

    video = tmp_path / "v.mp4"
    _make_video(video, n=4, h=64, w=64)

    p = Predictor()
    p.setup(arch="i2vgen-tiny", image_edit_arch="instructpix2pix-tiny")
    p.runner.dtype = "float32"
    out = p.predict(
        str(video), "make it snowy", "a snowy scene",
        num_inference_steps=5, ddim_inversion_steps=10, image_edit_steps=2,
        out_dir=str(tmp_path / "out"),
    )
    assert os.path.exists(out)


def test_build_demo_raises_without_gradio():
    from anyv2v_tpu.product.gradio_app import build_demo

    with pytest.raises(ImportError, match="gradio"):
        build_demo("instructpix2pix")


@pytest.mark.slow
def test_headless_style_variant_e2e(tmp_path):
    """The gradio_demo_style flow headless: InstantStyle first-frame edit
    (canny + IP-Adapter) feeding AnyV2V (reference gradio_demo_style.py)."""
    from anyv2v_tpu.product.gradio_app import run_headless

    video = tmp_path / "v.mp4"
    _make_video(video, n=4, h=64, w=64)
    out = run_headless(
        str(video), "van gogh style", "",
        variant="style", editor="instantstyle-tiny",
        out_dir=str(tmp_path / "out"),
        runner_kwargs=dict(arch="i2vgen-tiny", dtype="float32"),
        ddim_inversion_steps=10, num_inference_steps=5,
        image_edit_steps=2,
    )
    assert os.path.exists(out)


# ---------------------------------------------------------------------------
# gradio UI wiring (VERDICT r1 item 9: execute build_demo's component graph)
# ---------------------------------------------------------------------------

class _FakeComponent:
    def __init__(self, *a, **kw):
        self.args, self.kwargs = a, kw


class _FakeBlocks(_FakeComponent):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.clicks = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakeButton(_FakeComponent):
    last = None

    def click(self, fn, inputs=None, outputs=None):
        _FakeButton.last = dict(fn=fn, inputs=inputs, outputs=outputs)


class _FakeRow(_FakeBlocks):
    pass


def _install_fake_gradio(monkeypatch):
    import sys
    import types

    gr = types.ModuleType("gradio")
    gr.Blocks = _FakeBlocks
    gr.Row = _FakeRow
    gr.Accordion = _FakeRow
    gr.Markdown = _FakeComponent
    gr.Video = _FakeComponent
    gr.Textbox = _FakeComponent
    gr.Slider = _FakeComponent
    gr.Number = _FakeComponent
    gr.Button = _FakeButton
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


def test_build_demo_constructs_component_graph(monkeypatch, tmp_path):
    """build_demo executes against a structural gradio stub: the Blocks graph
    is built, the button handler is wired to 11 inputs / 1 output, and the
    handler delegates to run_headless with the slider values (the reference
    UI surface, gradio_demo.py:278-379)."""
    _install_fake_gradio(monkeypatch)
    import importlib

    from anyv2v_tpu.product import gradio_app

    demo = gradio_app.build_demo("instructpix2pix")
    assert isinstance(demo, _FakeBlocks)
    wired = _FakeButton.last
    assert wired is not None
    assert len(wired["inputs"]) == 11 and len(wired["outputs"]) == 1

    # the handler forwards to run_headless with parsed scalar types
    seen = {}

    def fake_run_headless(video, p, ip, **kw):
        seen.update(kw, video=video)
        return "out.mp4"

    monkeypatch.setattr(gradio_app, "run_headless", fake_run_headless)
    out = wired["fn"]("v.mp4", "prompt", "instruction", "", 50, 9.0, 1,
                      0.2, 0.2, 0.5, 42)
    assert out == "out.mp4"
    assert seen["num_inference_steps"] == 50 and seen["seed"] == 42
    assert seen["variant"] == "instructpix2pix"


def test_build_demo_style_variant_long_video(monkeypatch):
    _install_fake_gradio(monkeypatch)
    from anyv2v_tpu.product import gradio_app

    demo = gradio_app.build_demo("style")
    assert isinstance(demo, _FakeBlocks)


# ---------------------------------------------------------------------------
# demo walkthrough as a test (VERDICT r1: executable walkthrough)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_demo_walkthrough_executes(tmp_path, monkeypatch):
    """examples/demo_walkthrough.py (the reference demo.ipynb equivalent,
    i2vgen-xl/demo.ipynb) runs end-to-end on the tiny arch."""
    import runpy
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "examples",
                          "demo_walkthrough.py")
    monkeypatch.setattr(sys, "argv", [script, str(tmp_path / "demo_out")])
    runpy.run_path(script, run_name="__main__")
    outs = []
    for root, _, files in os.walk(tmp_path / "demo_out"):
        outs += [f for f in files if f.endswith(".mp4")]
    assert "source.mp4" in outs and len(outs) >= 2  # source + edited result


@pytest.mark.slow
def test_web_demo_e2e(tmp_path):
    """The dependency-free web demo (product/web_demo.py — the gradio
    surface without gradio): serve, submit the form, get the edited video
    back through the file endpoint. Same tiny-arch wiring as the headless
    flow test."""
    import threading
    import urllib.parse
    import urllib.request

    from anyv2v_tpu.product import web_demo

    video = tmp_path / "v.mp4"
    _make_video(video, n=4, h=64, w=64)

    started = threading.Event()
    t = threading.Thread(
        target=web_demo.serve,
        kwargs=dict(variant="instructpix2pix", port=0, tiny=True,
                    started=started),
        daemon=True)
    t.start()
    assert started.wait(10)
    # serve(port=0) binds an ephemeral port; read it back via the app hook
    import time

    for _ in range(100):
        if getattr(web_demo, "_LAST_SERVER", None) is not None:
            break
        time.sleep(0.1)
    httpd = web_demo._LAST_SERVER
    base = f"http://127.0.0.1:{httpd.server_port}"

    with urllib.request.urlopen(base + "/health", timeout=10) as r:
        assert b'"ok": true' in r.read()
    with urllib.request.urlopen(base + "/", timeout=10) as r:
        page = r.read().decode()
    assert "Run AnyV2V" in page and "Temporal injection" in page

    form = urllib.parse.urlencode({
        "video_path": str(video), "prompt": "a snowy scene",
        "instruct_prompt": "make it snowy",
        "ddim_inversion_steps": 10, "num_inference_steps": 5,
    }).encode()
    req = urllib.request.Request(base + "/run", data=form, method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        result = r.read().decode()
    assert "Done" in result, result[:2000]
    out = httpd.app.last["edited_video"]
    assert os.path.exists(out) and out.endswith("edited_video.mp4")

    # registered outputs are served; unregistered paths are not
    with urllib.request.urlopen(
            base + "/file?path=" + urllib.parse.quote(out), timeout=10) as r:
        assert r.headers["Content-Type"] == "video/mp4"
        assert len(r.read()) > 0
    try:
        urllib.request.urlopen(base + "/file?path=/etc/hosts", timeout=10)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised
