"""Encoded-video regression coverage (round-4; reference E2E loop:
video_test.cpp:27-75 + eval_jitter.cpp:21-49).

The reference's end-to-end path runs real encoded files through OpenCV
VideoCapture -> stabilize -> VideoWriter, and eval_jitter consumes those
files. These tests exercise the same cv2 encode/decode path end-to-end:
a deterministic synthetic clip is encoded to mp4 in a fixture (committing
a binary fixture would pin codec availability less honestly than encoding
with the same backend the app uses), driven through
apps/video_test.process_video, and the decoded output is scored with the
same median_jitter_px metric the eval_jitter CLI reports.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

from video_stabilizer_tpu.config import StabilizerParams
from video_stabilizer_tpu.utils.io import (
    HAS_CV2,
    VideoWriter,
    read_video,
    synth_shaky_clip,
)

pytestmark = pytest.mark.skipif(not HAS_CV2, reason="cv2 not available")

HERE = os.path.dirname(__file__)
APPS = os.path.join(HERE, "..", "apps")

H, W, T = 96, 128, 24


def _load_app(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(APPS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def shaky_mp4(tmp_path_factory):
    """A deterministic shaky clip, ENCODED (lossy mp4) like the reference's
    recordings — returns (path, source_array)."""
    clip = synth_shaky_clip(T, H, W, seed=33, jitter_px=1.2,
                            pan_px_per_frame=0.3)
    path = str(tmp_path_factory.mktemp("vid") / "shaky.mp4")
    with VideoWriter(path) as w:
        for f in clip:
            w.write(f)
    return path, clip


def test_mp4_write_read_roundtrip(shaky_mp4):
    """cv2 VideoWriter -> VideoCapture roundtrip: frame count, geometry,
    dtype, and bounded lossy distortion."""
    path, clip = shaky_mp4
    back = np.stack(list(read_video(path)))
    assert back.shape == clip.shape
    assert back.dtype == np.uint8
    # mp4v is lossy but must stay recognizably the same content.
    err = np.mean(np.abs(back.astype(np.int32) - clip.astype(np.int32)))
    assert err < 8.0, err
    # max_frames honors the cap (eval_jitter --max-frames path).
    assert len(list(read_video(path, max_frames=5))) == 5


def test_video_test_e2e_on_encoded_file(shaky_mp4, tmp_path):
    """apps/video_test.process_video driven by an actual .mp4 path: decode,
    stabilize (batch mode), encode — then assert the DECODED output has
    materially less jitter than the DECODED input (the reference's
    video_test -> eval_jitter loop)."""
    from video_stabilizer_tpu.utils.jitter import median_jitter_px

    path, _ = shaky_mp4
    vt = _load_app("video_test")
    params = StabilizerParams(lag=4, smoother_memory=2, crop_pixels=0)
    out_dir = str(tmp_path)
    vt.process_video(path, "enc", out_dir, "batch", params)
    out_path = os.path.join(out_dir, "processed_enc.mp4")
    assert os.path.exists(out_path)

    in_frames = list(read_video(path))
    out_frames = list(read_video(out_path))
    # Batch mode emits one output per input frame minus the lag warm-up.
    assert len(in_frames) - params.lag - 1 <= len(out_frames) <= len(in_frames)
    in_j = median_jitter_px(in_frames)
    out_j = median_jitter_px(out_frames)
    assert out_j < in_j * 0.5, (in_j, out_j)


def test_eval_jitter_cli_on_encoded_files(shaky_mp4, capsys, monkeypatch):
    """The eval_jitter CLI end-to-end on an encoded file (eval_jitter.cpp's
    contract: one median_jitter_px line per video)."""
    path, _ = shaky_mp4
    ej = _load_app("eval_jitter")
    monkeypatch.setattr(sys, "argv",
                        ["eval_jitter.py", path, "--max-frames", "16"])
    ej.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if "median_jitter_px" in ln]
    assert len(lines) == 1 and path in lines[0]
    val = float(lines[0].rsplit("=", 1)[1])
    assert 0.3 < val < 5.0, val  # the clip was synthesized with ~1.2px jitter
