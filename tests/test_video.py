"""Batched video detection: detect.py's detect_video must process every
frame through the device in `video_bs` batches (reference detect.py:102-167
runs bs=1 per frame) and write an output video with the same frame count."""
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

# ~45 s on the CPU mesh (full detect pipeline over 11 frames) — slow tier,
# like the other integration drivers (deploy, train_step).
pytestmark = pytest.mark.slow

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector

IMG = 64
N_FRAMES = 11   # deliberately not a multiple of video_bs (tail padding path)


def test_detect_video_batched(tmp_path, rng, monkeypatch):
    src = str(tmp_path / 'in.mp4')
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*'mp4v'), 10, (96, 80))
    for i in range(N_FRAMES):
        frame = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
        w.write(frame)
    w.release()

    cfg = get_config('res50_custom', mode='detect', img_size=IMG,
                     video=src, video_bs=4, real_time=False)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                           train=False)
    detector = Detector(cfg, variables)

    from detect import detect_video
    monkeypatch.chdir(tmp_path)
    os.makedirs('results/videos', exist_ok=True)
    detect_video(detector, cfg)

    out = cv2.VideoCapture(str(tmp_path / 'results/videos/in.mp4'))
    assert round(out.get(cv2.CAP_PROP_FRAME_COUNT)) == N_FRAMES
    assert round(out.get(cv2.CAP_PROP_FRAME_WIDTH)) == 96
    assert round(out.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 80
    out.release()
