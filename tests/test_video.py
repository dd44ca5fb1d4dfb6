"""First-party MJPEG-AVI video export (utils/video.py).

The reference exports novel-view videos as mp4 via ffmpeg
(triplane_sample_layered.py:180-199); this environment has no ffmpeg, so
write_video degrades to a hand-built RIFF/AVI container of JPEG frames. The
round-trip test decodes the container back and checks both the structure and
the pixels (JPEG-lossy, so approximate)."""

import os
import struct

import numpy as np
import pytest

from humanliff_tpu.utils.video import (
    read_mjpeg_avi,
    write_mjpeg_avi,
    write_video,
)


def _frames(n=6, h=48, w=64):
    # Smooth gradients (renders are smooth too): JPEG error stays small, unlike
    # white noise where any codec's error is large by construction.
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        f = np.stack(
            [(xx * 255 / w), (yy * 255 / h), np.full_like(xx, 40 * i % 255)],
            axis=-1,
        ).astype(np.uint8)
        f[:, : (i + 1) * w // n, 2] = 255
        out.append(f)
    return out


def test_mjpeg_avi_roundtrip(tmp_path):
    frames = _frames()
    path = str(tmp_path / "orbit.avi")
    write_mjpeg_avi(path, frames, fps=20)

    with open(path, "rb") as f:
        data = f.read()
    # RIFF structure: outer size matches the file, AVI fourcc, an idx1 index
    # with one entry per frame.
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    idx = data.index(b"idx1")
    n_idx = struct.unpack("<I", data[idx + 4:idx + 8])[0] // 16
    assert n_idx == len(frames)

    back = read_mjpeg_avi(path)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert b.shape == a.shape
        # JPEG at quality 92: loose pixel tolerance, tight mean tolerance.
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 8


def test_write_video_falls_back_without_ffmpeg(tmp_path):
    frames = _frames(n=3, h=32, w=32)
    out = write_video(str(tmp_path / "clip.mp4"), frames, fps=10)
    assert out is not None and os.path.exists(out)
    if out.endswith(".avi"):  # no ffmpeg in this environment
        assert len(read_mjpeg_avi(out)) == 3
    else:  # a real mp4 backend exists — the reference contract itself
        assert out.endswith(".mp4") and os.path.getsize(out) > 0


def test_mjpeg_avi_rejects_mixed_shapes(tmp_path):
    f = _frames(n=2)
    f[1] = f[1][:-8]
    with pytest.raises(ValueError):
        write_mjpeg_avi(str(tmp_path / "bad.avi"), f)
