"""Video export with an ffmpeg-free fallback.

The reference exports novel-view orbit videos with ``imageio.mimwrite(... .mp4)``
(triplane_sample_layered.py:180-199), which needs an ffmpeg binary. This
environment has none, so :func:`write_video` degrades in order:

1. ``imageio`` mp4 (ffmpeg) when a backend exists — byte-for-byte the
   reference behavior;
2. a first-party **MJPEG-AVI** writer (:func:`write_mjpeg_avi`): each frame is
   a baseline JPEG (Pillow) inside a hand-built RIFF/AVI container with an
   ``idx1`` index. Standard players (VLC, ffplay, browsers after remux) play
   it; no third-party encoder is involved;
3. nothing (caller already saved per-frame PNGs) — only if Pillow is missing.

The AVI layout is the minimal single-video-stream form:
``RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00dc...) idx1)``.
"""

from __future__ import annotations

import io
import os
import struct
from typing import List, Optional

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.ascontiguousarray(frame)).save(
        buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_mjpeg_avi(path: str, frames: List[np.ndarray], fps: int = 20,
                    quality: int = 92) -> str:
    """Write ``frames`` (uint8 (H, W, 3), all the same size) as an MJPEG AVI."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.dtype != np.uint8:
            raise ValueError("frames must share one (H, W) and be uint8")
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        # RIFF chunks are word-aligned: odd payloads get a pad byte that is
        # not counted in the stored size.
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b"")

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / max(fps, 1)),      # dwMicroSecPerFrame
        max_size * fps,              # dwMaxBytesPerSec (upper bound)
        0,                           # dwPaddingGranularity
        0x10,                        # dwFlags: AVIF_HASINDEX
        len(frames), 0, 1,           # dwTotalFrames, dwInitialFrames, dwStreams
        max_size,                    # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,            # dwWidth, dwHeight, dwReserved[4]
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIiI4H",
        0, 0, 0,                     # dwFlags, wPriority, wLanguage
        0, 1, max(fps, 1),           # dwInitialFrames, dwScale, dwRate
        0, len(frames),              # dwStart, dwLength (in frames)
        max_size, -1, 0,             # dwSuggestedBufferSize, dwQuality, dwSampleSize
        0, 0, w, h,                  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"movi"
    index = b""
    for j in jpegs:
        # idx1 offsets point at the chunk fourcc, relative to the position of
        # the 'movi' fourcc itself (the historical convention players expect).
        index += b"00dc" + struct.pack("<3I", 0x10, len(movi_payload), len(j))
        movi_payload += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_payload)
    idx1 = chunk(b"idx1", index)

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return path


def read_mjpeg_avi(path: str):
    """Decode an MJPEG AVI written by :func:`write_mjpeg_avi` back to a list of
    uint8 (H, W, 3) frames (round-trip testing / headless inspection)."""
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"{path} is not a RIFF/AVI file")
    frames = []
    pos = data.index(b"movi") + 4
    while pos + 8 <= len(data) and data[pos:pos + 4] == b"00dc":
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        frames.append(np.asarray(Image.open(io.BytesIO(payload)).convert("RGB")))
        pos += 8 + size + (size % 2)
    return frames


def write_video(path: str, frames: List[np.ndarray], fps: int = 20) -> Optional[str]:
    """Export frames as a video, preferring the reference's mp4 contract.

    Returns the path actually written (the mp4, or a sibling ``.avi`` from the
    first-party MJPEG fallback), or None when no encoder exists at all — the
    caller's per-frame PNGs are then the only artifact.
    """
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception:
        pass
    try:
        avi = os.path.splitext(path)[0] + ".avi"
        write_mjpeg_avi(avi, frames, fps=fps)
        print(f"[video] no mp4 backend (ffmpeg) — wrote first-party MJPEG "
              f"{os.path.basename(avi)} instead")
        return avi
    except ImportError as e:
        print(f"video export skipped entirely ({e}); per-view PNGs remain")
        return None
