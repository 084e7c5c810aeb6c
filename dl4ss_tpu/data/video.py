"""GRID audio-visual data plumbing: lip-frame extraction + frame loading.

Rebuilds the reference's video path (Torch_multi/predata.py:37-51,161-184):
frames are extracted from `.mpg`/`.mp4` clips with an ffmpeg subprocess at a
fixed fps, then read back as resized RGB arrays. Machines without ffmpeg can
point `load_frame_dir` at pre-extracted frame directories instead — the
on-device side only ever sees (B, T_frames, H, W, 3) float arrays.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import List, Optional, Tuple

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def extract_frames(video_path, out_dir, fps: int = 25,
                   size: Tuple[int, int] = (299, 299)) -> List[str]:
    """ffmpeg subprocess extraction (predata.py:37-51): writes
    out_dir/%03d.png and returns the sorted frame paths."""
    os.makedirs(out_dir, exist_ok=True)
    cmd = ["ffmpeg", "-y", "-loglevel", "error", "-i", str(video_path),
           "-vf", f"fps={fps},scale={size[0]}:{size[1]}",
           os.path.join(out_dir, "%03d.png")]
    subprocess.run(cmd, check=True)
    return sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir)
                  if f.endswith(".png"))


def load_frame_dir(frame_dir, total_frames: int,
                   size: Tuple[int, int] = (299, 299),
                   normalize: bool = True) -> np.ndarray:
    """Read up to total_frames images (PIL), resize, -> (T, H, W, 3) f32.

    Short clips repeat the last frame (fixed T for jit), matching the
    reference's fixed `total_frames` contract (predata.py:161-184)."""
    from PIL import Image
    paths = sorted(os.path.join(frame_dir, f) for f in os.listdir(frame_dir)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not paths:
        raise FileNotFoundError(f"no frames in {frame_dir}")
    frames = []
    for p in paths[:total_frames]:
        img = Image.open(p).convert("RGB").resize(size)
        frames.append(np.asarray(img, np.float32))
    while len(frames) < total_frames:
        frames.append(frames[-1])
    out = np.stack(frames)
    if normalize:
        out = out / 127.5 - 1.0  # inception-style [-1, 1]
    return out


def load_video_bank(clip_dirs: List[str], total_frames: int,
                    size: Tuple[int, int] = (299, 299)) -> np.ndarray:
    """-> (N_clips, T, H, W, 3) float32 bank for device upload."""
    return np.stack([load_frame_dir(d, total_frames, size)
                     for d in clip_dirs])
