"""Video metadata via OpenCV (VidOR test-split ingestion).

The reference obtains test-split ``video_len`` / ``width`` / ``height`` by
decoding the whole video (reference dataloaders/dataloader_vidor.py:447-455
via ``VidRead2ImgNpLits``, utils/utils_func.py:180-192).  We read the
container header instead and fall back to a decode count only when the
header is unreliable — same values, no full decode on the hot path.
"""
from __future__ import annotations

import os


def get_video_info(path: str):
    """Returns (n_frames, (width, height)) of a video file."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    try:
        n = int(round(cap.get(cv2.CAP_PROP_FRAME_COUNT)))
        w = int(round(cap.get(cv2.CAP_PROP_FRAME_WIDTH)))
        h = int(round(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        if n <= 0 or w <= 0 or h <= 0:
            n = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if n == 0:
                    h, w = frame.shape[:2]
                n += 1
    finally:
        cap.release()
    return n, (w, h)


def find_video_file(video_dir: str, group: str, vid: str) -> str:
    """Locate <video_dir>/<group>/<vid>.<ext> for common containers."""
    for ext in (".mp4", ".avi", ".mkv", ".webm"):
        p = os.path.join(video_dir, group, vid + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"no video file for {group}/{vid} under {video_dir}")
