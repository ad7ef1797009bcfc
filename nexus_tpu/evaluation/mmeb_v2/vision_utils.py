"""Vision/video utilities for the MMEB-v2 harness (parity:
Nexus/evaluation/mmeb_v2/utils/vision_utils/{vision_utils,video_transforms}.py).

Frame extraction from raw video containers runs through OpenCV (the decord
replacement — verified against cv2-encoded mp4 in tests/test_mmeb_real.py);
pre-extracted frame directories — the format the reference itself caches
into frame_root — are supported as well.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

import numpy as np

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def qa_template(question: str, candidates: List[str], answer: str):
    """Multiple-choice prompt formatting (parity: vision_utils.py:34-47):
    returns (formatted_question, formatted_options, formatted_answer, idx)."""
    q = f"{question}\nOptions:\n"
    answer_idx = -1
    options = []
    for idx, c in enumerate(candidates):
        letter = chr(ord("A") + idx)
        q += f"({letter}) {c}\n"
        options.append(f"({letter}) {c}")
        if c == answer:
            answer_idx = idx
    return q.rstrip(), options, f"({chr(ord('A') + answer_idx)}) {answer}", answer_idx


def _natural_key(name: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def load_frames(frames_dir: str) -> List[str]:
    """Naturally-sorted frame paths in a directory."""
    if not os.path.isdir(frames_dir):
        return []
    names = [f for f in os.listdir(frames_dir) if f.lower().endswith(IMAGE_EXTENSIONS)]
    return [os.path.join(frames_dir, f) for f in sorted(names, key=_natural_key)]


def sample_frames(frames: List[str], num_segments: int) -> List[str]:
    """Uniform temporal sampling; repeats the last frame for short clips."""
    if not frames:
        return []
    idx = np.linspace(0, len(frames) - 1, num_segments, dtype=int)
    out = [frames[i] for i in idx]
    while len(out) < num_segments:
        out.append(frames[int(idx[-1])])
    return out


def process_video_frames(frame_dir: str, num_frames: Optional[int] = None) -> List[str]:
    if num_frames == 0:
        return []
    frames = load_frames(frame_dir)
    if num_frames is None or num_frames > len(frames):
        return frames
    return sample_frames(frames, num_frames)


def get_total_frames(video_path: str) -> int:
    try:
        import cv2  # noqa

        cap = cv2.VideoCapture(video_path)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return n
    except ImportError:
        try:
            import decord  # noqa

            return len(decord.VideoReader(video_path))
        except ImportError:
            return 0


def save_frames(video_path: str, frame_dir: str, max_frames_saved: int,
                file_name_prefix: str = "") -> None:
    """Extract up to max_frames_saved frames from a raw video into frame_dir
    via OpenCV. No-ops when frames already exist; raises when no decoder can
    open the container."""
    if os.path.isdir(frame_dir) and any(
        f.lower().endswith(IMAGE_EXTENSIONS) for f in os.listdir(frame_dir)
    ):
        return
    if not os.path.exists(video_path):
        raise FileNotFoundError(f"video {video_path} does not exist")
    total = get_total_frames(video_path)
    if total == 0:
        raise RuntimeError(
            f"no video decoder available (cv2/decord) for {video_path}; "
            "pre-extract frames into the frame_root instead"
        )
    import cv2

    os.makedirs(frame_dir, exist_ok=True)
    indices = (list(range(total)) if total <= max_frames_saved
               else np.linspace(0, total - 1, max_frames_saved, dtype=int).tolist())
    cap = cv2.VideoCapture(video_path)
    for j, fi in enumerate(indices):
        cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
        ok, frame = cap.read()
        if not ok:
            break
        cv2.imwrite(os.path.join(frame_dir, f"{file_name_prefix}{j:04d}.jpeg"), frame)
    cap.release()


# -- frame-array transforms (parity: video_transforms.py core ops) -----------

def center_crop(arr: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """[H, W, C] center crop."""
    h, w = arr.shape[:2]
    th, tw = size
    i = max((h - th) // 2, 0)
    j = max((w - tw) // 2, 0)
    return arr[i : i + th, j : j + tw]


def resize_crop_to_fill(img, size: Tuple[int, int]) -> np.ndarray:
    """Resize preserving aspect so the target fits, then center-crop (the
    'fill' transform, parity: vision_utils.resize_crop_to_fill)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img.astype(np.uint8))
    th, tw = size
    w, h = img.size
    scale = max(th / h, tw / w)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    img = img.resize((nw, nh), Image.BICUBIC)
    return center_crop(np.asarray(img), size)


def temporal_random_crop(n_frames: int, num_frames: int, frame_interval: int,
                         rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Frame indices of a random temporal window (parity:
    vision_utils.temporal_random_crop; deterministic with a seeded rng)."""
    rng = rng or np.random.default_rng(0)
    span = (num_frames - 1) * frame_interval + 1
    if n_frames <= span:
        start = 0
    else:
        start = int(rng.integers(0, n_frames - span + 1))
    return np.minimum(np.arange(num_frames) * frame_interval + start, n_frames - 1)
