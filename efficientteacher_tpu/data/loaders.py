"""Inference-time input loaders.

Parity with reference utils/datasets.py:400-637: `LoadImages` (files, dirs,
glob, txt lists, video files via cv2.VideoCapture) and `LoadStreams`
(webcam/RTSP, threaded latest-frame grab). Each yields
(path, letterboxed_rgb_u8, original_bgr, ratio_pad) ready for the jitted
forward.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np

from .augment import letterbox
from .datasets import IMG_FORMATS, parse_data_path

VID_FORMATS = {"mov", "avi", "mp4", "mpg", "mpeg", "m4v", "wmv", "mkv"}


class LoadImages:
    """Image/video file iterator (reference datasets.py:400-494)."""

    def __init__(self, path: str, img_size: int = 640, stride: int = 32,
                 auto: bool = False):
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        p = Path(path)
        if p.is_file() and p.suffix[1:].lower() in VID_FORMATS:
            self.files: List[str] = [str(p)]
        else:
            self.files = [f for f, _ in parse_data_path(path)]
        self.videos = [f for f in self.files
                       if f.rsplit(".", 1)[-1].lower() in VID_FORMATS]
        self.images = [f for f in self.files if f not in set(self.videos)]

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, np.ndarray, tuple]]:
        for f in self.images:
            img0 = cv2.imread(f)
            if img0 is None:
                continue
            yield (f, *self._prep(img0))
        for f in self.videos:
            cap = cv2.VideoCapture(f)
            idx = 0
            while cap.isOpened():
                ok, img0 = cap.read()
                if not ok:
                    break
                yield (f"{f}#{idx}", *self._prep(img0))
                idx += 1
            cap.release()

    def _prep(self, img0):
        img, ratio, pad = letterbox(img0, self.img_size, auto=self.auto,
                                    stride=self.stride)
        rgb = np.ascontiguousarray(img[:, :, ::-1])
        return rgb, img0, (ratio, pad)

    def __len__(self):
        return len(self.images) + len(self.videos)


class LoadStreams:
    """Threaded multi-stream reader (reference datasets.py:537-637):
    each source gets a grabber thread keeping only the latest frame."""

    def __init__(self, sources="0", img_size: int = 640, stride: int = 32):
        self.img_size = img_size
        self.stride = stride
        if Path(sources).is_file():
            src = Path(sources).read_text().strip().splitlines()
        else:
            src = [sources]
        self.sources = src
        self.caps = []
        self.frames: List[Optional[np.ndarray]] = [None] * len(src)
        self.running = True
        for i, s in enumerate(src):
            cap = cv2.VideoCapture(int(s) if s.isdigit() else s)
            if not cap.isOpened():
                raise ConnectionError(f"cannot open stream {s!r}")
            ok, frame = cap.read()
            self.frames[i] = frame if ok else None
            self.caps.append(cap)
            t = threading.Thread(target=self._grab, args=(i, cap),
                                 daemon=True)
            t.start()

    def _grab(self, i, cap):
        while self.running and cap.isOpened():
            cap.grab()
            ok, frame = cap.retrieve()
            if ok:
                self.frames[i] = frame
            time.sleep(0.01)

    def __iter__(self):
        while self.running:
            imgs0 = [f.copy() for f in self.frames if f is not None]
            if len(imgs0) != len(self.sources):
                time.sleep(0.05)
                continue
            batch = []
            for img0 in imgs0:
                img, _, _ = letterbox(img0, self.img_size, auto=False,
                                      stride=self.stride)
                batch.append(np.ascontiguousarray(img[:, :, ::-1]))
            yield self.sources, np.stack(batch), imgs0
            if cv2.waitKey(1) == ord("q"):
                self.close()

    def close(self):
        self.running = False
        for cap in self.caps:
            cap.release()
