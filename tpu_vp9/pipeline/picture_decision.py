"""Picture decision: scene-change detection + refresh type selection.

Capability parity with the reference picture-decision kernel
(``EbPictureDecisionProcess.c:1423``: eb_vp9_SceneTransitionDetector
``:100``, keyframe placement) — re-expressed as cheap vectorized frame
statistics.  On scene changes the encoder inserts an intra frame: a full
keyframe when DPB history is useless, or an intra-only refresh frame
(non-keyframe header, kf-style mode coding) when the sequence header
state should be preserved.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SceneChangeDetector:
    """Mean-absolute-difference detector with adaptive threshold."""

    mad_threshold: float = 28.0  # per-pixel MAD that always triggers
    ratio_threshold: float = 3.5  # vs running average of recent MADs
    history: list = None

    def __post_init__(self):
        self.history = []
        self._prev = None

    def is_scene_change(self, y_plane: np.ndarray) -> bool:
        prev = self._prev
        self._prev = y_plane.astype(np.int16)
        if prev is None:
            return False
        mad = float(np.abs(self._prev - prev).mean())
        hist = self.history
        avg = (sum(hist) / len(hist)) if hist else mad
        hist.append(mad)
        if len(hist) > 16:
            hist.pop(0)
        if mad > self.mad_threshold:
            return True
        return bool(hist and mad > self.ratio_threshold * max(avg, 1.0)
                    and mad > 6.0)
