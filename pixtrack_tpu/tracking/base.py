"""Tracker template: the per-frame refine/relocalize loop.

Same skeleton as the reference's ``PoseTracker``
(pixtrack/pose_trackers/base_pose_tracker.py:21-37): refine each frame, on
failure relocalize and retry once, then update reference selection.
"""

from __future__ import annotations

from typing import Iterable, Optional

from tqdm import tqdm


class PoseTracker:
    def refine(self, query) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def relocalize(self, query) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def update_reference_ids(self):  # pragma: no cover - interface
        raise NotImplementedError

    def run_single_frame(self, query) -> bool:
        success = self.refine(query)
        if not success:
            self.relocalize(query)
            success = self.refine(query)
        self.update_reference_ids()
        return success

    def run(self, frames: Iterable, max_frames: Optional[int] = None) -> None:
        self.pbar = tqdm(frames, total=max_frames)
        for i, query in enumerate(self.pbar):
            if max_frames is not None and i >= max_frames:
                break
            self.run_single_frame(query)
