"""DebugTracker: the optimizer observer (reference localization/tracker.py:5-46).

Attach to a Refiner to record, per refinement call:
- debug >= 1: per-iteration masked costs, step magnitudes (dt, dR), accept
  flags (``log_optim_iter``), and the final pose/points (``log_optim_done``);
- debug >= 2: additionally the dense query feature/confidence maps
  (``log_dense``).

The reference fires Python callbacks from inside the torch optimizer loop;
here the LM runs as one jitted ``lax.scan`` (align_level_traced) that
RETURNS the whole per-iteration trace as arrays — same information, one
device program. Dumped to ``trackers.pkl`` via PixTrackTracker.save_poses.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class DebugTracker:
    def __init__(self, debug: int = 1):
        self.debug = int(debug)
        self.frames: List[dict] = []
        self._current: Optional[dict] = None

    # -- callbacks (Refiner calls these) --------------------------------------
    def start_frame(self, name: str) -> None:
        self._current = {"frame": name, "levels": [], "dense": []}
        self.frames.append(self._current)

    def log_dense(self, level: int, fmap, conf=None) -> None:
        if self.debug < 2 or self._current is None:
            return
        self._current["dense"].append(
            {
                "level": level,
                "fmap": np.asarray(fmap),
                "conf": None if conf is None else np.asarray(conf),
            }
        )

    def log_optim_iter(self, level: int, trace: dict) -> None:
        """trace: arrays of shape (num_iters,) from align_level_traced."""
        if self.debug < 1 or self._current is None:
            return
        active = np.asarray(trace["active"])
        n = int(active.sum())
        self._current["levels"].append(
            {
                "level": level,
                "num_iters": n,
                "costs": np.asarray(trace["cost"])[:n],
                "dt": np.asarray(trace["dt"])[:n],
                "dR": np.asarray(trace["dR"])[:n],
                "accepted": np.asarray(trace["accepted"])[:n],
            }
        )

    def log_optim_done(self, T_refined, p3d=None, cost=None) -> None:
        if self.debug < 1 or self._current is None:
            return
        self._current["T_refined"] = np.asarray(T_refined.to_4x4())
        if cost is not None:
            self._current["cost"] = float(cost)
        if self.debug >= 2 and p3d is not None:
            self._current["p3d"] = np.asarray(p3d)
