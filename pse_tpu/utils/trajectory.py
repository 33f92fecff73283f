"""Minimal trajectory writer (npz frames).

The reference delegates trajectory IO to HOOMD's GSD machinery; this framework
needs only a small self-contained recorder: wrapped positions + images (so
trajectories can be unwrapped exactly), box tilt, and step numbers.
"""

from __future__ import annotations

import numpy as np


class TrajectoryWriter:
    """Collects frames via Simulation.run callbacks and writes one npz.

    Usage:
        writer = TrajectoryWriter("traj.npz", every=1)
        sim.run(n, callback=writer)   # called once per sync chunk
        writer.close()
    """

    def __init__(self, path: str, every: int = 1):
        self.path = path
        self.every = int(every)
        self._count = 0
        self.frames_pos = []
        self.frames_images = []
        self.frames_step = []
        self.frames_tilt = []

    def __call__(self, sim):
        self._count += 1
        if self._count % self.every:
            return
        s = sim.state
        self.frames_pos.append(np.asarray(s.pos))
        self.frames_images.append(np.asarray(s.images))
        self.frames_step.append(int(s.step))
        self.frames_tilt.append(float(s.tilt_xy))

    def close(self):
        np.savez_compressed(
            self.path,
            pos=np.stack(self.frames_pos) if self.frames_pos else np.zeros((0,)),
            images=np.stack(self.frames_images) if self.frames_images else np.zeros((0,)),
            step=np.asarray(self.frames_step, np.int64),
            tilt_xy=np.asarray(self.frames_tilt, np.float64),
        )
        return self.path


def load_trajectory(path: str) -> dict:
    with np.load(path) as d:
        return {k: d[k] for k in d.files}
