"""Device mesh construction for multi-chip runs.

The discovery/genotyping workload shards two ways (SURVEY.md section 7):
- ``interval``: chromosome-interval shards (host-level data distribution,
  DCN); candidate records and tallies are combined with collectives.
- ``batch``: read-batch data parallelism within an interval (ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, interval_axis: int | None = None,
              devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if interval_axis is None:
        # Prefer a 2D factorization so both axes are exercised.
        interval_axis = 1
        for f in (2, 4, 8):
            if n_devices % f == 0:
                interval_axis = f
    batch_axis = n_devices // interval_axis
    arr = np.array(devices).reshape(interval_axis, batch_axis)
    return Mesh(arr, axis_names=("interval", "batch"))
