"""Ray Data context tuning shared by bench, tests and the driver entry.

``tune_data_context()`` is idempotent and safe to call after the
session owner's ``ray.init``  (it never initialises Ray itself).

Why each knob:

- ``op_resource_reservation_enabled = False``: the default
  ReservationOpResourceAllocator splits 50% of the CPU budget across
  ALL operators in the plan; with a 5-6 operator pipeline on a small
  session (8 cpus) that throttles the busy map operator to 1-2
  concurrent tasks (measured: 62s -> 15.8s on the 10M-page flagship at
  8 cpus).  On a big cluster the reservation is per-node-pool and far
  less binding, but the local-mode scaling protocol needs it off to
  measure actual operator cost.
- progress bars / verbose off: benchmark output hygiene (bench.py must
  print exactly one JSON line on stdout).
"""

from __future__ import annotations

import logging


def tune_data_context() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
