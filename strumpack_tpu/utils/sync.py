"""True device synchronization for timing.

On tunneled/remote TPU platforms ``jax.block_until_ready`` can return as
soon as the dispatch is acknowledged, long before the chip finishes
executing — timing loops built on it measure dispatch latency, not compute
(observed: a 10x-over-peak "throughput" illusion).  A host readback of one
element of a program output cannot complete before the program does, and
PJRT executes programs on a device in order, so fetching one element of the
*last* enqueued program's output fences everything queued before it.
"""
from __future__ import annotations

import numpy as np


def device_sync(tree) -> None:
    """Block until all device work producing ``tree`` has really finished."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and hasattr(l, "size")]
    for l in reversed(leaves):            # last non-empty output
        if l.size:
            np.asarray(jax.device_get(l.ravel()[:1]))
            return
    jax.block_until_ready(leaves)
