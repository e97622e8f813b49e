"""Multi-host (DCN) deployment helpers.

Clips are embarrassingly parallel, so the multi-host story mirrors the
reference's job striding (--data_step/--data_offset) with jax.distributed
supplying initialization and metric aggregation:

  * every host runs the same program;
  * each host takes its own slice of the sample index space;
  * the only cross-host traffic is the final metric reduction.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize wrapper; no-op in single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_sample_indices(total: int, data_step: int = 1,
                        data_offset: int = 0) -> Sequence[int]:
    """This host's sample slice: the reference's striding pattern
    (fit_vid_dataset.py:190) composed with the process grid."""
    p = jax.process_index()
    n = jax.process_count()
    return list(range(data_offset, total, data_step))[p::n]


def allgather_metrics(local_metrics: Dict[str, Sequence[float]]
                      ) -> Dict[str, np.ndarray]:
    """Gather per-sample metric lists from all hosts (the results.pkl
    aggregation, but over DCN). Uses the global-array API so it works on any
    process mesh; single-process runs return the input unchanged."""
    if jax.process_count() == 1:
        return {k: np.asarray(v) for k, v in local_metrics.items()}
    from jax.experimental import multihost_utils
    out = {}
    for k, v in local_metrics.items():
        arr = np.asarray(v, np.float32)
        gathered = multihost_utils.process_allgather(arr)
        out[k] = np.asarray(gathered).reshape(-1)
    return out
