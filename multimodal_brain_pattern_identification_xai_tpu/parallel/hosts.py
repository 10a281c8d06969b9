"""Multi-host initialization — the ``dist.init_process_group`` equivalent
(training_distributed.py:24-27): ``jax.distributed.initialize`` wires the
hosts of a pod slice/DCN-connected fleet together; afterwards
``jax.devices()`` spans the fleet and the same mesh code scales up."""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime if applicable.

    With no arguments relies on the TPU environment's auto-detection;
    returns False (single-process mode) when no cluster is configured —
    the graceful-fallback analogue of the reference's GPU→CPU chain
    (cfg_utils.py:57-68).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logger.info("multihost: %d processes, %d global devices",
                    jax.process_count(), jax.device_count())
        return True
    except (RuntimeError, ValueError) as exc:
        # Expected when no cluster is configured (single-host dev boxes,
        # CI, CPU tests) or the runtime is already initialized.  Anything
        # else — e.g. a misconfigured coordinator address raising a
        # connection error — propagates so real cluster bugs aren't
        # silently reported as "single-process mode".
        logger.info("single-process mode (%s)", exc)
        return False


def is_primary() -> bool:
    """Rank-0 gating for checkpoint/plot side effects
    (training_distributed.py:107-139)."""
    return jax.process_index() == 0
