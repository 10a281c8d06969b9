"""Parallelism over the TPU mesh — the ICI/DCN replacement for the
reference's DDP/NCCL story (training_distributed.py:22-141, SURVEY.md
§5.8): data parallelism via sharded jit (gradient psum inside the compiled
program), tensor-parallel dense layers via named param shardings, and
sequence parallelism for long multi-hour EEG via shard_map collectives
(new scope — BASELINE.json config #4)."""

from .mesh import (make_mesh, batch_sharding, replicate,  # noqa: F401
                   param_shardings)
from .train import (make_parallel_train_step, shard_batch,  # noqa: F401
                    replay_dp_loss_single_device)
from .seqparallel import (halo_conv1d, sequence_parallel_attention,  # noqa: F401
                          LongEEGEncoder, long_eeg_forward, long_eeg_rollout)
from .hosts import initialize_multihost, is_primary  # noqa: F401
from . import dryrun, tp  # noqa: F401
