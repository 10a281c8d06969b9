"""Subprocess payload for the multihost test (tests/test_parallel.py).

Runs one data-parallel train step on a mesh of 4 global CPU devices, either
as one process that owns all 4 (role=single) or as one rank of a 2-process
jax.distributed cluster with 2 local devices each (role=multi).  Both roles
construct bitwise-identical global state and batch from fixed seeds, so the
test can assert the multihost trajectory equals the single-process one —
the ``dist.init_process_group`` parity check
(training_distributed.py:24-27).

Usage: python tests/_multihost_payload.py single
       python tests/_multihost_payload.py multi <coordinator> <nproc> <pid>

Caller must set XLA_FLAGS=--xla_force_host_platform_device_count=<local>.
Prints one JSON line: {"psum": ..., "loss": ..., "checksum": ...}.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    role = sys.argv[1]
    if role == "multi":
        coord, nproc, pid = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        from multimodal_brain_pattern_identification_xai_tpu.parallel import (
            initialize_multihost)
        assert initialize_multihost(coord, nproc, pid), \
            "initialize_multihost returned single-process mode"
        assert jax.process_count() == nproc
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    import multimodal_brain_pattern_identification_xai_tpu.config as C
    from multimodal_brain_pattern_identification_xai_tpu import (models,
                                                                 parallel,
                                                                 train)

    mesh = parallel.make_mesh(C.MeshConfig(data=-1))

    def make_global(x, spec):
        """Build a global array from identical per-process host data —
        multi-controller-safe (each process materializes only its
        addressable shards)."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    # 1) a raw cross-process psum: sum of the sharded [0,1,2,3] = 6
    xs = make_global(np.arange(4, dtype=np.float32), P("data"))
    psum_fn = jax.jit(shard_map(
        lambda xl: jax.lax.psum(xl.sum(), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False))
    psum_val = float(psum_fn(xs).addressable_shards[0].data)

    # 2) one DP train step, identical state/batch on every process
    rng = np.random.default_rng(0)
    model = models.EEGNet(samples=128, kern_length=8)
    x = (rng.standard_normal((8, 1, 37, 128))).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)]
    state = train.create_train_state(
        model, (jnp.asarray(x[:2]),), train.state.make_optimizer(1e-3),
        jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda l: make_global(l, P()) if isinstance(
            l, (jax.Array, np.ndarray)) else l, state)
    batch = {"x": make_global(x, P("data", None, None, None)),
             "y": make_global(y, P("data", None))}
    step = parallel.make_parallel_train_step(mesh, state, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))

    checksum = jax.jit(lambda p: sum(
        jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(p)))(
            new_state.params)
    print(json.dumps({
        "psum": psum_val,
        "loss": float(metrics["loss"].addressable_shards[0].data),
        "checksum": float(checksum.addressable_shards[0].data),
    }), flush=True)


if __name__ == "__main__":
    main()
