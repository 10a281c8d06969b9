"""Hyperparameter grid search (reference ``parallel_grid_search``,
training_utils.py:48-132: a ``torch.multiprocessing`` pool handing one GPU
per (gamma, decay_epochs) combination).

TPU-native redesign: no process pool — candidate configurations are
trained *inside one jit* by ``vmap``-ing the whole training loop over a
stacked axis of per-candidate (hyperparams, params) — the standard JAX
multi-seed/multi-config trick.  All candidates share each batch's forward
FLOPs-wise but run as one big fused program on-chip; on a pod, shard the
candidate axis over the mesh instead of GPUs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parallel_grid_search(model, sample_input: Tuple,
                         data_iter_factory: Callable[[], Any],
                         grid: Dict[str, Sequence[float]],
                         loss_fn: Callable,
                         epochs: int = 1,
                         seed: int = 42) -> Tuple[Dict[str, float], List[Dict]]:
    """Train one model per grid point, vmapped.

    Args:
        model: flax module (single-input signature ``(x, train)``).
        sample_input: example ``(x,)`` for init.
        data_iter_factory: zero-arg callable yielding an iterator of
            ``{"x", "y"}`` numpy batches per epoch.
        grid: e.g. ``{"lr": [...], "gamma": [...]}`` — full cartesian
            product, mirroring the (gamma × decay_epochs) grid of the
            reference.
        loss_fn: ``(logits, targets) -> scalar``.

    Returns:
        (best_config, all_results) ranked by final validation loss.
    """
    keys_names = list(grid.keys())
    mesh = np.meshgrid(*[np.asarray(grid[k], np.float32) for k in keys_names],
                       indexing="ij")
    combos = np.stack([m.reshape(-1) for m in mesh], axis=1)  # (G, P)
    G = combos.shape[0]
    lr_col = keys_names.index("lr") if "lr" in keys_names else None

    rng = jax.random.PRNGKey(seed)
    init_keys = jax.random.split(rng, G)
    params0 = jax.vmap(
        lambda k: model.init({"params": k}, *sample_input)["params"]
    )(init_keys)

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt0 = jax.vmap(lambda p: tx.init(p))(params0)

    @jax.jit
    def step_all(params, opt_state, hp, batch_x, batch_y):
        def one(params_i, opt_i, hp_i):
            def loss(p):
                logits = model.apply({"params": p}, batch_x, True,
                                     rngs={"dropout": jax.random.PRNGKey(0)})
                return loss_fn(logits, batch_y)
            l, g = jax.value_and_grad(loss)(params_i)
            if lr_col is not None:
                opt_i.hyperparams["learning_rate"] = hp_i[lr_col]
            upd, opt_i = tx.update(g, opt_i, params_i)
            return optax.apply_updates(params_i, upd), opt_i, l
        return jax.vmap(one)(params, opt_state, hp)

    params, opt_state = params0, opt0
    hp = jnp.asarray(combos)
    losses = None
    for _ in range(epochs):
        for batch in data_iter_factory():
            params, opt_state, losses = step_all(
                params, opt_state, hp,
                jnp.asarray(batch["x"]), jnp.asarray(batch["y"]))

    final = np.asarray(losses)
    results = []
    for gi in range(G):
        cfg = {k: float(combos[gi, i]) for i, k in enumerate(keys_names)}
        results.append({**cfg, "loss": float(final[gi])})
    results.sort(key=lambda r: r["loss"])
    return results[0], results
