"""DiffEEG diffusion trainer (reference ``DiffEEGTrainer``,
DiffEEG_train.py:26-281).

Step loop semantics kept: ≥ ``min_steps`` optimizer steps, gradient
accumulation ×``gradient_accumulate_every``, MSE noise-prediction loss,
EMA updates (warmup + every-N), periodic step checkpoints and periodic
generative evaluation (reverse diffusion on a validation slice + MMD /
Fréchet / Pearson).

TPU-native differences (the survey's hot loops #3/#4):
* the STFT conditioner runs **on-device inside the same jit** as the
  denoiser step (no host round trip per micro-batch);
* one optimizer step = ONE jitted program: the K accumulation
  micro-batches arrive stacked as a leading axis and are consumed by
  ``lax.scan`` with running gradient average;
* evaluation's 1000-step reverse diffusion is a ``lax.scan`` (one compiled
  program), see :mod:`..diffusion.process`.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as C
from ..diffusion import (EMA, compute_frechet_distance, compute_mmd,
                         ema_update, make_schedule, pearson_correlation,
                         reverse_diffusion)
from ..models.diffeeg import (DiffEEG, make_cached_denoiser,
                              recombine_spectrograms)
from ..ops import stft_log1p_interp
from .checkpoint import CheckpointManager
from .state import TrainState
from .steps import optax_global_norm, skip_nonfinite

logger = logging.getLogger(__name__)


class DiffEEGTrainer:
    def __init__(self, model: DiffEEG, cfg: C.DiffEEGConfig,
                 ckpt_dir: Optional[str] = None, seed: int = 42,
                 mesh: Optional[Any] = None,
                 decorrelate_shards: bool = True) -> None:
        #: ``mesh`` — data-parallel training: each micro-batch's sample
        #: axis is sharded over the mesh's ``data`` axis inside a
        #: shard_map step (grad psum in-program, like the epoch Trainer);
        #: ``decorrelate_shards`` folds the shard index into the PRNG key
        #: so shards draw independent noise/timesteps/mixup (the DDP-rank
        #: behavior); disable it to reproduce a single-device trajectory
        #: exactly (each shard then draws the same stream).
        self.mesh = mesh
        self.decorrelate_shards = decorrelate_shards
        self.model = model
        self.cfg = cfg
        self.schedule = make_schedule(cfg.n_diffusion_steps)
        self.rng = jax.random.PRNGKey(seed)
        self.ckpt = CheckpointManager(ckpt_dir, "mmd", "min") if ckpt_dir else None

        # init
        self.rng, init_key = jax.random.split(self.rng)
        T = cfg.input_length
        x0 = jnp.zeros((1, cfg.n_channels, T))
        y0 = jnp.zeros((1, cfg.n_classes))
        t0 = jnp.zeros((1,))
        s0 = jnp.zeros((1, cfg.n_channels, cfg.stft_n_fft // 2 + 1, T))
        variables = model.init({"params": init_key}, x0, y0, t0, s0)
        tx = optax.adam(cfg.lr)
        self.state = TrainState.create(apply_fn=model.apply,
                                       params=variables["params"], tx=tx)
        self.ema = EMA.create(variables["params"], cfg.ema_decay,
                              cfg.step_start_ema, cfg.update_ema_every)
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------

    def _build_train_step(self) -> Callable:
        cfg = self.cfg
        schedule = self.schedule
        model = self.model

        def micro_loss(params, key, x0, y):
            """One accumulation micro-batch (DiffEEG_train.py:129-154):
            STFT conditioning → same-class mixup → q-sample → ε̂ → MSE."""
            k_mix, k_t, k_noise, k_drop = jax.random.split(key, 4)
            spec = stft_log1p_interp(x0, out_t=x0.shape[-1],
                                     nperseg=cfg.stft_n_fft,
                                     noverlap=cfg.stft_noverlap)
            labels = jnp.argmax(y, -1)
            spec = recombine_spectrograms(k_mix, spec, labels, cfg.n_classes)
            t = jax.random.randint(k_t, (x0.shape[0],), 0,
                                   cfg.n_diffusion_steps)
            noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
            a = schedule.alpha_bar[t].reshape(-1, 1, 1)
            x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise
            # optional remat of the denoiser: the reference wraps its
            # residual blocks in torch.utils.checkpoint (diffEEG.py:126-129)
            # for GPU memory; on TPU the recompute is pure overhead unless
            # HBM-constrained (cfg.remat)
            apply = lambda p, xt, yy, tt, sp: model.apply(
                {"params": p}, xt, yy, tt.astype(jnp.float32), sp,
                True, rngs={"dropout": k_drop})
            if cfg.remat:
                apply = jax.checkpoint(apply)
            eps_pred = apply(params, x_t, y, t, spec)
            return jnp.mean((eps_pred - noise) ** 2)

        def train_step(state: TrainState, ema: EMA, key: jax.Array,
                       xs: jnp.ndarray, ys: jnp.ndarray):
            """One optimizer step over K stacked micro-batches
            (K = gradient_accumulate_every)."""
            if self.mesh is not None and self.decorrelate_shards:
                key = jax.random.fold_in(key,
                                         jax.lax.axis_index("data"))
            f = cfg.fuse_accum
            if f > 1:
                # fold f micro-batches into each scanned fwd/bwd pass:
                # same averaged gradient, f× larger MXU batches
                if xs.shape[0] % f:
                    raise ValueError(
                        f"fuse_accum={f} must divide the number of "
                        f"accumulation micro-batches {xs.shape[0]}")
                xs = xs.reshape(xs.shape[0] // f, f * xs.shape[1],
                                *xs.shape[2:])
                ys = ys.reshape(ys.shape[0] // f, f * ys.shape[1],
                                *ys.shape[2:])
            K = xs.shape[0]
            keys = jax.random.split(key, K)

            def scan_body(carry, inp):
                gsum, lsum = carry
                k, x0, y = inp
                l, g = jax.value_and_grad(micro_loss)(state.params, k, x0, y)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                return (gsum, lsum + l), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (gsum, lsum), _ = jax.lax.scan(scan_body, (zero, 0.0),
                                           (keys, xs, ys))
            grads = jax.tree_util.tree_map(lambda g: g / K, gsum)
            loss = lsum / K
            if self.mesh is not None:
                # DDP-equivalent gradient all-reduce, riding ICI inside
                # the compiled step; the optimizer/EMA update then runs
                # replicated on identical averaged gradients
                grads = jax.lax.pmean(grads, "data")
                loss = jax.lax.pmean(loss, "data")
            # NaN sentinel (same contract as train.steps.make_train_step):
            # a non-finite loss/gradient skips the optimizer AND EMA update
            # so one bad accumulation window can't poison the run — the
            # in-jit analogue of the reference's NaN-abort guards
            # (DiffEEG_utils.py:152-176).  The step counter still advances:
            # the Python loop consumed K micro-batches either way, and the
            # resume fast-forward (`start = state.step * K`) plus the
            # checkpoint labels key off it (bitwise resume-exactness).
            finite = (jnp.isfinite(loss)
                      & jnp.isfinite(optax_global_norm(grads)))
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            new_state = state.apply_gradients(grads=grads)
            new_state = skip_nonfinite(new_state, state, finite).replace(
                step=state.step + 1)
            new_ema = ema_update(ema, new_state.params, new_state.step)
            new_ema = skip_nonfinite(new_ema, ema, finite)
            return new_state, new_ema, loss

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            # micro-batches arrive stacked (K, B, ...): shard B (axis 1)
            # over `data`; state/EMA/key replicate
            return jax.jit(shard_map(
                train_step, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(None, "data"), P(None, "data")),
                out_specs=(P(), P(), P()),
                check_vma=False))
        return jax.jit(train_step)

    # ------------------------------------------------------------------

    def load(self, step: Optional[int] = None) -> Optional[int]:
        """Resume from the latest (or given) step checkpoint — optimizer
        state, EMA params, step counter and PRNG key (reference
        ``DiffEEGTrainer.load``, DiffEEG_train.py:87-103).  Returns the
        restored step, or None when no checkpoint exists."""
        if self.ckpt is None:
            return None
        step = step if step is not None else self.ckpt.latest_step()
        if step is None:
            return None
        tpl = {"state": self.state, "ema": self.ema.params, "rng": self.rng}
        try:
            restored = self.ckpt.restore(f"step_{step}", tpl)
        except Exception:                                  # noqa: BLE001
            # checkpoints written before the PRNG key joined the payload
            # hold only {state, ema}; resume them with the current key
            # stream rather than hard-failing on the structure mismatch
            restored = self.ckpt.restore(
                f"step_{step}", {"state": self.state,
                                 "ema": self.ema.params})
            logger.warning("checkpoint step_%d predates rng-in-checkpoint; "
                           "resuming with a fresh noise stream", step)
        self.state = restored["state"]
        self.ema = self.ema._replace(params=restored["ema"])
        self.rng = restored.get("rng", self.rng)
        logger.info("resumed DiffEEG trainer at step %d", step)
        return step

    def train(self, batch_iter_factory: Callable[[], Iterator],
              val_batches: Optional[list] = None,
              total_steps: Optional[int] = None) -> Dict[str, list]:
        """Run the step loop (DiffEEG_train.py:105-186).

        ``batch_iter_factory`` yields ``(x0, y)`` numpy micro-batches;
        the iterator is restarted on exhaustion like the reference's
        StopIteration handler (:122-126).  A factory that accepts an
        argument is called with the number of micro-batches already
        consumed (``resumed_step × K``) so a resumed run can fast-forward
        its data stream to where the interrupted one stopped instead of
        replaying the stream from micro-batch zero.
        """
        cfg = self.cfg
        total = total_steps or cfg.min_steps
        K = cfg.gradient_accumulate_every
        try:
            import inspect
            takes_start = bool(
                inspect.signature(batch_iter_factory).parameters)
        except (TypeError, ValueError):
            takes_start = False
        it = (batch_iter_factory(int(self.state.step) * K) if takes_start
              else batch_iter_factory())
        history: Dict[str, list] = {"loss": [], "eval": []}

        def next_micro():
            nonlocal it
            try:
                return next(it)
            except StopIteration:
                it = (batch_iter_factory(0) if takes_start
                      else batch_iter_factory())
                return next(it)

        for step in range(int(self.state.step), total):
            micros = [next_micro() for _ in range(K)]
            xs = jnp.stack([jnp.asarray(m[0]) for m in micros])
            ys = jnp.stack([jnp.asarray(m[1]) for m in micros])
            self.rng, key = jax.random.split(self.rng)
            self.state, self.ema, loss = self._train_step(
                self.state, self.ema, key, xs, ys)
            history["loss"].append(float(loss))
            if self.ckpt and (step + 1) % cfg.save_and_sample_every == 0:
                # {step, model, ema} checkpoint + the PRNG key so a resumed
                # run continues the exact noise trajectory
                # (DiffEEG_train.py:172-176)
                self.ckpt.save_step(step + 1,
                                    {"state": self.state,
                                     "ema": self.ema.params,
                                     "rng": self.rng})
            if val_batches and (step + 1) % cfg.evaluate_every == 0:
                history["eval"].append(self.evaluate(val_batches))
        return history

    def evaluate(self, val_batches: list, frac: float = 0.2) -> Dict[str, float]:
        """Generative eval on a validation slice (DiffEEG_train.py:191-238):
        full reverse diffusion conditioned on the real labels/spectrograms,
        then MMD / Fréchet / Pearson against the real EEG."""
        cfg = self.cfg
        n = max(1, int(len(val_batches) * frac))
        mmds, freches, pears = [], [], []
        params = self.ema.params
        for x0, y in val_batches[:n]:
            x0 = jnp.asarray(x0)
            y = jnp.asarray(y)
            spec = stft_log1p_interp(x0, out_t=x0.shape[-1],
                                     nperseg=cfg.stft_n_fft,
                                     noverlap=cfg.stft_noverlap)
            self.rng, key = jax.random.split(self.rng)
            # conditioning precomputed once, not once per diffusion step
            denoise = make_cached_denoiser(self.model, {"params": params},
                                           y, spec, x0.shape[-1])
            gen = reverse_diffusion(self.schedule, denoise, key,
                                    x0.shape[0], y, spec,
                                    (cfg.n_channels, x0.shape[-1]))
            mmds.append(float(compute_mmd(x0, gen)))
            freches.append(float(compute_frechet_distance(x0, gen)))
            pears.append(float(pearson_correlation(x0, gen)))
        result = {"mmd": float(np.mean(mmds)),
                  "frechet": float(np.mean(freches)),
                  "pearson": float(np.mean(pears))}
        logger.info("DiffEEG eval: %s", result)
        return result
