"""Command-line entry points — the counterpart of the reference's
hard-coded ``main.py`` / ``main_2.py`` / ``main3.py`` scripts
(SURVEY.md §2 L7), with actual flags instead of edit-the-source booleans.

Subcommands::

    python -m multimodal_brain_pattern_identification_xai_tpu <cmd> [...]

    cache-build       sweep eeg parquets into the npz window cache
    train-wavenet     GroupKFold CV of DilatedInceptionWaveNet (main_2.py);
                      --augment-dir merges generated EEG pools first
    train-multimodal  multimodal EEG+spectrogram training (notebook §3.4);
                      --init-from grafts pretrained branch checkpoints
    train-eeg         EEG-branch pretraining (training.py:12-109)
    train-spectrogram spectrogram-branch pretraining (training.py:135-228)
    train-diffeeg     DiffEEG diffusion training (DiffEEG_train.py)
    generate          class-conditional EEG generation from the trained
                      EMA checkpoint
    predict           batch inference with the trained multimodal
                      checkpoint → predictions.csv (the serving path)
    xai               saliency/IG/SHAP/Grad-CAM/LIME report on a checkpoint
    grid-search       vmapped hyperparameter grid search (one jit, all
                      grid points at once)
    bench             the windows/sec/chip benchmark

``--mesh N`` on the training commands runs the DDP-equivalent
data-parallel loop over an N-device mesh; on ``predict`` it shards
serving; on ``xai`` it pod-shards the IG/SHAP sweeps.

Every command accepts ``--demo`` to run on synthetic data (no HMS download
needed) — the equivalent of the reference's DummyEEGDataset sanity path.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import os
import sys
from typing import List, Optional

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override key.path=value (repeatable)")
    p.add_argument("--demo", action="store_true",
                   help="run on synthetic data")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of records/rows (real-data smoke)")
    p.add_argument("--workers", type=int, default=8,
                   help="host loader threads for cache builds")
    p.add_argument("--one-fold", action="store_true",
                   help="train only fold 0 of the CV split")
    p.add_argument("--resume", action="store_true",
                   help="resume training from the latest checkpoint under "
                        "--ckpt-dir (epoch/step counter, optimizer, EMA, "
                        "history)")
    p.add_argument("--n-samples", type=int, default=None,
                   help="samples per class for `generate` "
                        "(default 50; 2 with --demo)")
    p.add_argument("--augment-dir", default=None,
                   help="directory of generated_class_{c}.npy files; "
                        "balanced-merge them into the training set before "
                        "training (augment_dataset_balanced)")
    p.add_argument("--init-from", default=None,
                   help="ckpt root holding train-eeg / train-spectrogram "
                        "branch checkpoints to initialize the multimodal "
                        "model from")
    p.add_argument("--channel-retrain", type=int, default=0,
                   help="xai: retrain a binary classifier on the top-N "
                        "SHAP channels (0 = off)")
    p.add_argument("--channel-class", type=int, default=0,
                   help="xai: positive class for --channel-retrain")
    p.add_argument("--lime-every", type=int, default=0,
                   help="per-epoch LIME snapshot interval (0 = off; "
                        "--demo defaults to 1)")
    p.add_argument("--grid", action="append", default=[],
                   help="grid-search axis name=v1,v2,... (repeatable; "
                        "e.g. --grid lr=1e-3,3e-3,1e-2)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard batches over an N-device data-parallel "
                        "mesh (0/1 = single device).  On the training "
                        "commands this is the DDP-equivalent loop "
                        "(gradient psum inside the compiled step); on "
                        "`predict` it shards inference")
    p.add_argument("--torch-ckpt", default=None,
                   help="predict/xai: load a reference-trained torch "
                        "combined-MultimodalModel state dict (.pt) instead "
                        "of a train-multimodal checkpoint — exact-logit "
                        "import of both branches + fusion head")
    p.add_argument("--eval", action="store_true",
                   help="predict: score the predictions against the rows' "
                        "vote-aggregated labels (KL-div, hard/soft "
                        "accuracy, macro PRF, confusion-matrix plot) — "
                        "the reference's notebook eval cells")
    p.add_argument("--arch", default=None,
                   help="train-eeg/train-spectrogram: zoo model to "
                        "pretrain (registry name, e.g. eegnet_residual, "
                        "deepconvnet, spectrogram_vit, efficientnetv2_b2;"
                        " default eegnet_attention_regularized / "
                        "spectrogram_cnn — the reference's main3.py-style"
                        " per-arch experiment runs)")
    p.add_argument("--fused-spec", type=int, default=0,
                   help="predict/xai: run the first N spectrogram CNN "
                        "blocks through the fused phase-packed Pallas "
                        "kernel (params identical to the unfused model; "
                        "input-gradient XAI differentiates through it "
                        "via the kernel's custom VJP)")


def _load_cfg(args):
    from . import config as C
    cfg = C.load_config(args.config, args.overrides)
    return cfg


def _train_mesh(args, bs=None):
    """``--mesh N`` on a training/serving command → a ``data=N`` device
    mesh plus the prefetcher sharding that lands raw batches already
    sharded over it (the fused preprocess then runs data-parallel too) —
    the reference's DDP entry point
    (train_and_validate_eeg_distributed, training_distributed.py:22-141)
    as a flag.  Returns ``(mesh | None, prefetch-kwargs, bs)`` with ``bs``
    rounded up to divide the data axis."""
    if not args.mesh or args.mesh <= 1:
        return None, {}, bs
    import jax
    from . import config as C, parallel
    n_dev = len(jax.devices())
    if args.mesh > n_dev:
        raise SystemExit(
            f"error: --mesh {args.mesh} > {n_dev} visible devices")
    mesh = parallel.make_mesh(C.MeshConfig(data=args.mesh),
                              devices=jax.devices()[:args.mesh])
    if bs is not None:
        bs = -(-bs // args.mesh) * args.mesh
    # P('data') extends with replicated dims to any rank, so one sharding
    # covers the eeg/spec/y batch arrays
    return mesh, {"sharding": parallel.batch_sharding(mesh, ndim=1)}, bs


def _device_transform_chunks(raw: np.ndarray, fn, chunk: int = 256
                             ) -> np.ndarray:
    """Run a jitted per-batch transform over a large host array in fixed
    chunks (bounded HBM; at most two compiled shapes)."""
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)
    outs = []
    for s in range(0, len(raw), chunk):
        outs.append(np.asarray(jfn(jnp.asarray(raw[s:s + chunk]))))
    return np.concatenate(outs) if len(outs) > 1 else outs[0]


def cmd_train_wavenet(args) -> int:
    """CV training of the WaveNet on transformed raw EEG (main_2.py:259-413):
    train.csv → per-eeg_id vote aggregation → window cache → device-side
    transform → GroupKFold CV with OOF predictions."""
    import jax
    from . import config as C, data, models, ops, train

    cfg = _load_cfg(args)
    rng = np.random.default_rng(args.seed)
    if args.demo:
        n = 48
        raw = rng.standard_normal((n, 2000, 19)).astype(np.float32) * 100
        groups = rng.integers(0, 12, n)
        y = train.cv.aggregate_vote_labels(rng.integers(0, 10, (n, 6)))
    else:
        src = data.wavenet_arrays(cfg.paths, cache_dir=args.ckpt_dir,
                                  n_workers=args.workers, limit=args.limit)
        raw = src.pop("x")                   # (N, 10000, 20) µV windows
        groups, y = src["groups"], src["y"]
        print(f"loaded {len(raw)} eeg windows "
              f"({raw.nbytes / 1e9:.2f} GB raw)")

    tcfg = C.EEGTransformConfig(apply_chris_magic_ch8=True, n_feats=8)
    x = _device_transform_chunks(raw, lambda a: ops.eeg_transform(a, tcfg))
    del raw                                  # ~13.6 GB at full-dataset scale

    if args.augment_dir:
        # Augmented retraining (reference main_2.py:295-343): load the
        # generated_class_{c}.npy pools and balanced-merge them into the
        # real training set.  Generated windows live in the 19-channel
        # transformed space (what train-diffeeg trained on); the bipolar
        # magic-8 differencing commutes with the linear lowpass/downsample
        # stages, so differencing here maps them into the WaveNet's input
        # space wherever the real chain's ±1024 µV clip was inactive; the
        # post-difference clip at ±32 below enforces the same feature
        # bound the real chain guarantees (clip(a−b, ±1024)/32).
        import jax.numpy as jnp
        from . import diffusion
        gen = {}
        for c in range(6):
            p_ = os.path.join(args.augment_dir, f"generated_class_{c}.npy")
            if not os.path.exists(p_):
                print(f"warning: {p_} missing")         # main_2.py:308
                continue
            arr = np.load(p_)                           # (M, 19, 2000)
            if arr.ndim != 3 or arr.shape[1] != len(C.EEG_FEATURES) \
                    or arr.shape[2] != x.shape[1]:
                print(f"warning: {p_} shape {arr.shape} does not match the "
                      f"19-channel/{x.shape[1]}-pt transformed space; "
                      "skipping")
                continue
            g8 = np.asarray(ops.chris_magic_ch8(
                jnp.asarray(arr.transpose(0, 2, 1)),
                columns=C.EEG_FEATURES))                # (M, 2000, 8)
            gen[c] = np.clip(g8, -32.0, 32.0).astype(np.float32)
        n_real = len(x)
        x, y, groups = diffusion.augment_dataset_balanced(
            x, y, gen, seed=args.seed, groups=groups)
        print(f"augmented dataset: {n_real} real + {len(x) - n_real} "
              f"synthetic samples")

    splits = train.group_kfold(groups, n_splits=cfg.n_folds)

    bs = args.batch_size or 16
    epochs = args.epochs or 3
    mesh, _, bs = _train_mesh(args, bs)

    def make_loaders(tr, va):
        # epoch-keyed shuffle seed (not a call counter): --resume replays
        # the permutation the uninterrupted run would use at that epoch
        def tl(epoch=0):
            return data.batch_iterator({"x": x[tr], "y": y[tr]}, bs,
                                       shuffle=True,
                                       seed=args.seed + epoch)
        def vl():
            return data.batch_iterator({"x": x[va], "y": y[va]}, bs,
                                       drop_last=False)
        return tl, vl

    def make_trainer(fold):
        model = models.DilatedInceptionWaveNet()
        tx = train.state.make_optimizer(cfg.trainer.lr)
        state = train.create_train_state(
            model, (x[:2],), tx, jax.random.PRNGKey(args.seed))
        tc = train.TrainerConfig(epochs=epochs, seed=args.seed,
                                 resume=args.resume,
                                 hyperparams={"optimizer": "adam"},
                                 lr_schedule=train.cosine_schedule_with_warmup(
                                     10, epochs * max(1, len(x) // bs),
                                     cfg.trainer.lr))
        return train.Trainer(state, tc, mesh=mesh,
                             ckpt_dir=f"{args.ckpt_dir}/wavenet_fold{fold}")

    oof, scores = train.run_cv(make_trainer, make_loaders, splits, len(x),
                               one_fold_only=args.one_fold)
    np.save(f"{args.ckpt_dir}/oof.npy", oof)
    print("fold scores:", [round(s, 4) for s in scores])
    return 0


def _multimodal_data(args, cfg):
    """Demo-or-real data plumbing shared by ``train-multimodal`` and the
    branch-pretraining commands: returns ``(sig, raw_batches, tr_idx,
    va_idx, eeg_kwargs, pf_kwargs)`` where ``raw_batches(idx, bs,
    shuffle, epoch=0, want=("eeg","spec"))`` yields raw host batches of
    the requested modalities plus ``y`` (fold 0 of the notebook's
    StratifiedKFold, XAI_Multimodality.py:539-571), with the shuffle
    permutation keyed on the epoch number (resume-stable), and
    ``pf_kwargs`` must be splatted into every ``prefetch_to_device``
    consuming them (the real path reuses gather buffers, which requires
    synced transfers)."""
    from . import config as C, data, train

    rng = np.random.default_rng(args.seed)
    if args.demo:
        n = 24
        sig = C.SignalConfig(fixed_length=600, image_size=(80, 60))
        raw_eeg = data.synthetic_raw_eeg(n, rng, n_points=2000)
        raw_spec = data.synthetic_raw_spectrogram(n, rng, shape=(80, 60))
        y = np.eye(6, dtype=np.float32)[np.arange(n) % 6]
        tr_idx = va_idx = np.arange(n)
        eeg_kwargs = dict(samples=600, kern_length=16)

        pf_kwargs = {}

        def raw_batches(idx, bs, shuffle, epoch=0, want=("eeg", "spec")):
            arrays = {k: v[idx] for k, v in
                      (("eeg", raw_eeg), ("spec", raw_spec))
                      if k in want}
            arrays["y"] = y[idx]
            return data.batch_iterator(
                arrays, bs, shuffle=shuffle,
                seed=args.seed + (epoch if shuffle else 0))
    else:
        src = data.multimodal_source(cfg.paths, cache_dir=args.ckpt_dir,
                                     n_workers=args.workers,
                                     limit=args.limit)
        # honor --set signal.* overrides (e.g. the r5 reduced-resolution
        # serving preset: image_size=[200,150] resize_mode=resample)
        sig = cfg.signal
        labels = np.asarray([C.NAME2LABEL[c]
                             for c in src.meta["expert_consensus"]])
        splits = train.stratified_kfold(labels, n_splits=cfg.n_folds,
                                        seed=args.seed)
        tr_idx, va_idx = splits[0]          # notebook trains fold 0
        eeg_kwargs = {}
        print(f"fold 0: {len(tr_idx)} train / {len(va_idx)} val rows")

        # ring-buffer gather + synced H2D transfers: the producer thread
        # reuses two preallocated host batch buffers (no ~330 MB of fresh
        # page faults per batch) and prefetch blocks until each copy lands
        # before the slot can be overwritten.  On the CPU backend
        # device_put is zero-copy, so the prefetcher would have to copy
        # each ringed batch up front — a net loss; skip the ring there.
        import jax as _jax
        reuse = _jax.default_backend() != "cpu"
        pf_kwargs = {"sync_transfers": reuse}

        def raw_batches(idx, bs, shuffle, epoch=0, want=("eeg", "spec")):
            return src.batches(idx, bs, shuffle=shuffle,
                               seed=args.seed + (epoch if shuffle else 0),
                               drop_last=shuffle, reuse_buffers=reuse,
                               want=want)
    return sig, raw_batches, tr_idx, va_idx, eeg_kwargs, pf_kwargs


def cmd_train_multimodal(args) -> int:
    """Multimodal EEG+spectrogram training (XAI_Multimodality.py §3.4):
    StratifiedKFold on expert consensus → raw host batches → one fused
    on-device preprocess per batch → MixUp/CoarseDropout augmentation →
    late-fusion training with optional per-epoch LIME snapshots.

    ``--init-from DIR`` grafts pretrained branch checkpoints
    (``train-eeg`` / ``train-spectrogram`` output under DIR) into the
    fusion model before training — the notebook's standalone-then-combined
    workflow (XAI_Multimodality.py:1319-1536 → 1579-1681)."""
    import jax
    import jax.numpy as jnp
    from . import config as C, data, models, ops, train, xai

    cfg = _load_cfg(args)
    (sig, raw_batches, tr_idx, va_idx, eeg_kwargs,
     pf_kwargs) = _multimodal_data(args, cfg)
    eeg_model = models.EEGNetAttentionRegularized(**eeg_kwargs)
    bs = args.batch_size or (8 if args.demo else cfg.trainer.batch_size)
    mesh, tr_sh, bs = _train_mesh(args, bs)
    # real-data windows are NaN-repaired at cache-build time -> the EEG
    # branch takes the montage-first fast path (mathematically identical
    # on finite inputs, tested); demo data keeps deliberate NaNs
    pp = jax.jit(lambda e, s: ops.preprocess_multimodal(
        e, s, signal=sig, assume_finite=not args.demo))
    aug = jax.jit(ops.spectrogram_augment)
    aug_key = jax.random.PRNGKey(args.seed + 1)

    mirror = jax.jit(ops.mirror_eeg)

    def train_iter(epoch=0):
        # background-thread prefetch: host-side gather (parquet decode /
        # crop — pyarrow releases the GIL) of batch N+1 overlaps the
        # device preprocess + train step of batch N
        ep_key = jax.random.fold_in(aug_key, epoch)
        for i, batch in enumerate(
                data.prefetch_to_device(raw_batches(tr_idx, bs, True, epoch),
                                        **{**pf_kwargs, **tr_sh})):
            eeg_raw = batch["eeg"]
            if cfg.augment:
                # CFG.AUGMENT parity: left/right hemisphere mirror applied
                # to train samples before filtering (XAI_Mm.py:805-806)
                eeg_raw = mirror(eeg_raw)
            e, s = pp(eeg_raw, batch["spec"])
            yb = batch["y"]
            # in-batch reference pool for MixUp (the reference sweeps the
            # train loader once to build it; same distribution); keyed on
            # (epoch, batch index) so --resume replays the same draws
            key = jax.random.fold_in(ep_key, i)
            s, yb = aug(key, s, yb, s, yb)
            yield {"eeg": e, "spec": s, "y": yb}

    def val_iter():
        for batch in data.prefetch_to_device(raw_batches(va_idx, bs, False),
                                             **pf_kwargs):
            e, s = pp(batch["eeg"], batch["spec"])
            yield {"eeg": e, "spec": s, "y": batch["y"]}

    mm = models.MultimodalModel(eeg_model=eeg_model,
                                spectrogram_model=models.SpectrogramCNN())
    # init probe built directly (not via next(val_iter()): abandoning a
    # prefetching generator would keep staged device batches alive)
    fb = next(raw_batches(va_idx, bs, False))
    fe, fs_ = pp(jnp.asarray(fb["eeg"]), jnp.asarray(fb["spec"]))
    first = {"eeg": fe, "spec": fs_, "y": fb["y"]}
    tx = train.state.make_optimizer(cfg.trainer.lr)
    state = train.create_train_state(
        mm, (first["eeg"][:2], first["spec"][:2]), tx,
        jax.random.PRNGKey(args.seed))
    if args.init_from:
        state = _init_from_branches(state, mm, first, args.init_from,
                                    cfg.trainer.lr)

    callbacks = []
    lime_every = args.lime_every or (1 if args.demo else 0)
    if lime_every:
        callbacks.append(xai.callbacks.LimeEpochSnapshot(
            mm, np.asarray(first["spec"][0]), f"{args.ckpt_dir}/lime",
            every=lime_every, n_segments=40, num_samples=150,
            seed=args.seed))

    tc = train.TrainerConfig(epochs=args.epochs or 3, seed=args.seed,
                             resume=args.resume,
                             hyperparams={"optimizer": "adam"})
    if mesh is not None:
        print(f"training over a {args.mesh}-device data mesh, batch {bs}")
    trainer = train.Trainer(state, tc, mesh=mesh,
                            ckpt_dir=f"{args.ckpt_dir}/multimodal",
                            epoch_callbacks=callbacks)
    _, best, _ = trainer.train_eval(train_iter, val_iter)
    from . import utils
    p = utils.plot_training_curves(trainer.history, args.ckpt_dir,
                                   "multimodal_training_curves")
    print(f"best kldiv: {best:.4f}; curves: {p}")
    if lime_every:
        print(f"lime snapshots: {len(callbacks[0].results)}")
    return 0


def _load_torch_multimodal(path: str, variables: dict) -> dict:
    """Load a reference-trained torch combined-MultimodalModel state dict
    (.pt) and map it onto the flax variables (exact-logit import — see
    models.load_torch_multimodal_state_dict).  Accepts a bare state dict
    or the common ``{"model": sd}`` / ``{"state_dict": sd}`` wrappers."""
    import torch
    from . import models
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "fc1.weight" not in sd:
        for key in ("model", "state_dict", "model_state_dict"):
            if key in sd:
                sd = sd[key]
                break
    v = models.load_torch_multimodal_state_dict(sd, variables)
    print(f"imported torch multimodal checkpoint: {path}")
    return {"params": v["params"], "batch_stats": v["batch_stats"]}


def _init_from_branches(state, mm, first, init_dir: str, lr: float):
    """Graft pretrained branch params/BN-stats into the multimodal state —
    the checkpoint handoff from the notebook's standalone EEG/spectrogram
    runs into combined training (XAI_Multimodality.py:1319-1536 feed
    :1579-1681)."""
    import jax
    from . import train

    new_params = dict(state.params)
    new_bn = (dict(state.batch_stats) if state.batch_stats is not None
              else None)
    for which, sub, sample in (
            ("eeg", "eeg_model", first["eeg"][:2]),
            ("spectrogram", "spectrogram_model", first["spec"][:2])):
        ckpt_dir = os.path.join(init_dir, which)
        if not os.path.isdir(ckpt_dir):
            print(f"warning: no {which} branch checkpoint under {init_dir}")
            continue
        # branch runs record their --arch; param trees cannot graft
        # across architectures, so fail fast with the fix instead of a
        # tree-mismatch error deep inside the checkpoint restore
        marker = os.path.join(ckpt_dir, "ARCH")
        expected = ("eegnet_attention_regularized" if which == "eeg"
                    else "spectrogram_cnn")
        if os.path.exists(marker):
            with open(marker) as f:
                arch = f.read().strip()
            if arch != expected:
                raise SystemExit(
                    f"--init-from: the {which} branch under {ckpt_dir} was "
                    f"pretrained with --arch {arch}, but the multimodal "
                    f"model's {which} branch is {expected}; repretrain "
                    f"without --arch for the handoff")
        bmodel = mm.eeg_model if which == "eeg" else mm.spectrogram_model
        bstate = train.create_train_state(
            bmodel, (sample,), train.state.make_optimizer(lr),
            jax.random.PRNGKey(0))
        bstate = train.CheckpointManager(ckpt_dir).load_best(bstate)
        new_params[sub] = bstate.params
        if new_bn is not None and bstate.batch_stats is not None:
            new_bn[sub] = bstate.batch_stats
        print(f"initialized {which} branch from {ckpt_dir}")
    return state.replace(params=new_params, batch_stats=new_bn)


def _train_branch(args, which: str) -> int:
    """Shared driver for the branch-pretraining commands (reference
    ``train_and_validate_eeg`` training.py:12-109 /
    ``train_spectrogram_model`` :135-228; notebook standalone runs
    XAI_Multimodality.py:1319-1427 and :1439-1536 — the ~44% / ~33%
    accuracy anchors of BASELINE.md): train ONE modality's model alone,
    checkpointing under ``<ckpt-dir>/<which>`` for the
    ``train-multimodal --init-from`` handoff."""
    import jax
    import jax.numpy as jnp
    from . import config as C, data, models, ops, train, utils

    # --arch: any zoo model that consumes this branch's input layout
    # (the reference's per-arch experiment scripts, main3.py:37-51 /
    # notebook :1319-1536, select the model by CFG name the same way);
    # validated before any data/model work
    _BRANCH_ARCHS = {
        "eeg": ("eegnet", "eegnet_attention_deep",
                "eegnet_attention_regularized", "eegnet_residual",
                "eegnet_residual_lstm", "eegnet_transformer",
                "eeg_seizure_detection", "deepconvnet"),
        "spectrogram": ("spectrogram_cnn", "spectrogram_vit",
                        "efficientnet_b0", "efficientnetv2_b2"),
    }
    arch = args.arch or _BRANCH_ARCHS[which][2 if which == "eeg" else 0]
    if arch not in _BRANCH_ARCHS[which]:
        raise SystemExit(
            f"--arch {arch!r} is not a {which}-branch model; "
            f"choose from {_BRANCH_ARCHS[which]}")

    cfg = _load_cfg(args)
    (sig, raw_batches, tr_idx, va_idx, eeg_kwargs,
     pf_kwargs) = _multimodal_data(args, cfg)
    bs = args.batch_size or (8 if args.demo else cfg.trainer.batch_size)
    mesh, tr_sh, bs = _train_mesh(args, bs)
    if which == "eeg":
        cls = models.REGISTRY[arch]
        fields = {f.name for f in dataclasses.fields(cls)}
        model = cls(**{k: v for k, v in eeg_kwargs.items() if k in fields})
        pp = jax.jit(lambda e: ops.hms_eeg_preprocess(
            e, signal=sig, assume_finite=not args.demo))
        mirror = jax.jit(ops.mirror_eeg)
        key_name = "eeg"
    else:
        model = models.build(arch)
        pp = jax.jit(lambda s: ops.hms_spectrogram_preprocess(s, signal=sig))
        key_name = "spec"

    # single-modality gather: the host skips assembling (and the
    # prefetcher skips H2D-copying) the other branch's raw batch entirely
    def train_iter(epoch=0):
        for batch in data.prefetch_to_device(
                raw_batches(tr_idx, bs, True, epoch, want=(key_name,)),
                **{**pf_kwargs, **tr_sh}):
            raw = batch[key_name]
            if which == "eeg" and cfg.augment:
                raw = mirror(raw)            # CFG.AUGMENT hemisphere swap
            yield {"x": pp(raw), "y": batch["y"]}

    def val_iter():
        for batch in data.prefetch_to_device(
                raw_batches(va_idx, bs, False, want=(key_name,)),
                **pf_kwargs):
            yield {"x": pp(batch[key_name]), "y": batch["y"]}

    fb = next(raw_batches(va_idx, bs, False, want=(key_name,)))
    first_x = pp(jnp.asarray(fb[key_name]))
    state = train.create_train_state(
        model, (first_x[:2],), train.state.make_optimizer(cfg.trainer.lr),
        jax.random.PRNGKey(args.seed))
    # the notebook's branch runs add a manual L2 term (λ=1e-3 through the
    # model's weight_decay attr, XAI_Multimodality.py:1355-1366) and steer
    # the LR with ReduceLROnPlateau (:1340)
    tc = train.TrainerConfig(epochs=args.epochs or 3, seed=args.seed,
                             resume=args.resume, l2_lambda=1e-3,
                             hyperparams={"optimizer": "adam"},
                             plateau=train.ReduceLROnPlateau(
                                 cfg.trainer.lr))
    if mesh is not None:
        print(f"training over a {args.mesh}-device data mesh, batch {bs}")
    trainer = train.Trainer(state, tc, mesh=mesh,
                            ckpt_dir=f"{args.ckpt_dir}/{which}")
    _, best, _ = trainer.train_eval(train_iter, val_iter)
    # record the arch so `train-multimodal --init-from` can verify the
    # handoff instead of failing inside the checkpoint restore
    with open(os.path.join(args.ckpt_dir, which, "ARCH"), "w") as f:
        f.write(arch + "\n")
    p = utils.plot_training_curves(trainer.history, args.ckpt_dir,
                                   f"{which}_training_curves")
    print(f"{which} branch best kldiv: {best:.4f}; curves: {p}")
    return 0


def cmd_train_eeg(args) -> int:
    """EEG-branch pretraining (training.py:12-109, notebook :1319-1427)."""
    return _train_branch(args, "eeg")


def cmd_train_spectrogram(args) -> int:
    """Spectrogram-branch pretraining (training.py:135-228, :1439-1536)."""
    return _train_branch(args, "spectrogram")


def cmd_train_diffeeg(args) -> int:
    """DiffEEG diffusion training (DiffEEG_train.py).

    Non-demo: the reference trains the denoiser on the 19-channel
    EEGDataset windows (dataset flags cfg_utils.py:97-106 — all scalp
    channels, no magic-8, ::5 downsample to 2000 pts): metadata →
    window cache → device transform → step loop with grad accumulation,
    EMA, and periodic reverse-diffusion MMD evals.
    """
    from . import config as C, data, models, ops, train

    rng = np.random.default_rng(args.seed)
    mesh, _, _ = _train_mesh(args)

    def _round_bs(cfg):
        # micro-batch sample axis must divide the mesh's data axis
        if mesh is None or cfg.batch_size % args.mesh == 0:
            return cfg
        return dataclasses.replace(
            cfg, batch_size=-(-cfg.batch_size // args.mesh) * args.mesh)

    if args.demo:
        cfg = _round_bs(C.DiffEEGConfig(
                              n_channels=4, input_length=256,
                              hidden_channels=8,
                              n_diffusion_steps=50,
                              gradient_accumulate_every=2,
                              batch_size=args.batch_size or 8,
                              evaluate_every=10, save_and_sample_every=10,
                              min_steps=args.epochs or 20,
                              stft_n_fft=32, stft_noverlap=16))

        def batches(start=0):
            # micro-batch i is a pure function of (seed, i): a resumed run
            # continues the same stream where the interrupted one stopped
            for i in itertools.count(start):
                g = np.random.default_rng((args.seed, i))
                x = g.standard_normal(
                    (cfg.batch_size, 4, 256)).astype(np.float32)
                y = np.eye(6, dtype=np.float32)[
                    g.integers(0, 6, cfg.batch_size)]
                yield x, y

        val = [(rng.standard_normal((4, 4, 256)).astype(np.float32),
                np.eye(6, dtype=np.float32)[rng.integers(0, 6, 4)])]
        total = cfg.min_steps
    else:
        full = _load_cfg(args)
        src = data.wavenet_arrays(full.paths, cache_dir=args.ckpt_dir,
                                  n_workers=args.workers, limit=args.limit)
        raw19 = src.pop("x")[..., :len(C.EEG_FEATURES)]   # drop EKG column
        tcfg = C.EEGTransformConfig(apply_chris_magic_ch8=False, n_feats=19)
        x = _device_transform_chunks(raw19,
                                     lambda a: ops.eeg_transform(a, tcfg))
        del raw19
        x = np.ascontiguousarray(x.transpose(0, 2, 1))  # (N, 19, 2000)
        y = src["y"].astype(np.float32)
        print(f"diffeeg training set: {x.shape} "
              f"({x.nbytes / 1e9:.2f} GB transformed)")
        cfg = full.diffeeg                       # --set diffeeg.k=v works
        if args.batch_size:
            cfg = dataclasses.replace(cfg, batch_size=args.batch_size)
        cfg = _round_bs(cfg)
        # keep the training split non-empty even on tiny --limit runs
        n_val = max(1, min(len(x) // 10, len(x) - 1))
        perm = rng.permutation(len(x))
        va, tr = perm[:n_val], perm[n_val:]

        if len(tr) >= cfg.batch_size:
            # epoch-shuffled micro-batches off the C++ ring queue (the
            # reference's DataLoader restart-on-StopIteration loop,
            # DiffEEG_train.py:122-126); numpy fallback without g++
            from . import runtime
            xtr = np.ascontiguousarray(x[tr])
            ytr = np.ascontiguousarray(y[tr])

            def batches(start=0):
                # pop_ring: the trainer holds gradient_accumulate_every
                # micro-batches before stacking them for one step, so the
                # reuse ring must exceed that (+ queue slack)
                ring = cfg.gradient_accumulate_every + 8
                # resume fast-forward: `start` micro-batches were already
                # consumed — skip whole epochs by seed, then discard the
                # in-epoch remainder (queue order is deterministic: the
                # C++ workers publish in sequence order)
                bpe = max(1, len(xtr) // cfg.batch_size)
                ep0, off = divmod(start, bpe)
                for ep in itertools.count(ep0):
                    q = runtime.NativeBatchQueue(
                        xtr, ytr, cfg.batch_size, shuffle=True,
                        seed=args.seed + ep, n_workers=2, pop_ring=ring)
                    it = iter(q)
                    if ep == ep0 and off:
                        for _ in range(off):
                            next(it, None)
                    for b in it:
                        yield b["x"], b["y"]
        else:
            def batches(start=0):
                # micro-batch i is a pure function of (seed, i) — resume
                # continues the stream instead of replaying it
                for i in itertools.count(start):
                    g = np.random.default_rng((args.seed, i))
                    sel = g.choice(tr, size=cfg.batch_size)
                    yield x[sel], y[sel]

        val = [(x[va[s:s + cfg.batch_size]], y[va[s:s + cfg.batch_size]])
               for s in range(0, min(len(va), 4 * cfg.batch_size),
                              cfg.batch_size)]
        total = args.epochs or cfg.min_steps

    import jax.numpy as jnp
    model = models.DiffEEG(n_channels=cfg.n_channels,
                           hidden=cfg.hidden_channels,
                           dtype=jnp.bfloat16 if cfg.amp else None)
    if mesh is not None:
        print(f"training over a {args.mesh}-device data mesh, "
              f"micro-batch {cfg.batch_size}")
    trainer = train.DiffEEGTrainer(model, cfg,
                                   ckpt_dir=f"{args.ckpt_dir}/diffeeg",
                                   seed=args.seed, mesh=mesh)
    if args.resume:
        at = trainer.load()
        print(f"resume: {'step ' + str(at) if at else 'no checkpoint found'}")
    hist = trainer.train(batches, val_batches=val, total_steps=total)
    if hist["loss"]:
        print(f"final loss: {hist['loss'][-1]:.4f}; "
              f"evals: {len(hist['eval'])}")
    else:
        print(f"nothing to do: resumed at step {int(trainer.state.step)} "
              f">= total {total}")
    return 0


def cmd_generate(args) -> int:
    """Class-conditional generation from the TRAINED DiffEEG checkpoint
    (reference ``generate_for_class`` DiffEEG_utils.py:291-313, driver
    main.py:125-157: restore the ``{step, model, ema}`` checkpoint, sample
    every class from a zeros spectrogram prior with the EMA weights, write
    ``generated_class_{c}.npy`` for the augmented-retrain consumer).

    Shapes/steps come from ``cfg.diffeeg`` (``--set diffeeg.k=v`` works);
    the checkpoint is the latest ``train-diffeeg`` step snapshot under
    ``--ckpt-dir/diffeeg``.
    """
    import jax
    from . import config as C, diffusion, models, train

    if args.demo:
        cfg = C.DiffEEGConfig(n_channels=4, input_length=256,
                              hidden_channels=8, n_diffusion_steps=50,
                              stft_n_fft=32, stft_noverlap=16)
    else:
        cfg = _load_cfg(args).diffeeg
    model = models.DiffEEG(n_channels=cfg.n_channels,
                           hidden=cfg.hidden_channels)
    trainer = train.DiffEEGTrainer(model, cfg,
                                   ckpt_dir=f"{args.ckpt_dir}/diffeeg",
                                   seed=args.seed)
    at = trainer.load()
    if at is None:
        if not args.demo:
            print(f"error: no train-diffeeg checkpoint under "
                  f"{args.ckpt_dir}/diffeeg — run train-diffeeg first")
            return 1
        print("no diffeeg checkpoint found; demo continues from fresh init")
    else:
        print(f"restored diffeeg checkpoint at step {at}")
    n = args.n_samples or (2 if args.demo else 50)
    out_dir = os.path.join(args.ckpt_dir, "generated")
    os.makedirs(out_dir, exist_ok=True)
    # sample with the EMA weights — the reference evaluates/generates from
    # the EMA module (DiffEEG_train.py saves {step, model, ema}; the
    # generation driver restores it, main.py:137-145)
    ema_vars = {"params": trainer.ema.params}
    for c in range(cfg.n_classes):
        out = diffusion.generate_for_class_cached(
            trainer.schedule, model, ema_vars,
            jax.random.PRNGKey(args.seed + c), c, n_samples=n,
            n_channels=cfg.n_channels, length=cfg.input_length,
            n_classes=cfg.n_classes)
        np.save(os.path.join(out_dir, f"generated_class_{c}.npy"), out)
        print(f"class {c}: {out.shape} → generated_class_{c}.npy")
    print(f"generated dir: {out_dir}")
    return 0


def cmd_xai(args) -> int:
    """Attribution report on a multimodal model (the reference's XAI phase,
    XAI_Multimodality.py §3.4: load the trained combined checkpoint, then
    SHAP over the EEG branch, LIME over the spectrogram branch, saliency
    over both, Grad-CAM).

    ``--demo``: synthetic data + a fresh model at reduced sizes.
    Non-demo: real HMS rows (``paths.data_root``) at reference sizes; if a
    ``train-multimodal`` checkpoint exists under ``--ckpt-dir``, its best
    params are restored (otherwise a fresh init is used, with a warning).
    """
    import jax
    import jax.numpy as jnp
    from . import config as C, data, models, ops, train, utils, xai

    rng = np.random.default_rng(args.seed)
    if args.demo:
        raw_eeg = data.synthetic_raw_eeg(8, rng, n_points=2000)
        raw_spec = data.synthetic_raw_spectrogram(8, rng, shape=(80, 60))
        sig = C.SignalConfig(fixed_length=600, image_size=(80, 60))
        eeg_in, spec_in = ops.preprocess_multimodal(raw_eeg, raw_spec,
                                                    signal=sig)
        # background set distinct from the explained batch (the reference
        # draws ~100 train-loader samples, XAI_Multimodality.py:2242-2254);
        # only the EEG branch is explained, so only it is preprocessed
        bg_raw = data.synthetic_raw_eeg(32, rng, n_points=2000)
        eeg_bg = ops.hms_eeg_preprocess(bg_raw, signal=sig)
        y_in = np.eye(6, dtype=np.float32)[np.arange(8) % 6]
        y_bg = np.eye(6, dtype=np.float32)[np.arange(32) % 6]
        mm = models.MultimodalModel(
            eeg_model=models.EEGNetAttentionRegularized(
                samples=600,
                kern_length=64 if args.torch_ckpt else 16),
            spectrogram_model=models.SpectrogramCNN(
                fused_blocks=args.fused_spec))
        variables = mm.init(jax.random.PRNGKey(args.seed), eeg_in[:2],
                            spec_in[:2])
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
        if args.torch_ckpt:
            variables = _load_torch_multimodal(args.torch_ckpt, variables)
    else:
        cfg = _load_cfg(args)
        src = data.multimodal_source(cfg.paths, cache_dir=args.ckpt_dir,
                                     n_workers=args.workers)
        # explained batch from the fold-0 VAL split, SHAP background from
        # the TRAIN split (XAI_Multimodality.py:2242-2254) — disjoint by
        # construction, so the explained samples are never their own
        # background and --channel-retrain sees no duplicated rows
        labels = np.asarray([C.NAME2LABEL[c]
                             for c in src.meta["expert_consensus"]])
        tr_idx, va_idx = train.stratified_kfold(labels, n_splits=cfg.n_folds,
                                                seed=args.seed)[0]
        n = min(args.limit or 32, len(va_idx))
        batch = src.gather(np.asarray(va_idx[:n]))
        eeg_in, spec_in = ops.preprocess_multimodal(
            jnp.asarray(batch["eeg"]), jnp.asarray(batch["spec"]),
            signal=cfg.signal, assume_finite=True)
        bg_rows = tr_idx[:min(100, len(tr_idx))]
        bg = src.gather(np.asarray(bg_rows))
        eeg_bg = ops.hms_eeg_preprocess(jnp.asarray(bg["eeg"]),
                                        signal=cfg.signal,
                                        assume_finite=True)
        y_in, y_bg = batch["y"], bg["y"]
        mm = models.MultimodalModel(
            eeg_model=models.EEGNetAttentionRegularized(),
            spectrogram_model=models.SpectrogramCNN(
                fused_blocks=args.fused_spec))
        v0 = mm.init(jax.random.PRNGKey(args.seed), eeg_in[:2], spec_in[:2])
        # the restore target's opt_state pytree must match what
        # train-multimodal saved — same optimizer factory, not a bare adam
        state = train.TrainState.create(
            apply_fn=mm.apply, params=v0["params"],
            tx=train.state.make_optimizer(cfg.trainer.lr),
            batch_stats=v0.get("batch_stats"))
        if args.torch_ckpt:
            variables = _load_torch_multimodal(
                args.torch_ckpt, {"params": state.params,
                                  "batch_stats": state.batch_stats})
        else:
            ckpt = train.CheckpointManager(f"{args.ckpt_dir}/multimodal")
            try:
                state = ckpt.load_best(state)
                print("restored best multimodal checkpoint")
            except Exception as e:                        # noqa: BLE001
                print(f"no checkpoint restored ({type(e).__name__}); "
                      "using fresh init — train with `train-multimodal` "
                      "first for meaningful attributions")
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
    fwd = lambda e, s: mm.apply(variables, e, s)

    ge, gs = xai.multimodal_saliency(fwd, eeg_in, spec_in)
    utils.plot_saliency_heatmap(np.asarray(ge[0, 0]), args.ckpt_dir,
                                "eeg_saliency",
                                xai.channel_select.channel_names_37())
    eeg_fwd = lambda e: mm.apply(variables, e, method=mm.forward_eeg)
    mesh, _, _ = _train_mesh(args)
    if mesh is not None:
        # pod-sharded attribution (BASELINE config #5): the explained
        # samples split over the data axis, each device running its own
        # (baseline × step) sweep — so --mesh N explains the WHOLE batch
        # instead of the single-device default's first 2 samples
        n_ex = len(eeg_in)
        pad = (-n_ex) % args.mesh
        x_ex = (jnp.concatenate([eeg_in, jnp.repeat(eeg_in[-1:], pad, 0)])
                if pad else eeg_in)
        print(f"sharding {n_ex} explained samples over a {args.mesh}-device "
              "data mesh")
        ig = xai.sharded_integrated_gradients(mesh, eeg_fwd, x_ex,
                                              steps=32)[:n_ex]
        shap_vals = xai.sharded_gradient_shap_values(
            mesh, eeg_fwd, x_ex, eeg_bg, jax.random.PRNGKey(0),
            nsamples=16)[:, :n_ex]
    else:
        ig = xai.integrated_gradients(eeg_fwd, eeg_in[:2], steps=32)
        shap_vals = xai.gradient_shap_values(eeg_fwd, eeg_in[:2], eeg_bg,
                                             jax.random.PRNGKey(0),
                                             nsamples=16)
    comp = float(jnp.abs(ig.reshape(len(ig), -1)).sum() / len(ig))
    print(f"IG: mean |attr| mass per sample {comp:.4f} "
          f"(completeness-tested quadrature)")
    idx, scores = xai.get_top_n_channels(np.asarray(shap_vals), n=10)
    names = xai.channel_select.channel_names_37()
    print("top-10 channels:", [names[i] for i in idx])

    if args.channel_retrain:
        # SHAP-driven channel-selection retraining
        # (XAI_Multimodality.py:2467-2587)
        eeg_all = np.concatenate([np.asarray(eeg_in), np.asarray(eeg_bg)])
        y_all = np.concatenate([np.asarray(y_in), np.asarray(y_bg)])
        rep = xai.retrain_on_top_channels(
            eeg_all, y_all, np.asarray(shap_vals),
            n_channels=args.channel_retrain,
            positive_class=args.channel_class,
            epochs=args.epochs or 2,
            batch_size=args.batch_size or 8, seed=args.seed,
            model_kwargs=dict(samples=int(eeg_in.shape[-1]),
                              kern_length=16 if args.demo else 64),
            ckpt_dir=os.path.join(args.ckpt_dir, "channel_retrain"))
        print(f"channel-retrain: top-{args.channel_retrain} channels "
              f"{[names[i] for i in rep['top_channels']]} "
              f"(class {rep['positive_class']} one-vs-rest): "
              f"fresh kldiv {rep['fresh']['kldiv']:.4f} / "
              f"acc {rep['fresh']['accuracy']:.3f} → retrained "
              f"{rep['retrained']['kldiv']:.4f} / "
              f"acc {rep['retrained']['accuracy']:.3f}")

    def predict(batch_hwc):
        spec = jnp.asarray(batch_hwc).transpose(0, 3, 1, 2)
        logp = mm.apply(variables, spec, method=mm.forward_spectrogram)
        return np.asarray(jnp.exp(logp))

    img = np.asarray(spec_in[0]).transpose(1, 2, 0)
    res = xai.lime_explain(predict, img, n_segments=40, num_samples=200,
                           seed=args.seed)
    xai.plot_lime_overlay(img, res, args.ckpt_dir)
    print(f"LIME top label {res['label']}; "
          f"{int(res['mask'].sum())} px in top segments "
          f"(overlay → {args.ckpt_dir}/lime_overlay.png)")

    # Grad-CAM on the (trained) spectrogram branch itself
    spec_model = mm.spectrogram_model
    spec_vars = {"params": variables["params"]["spectrogram_model"],
                 "batch_stats": variables["batch_stats"]["spectrogram_model"]}
    cam = xai.grad_cam(spec_model, spec_vars, spec_in[:2],
                       upsample_to=tuple(spec_in.shape[-2:]))
    utils.plot_saliency_heatmap(np.asarray(cam[0]), args.ckpt_dir,
                                "spec_gradcam")
    print(f"Grad-CAM heatmap {tuple(cam.shape)} saved")
    return 0


def cmd_predict(args) -> int:
    """Batch inference with the trained multimodal checkpoint — the
    serving path.  The reference's inference story is its notebook eval
    cells (XAI_Multimodality.py:1901-1935, no-grad forward over the val
    loader collecting soft predictions); here it is a first-class
    command: restore the best ``train-multimodal`` checkpoint, stream
    every row (or ``--limit``) through the fused on-device preprocess +
    forward in fixed-size padded batches (ONE compiled program — no
    per-tail recompile), and write ``predictions.csv`` with per-class
    probabilities and the argmax class name.
    """
    import jax
    import jax.numpy as jnp
    from . import config as C, data, models, ops, train

    cfg = _load_cfg(args)
    rng = np.random.default_rng(args.seed)
    bs = args.batch_size or (8 if args.demo else cfg.trainer.batch_size)
    # validate --mesh (and round bs) BEFORE the expensive source build +
    # checkpoint restore; data-parallel serving: shard the batch axis over
    # a `data`-only mesh; the captured params replicate and XLA partitions
    # the fused preprocess+forward across devices (forward-only, so the
    # grouped-conv GRADIENT partitioner hazard does not apply)
    mesh, m_sh, bs = _train_mesh(args, bs)
    if args.demo:
        n = 12
        sig = C.SignalConfig(fixed_length=600, image_size=(80, 60))
        raw_eeg = data.synthetic_raw_eeg(n, rng, n_points=2000)
        raw_spec = data.synthetic_raw_spectrogram(n, rng, shape=(80, 60))
        y_demo = np.eye(6, dtype=np.float32)[rng.integers(0, 6, n)]
        ids = np.arange(n)

        def raw_batches():
            for s in range(0, n, bs):
                yield {"eeg": raw_eeg[s:s + bs], "spec": raw_spec[s:s + bs],
                       "y": y_demo[s:s + bs]}

        mm = models.MultimodalModel(
            eeg_model=models.EEGNetAttentionRegularized(
                samples=600,
                # the reference layout's 64-tap conv1 when importing
                kern_length=64 if args.torch_ckpt else 16),
            spectrogram_model=models.SpectrogramCNN(
                fused_blocks=args.fused_spec))
        eeg0, spec0 = ops.preprocess_multimodal(raw_eeg[:2], raw_spec[:2],
                                                signal=sig)
        v0 = mm.init(jax.random.PRNGKey(args.seed), eeg0, spec0)
        variables = {"params": v0["params"],
                     "batch_stats": v0["batch_stats"]}
        if args.torch_ckpt:
            variables = _load_torch_multimodal(args.torch_ckpt, variables)
        pp_kwargs = dict(signal=sig)
    else:
        src = data.multimodal_source(cfg.paths, cache_dir=args.ckpt_dir,
                                     n_workers=args.workers,
                                     limit=args.limit)
        n = len(src)
        ids = src.meta["eeg_id"].to_numpy()

        def raw_batches():
            return src.batches(np.arange(n), bs, shuffle=False,
                               drop_last=False)

        b0 = src.gather(np.arange(min(2, n)))
        mm = models.MultimodalModel(
            eeg_model=models.EEGNetAttentionRegularized(),
            spectrogram_model=models.SpectrogramCNN(
                fused_blocks=args.fused_spec))
        eeg0, spec0 = ops.preprocess_multimodal(
            jnp.asarray(b0["eeg"]), jnp.asarray(b0["spec"]),
            signal=cfg.signal, assume_finite=True)
        v0 = mm.init(jax.random.PRNGKey(args.seed), eeg0, spec0)
        if args.torch_ckpt:
            variables = _load_torch_multimodal(
                args.torch_ckpt, {"params": v0["params"],
                                  "batch_stats": v0["batch_stats"]})
        else:
            state = train.TrainState.create(
                apply_fn=mm.apply, params=v0["params"],
                tx=train.state.make_optimizer(cfg.trainer.lr),
                batch_stats=v0.get("batch_stats"))
            try:
                state = train.CheckpointManager(
                    f"{args.ckpt_dir}/multimodal").load_best(state)
                print("restored best multimodal checkpoint")
            except Exception as e:                        # noqa: BLE001
                print(f"error: no multimodal checkpoint under "
                      f"{args.ckpt_dir}/multimodal ({type(e).__name__}) — "
                      "run train-multimodal first")
                return 1
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        # honor --set signal.* overrides (r5 serving preset included)
        pp_kwargs = dict(assume_finite=True, signal=cfg.signal)

    put = jnp.asarray
    if mesh is not None:
        sh = m_sh["sharding"]
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        print(f"serving over a {args.mesh}-device data mesh, batch {bs}")

    @jax.jit
    def forward(eeg_raw, spec_raw):
        e, s = ops.preprocess_multimodal(eeg_raw, spec_raw, **pp_kwargs)
        return jnp.exp(mm.apply(variables, e, s))     # log-softmax → probs

    probs, ys = [], []
    for batch in raw_batches():
        eeg_b, spec_b = batch["eeg"], batch["spec"]
        pad = bs - len(eeg_b)
        if pad:                       # static batch shape: pad + slice
            eeg_b = np.concatenate([eeg_b, np.repeat(eeg_b[-1:], pad, 0)])
            spec_b = np.concatenate([spec_b,
                                     np.repeat(spec_b[-1:], pad, 0)])
        p = np.asarray(forward(put(eeg_b), put(spec_b)))
        probs.append(p[:len(p) - pad] if pad else p)
        if args.eval:
            ys.append(np.asarray(batch["y"]))
    probs = np.concatenate(probs)[:n]

    import pandas as pd
    df = pd.DataFrame(probs, columns=[f"p_{c}" for c in C.CLASSES])
    df.insert(0, "eeg_id", ids[:n])
    df["predicted_class"] = [C.CLASSES[i] for i in probs.argmax(1)]
    out = os.path.join(args.ckpt_dir, "predictions.csv")
    df.to_csv(out, index=False)
    print(f"wrote {len(df)} predictions → {out}")
    print(df["predicted_class"].value_counts().to_string())

    if args.eval:
        # the reference's notebook eval cells (XAI_Multimodality.py:
        # 1901-1935 no-grad soft predictions + training_utils.py:178-241
        # metric registry + data_utils.py:536-599 confusion matrix)
        from . import utils
        y = np.concatenate(ys)[:n]
        logp = jnp.log(jnp.clip(jnp.asarray(probs), 1e-12, 1.0))
        yj = jnp.asarray(y)
        kld = float(train.kldiv_with_log_probs(logp, yj))
        acc = float(train.hard_accuracy(logp, yj))
        soft = float(train.soft_accuracy(logp, yj))
        pred_c = jnp.argmax(logp, -1)
        true_c = jnp.argmax(yj, -1)
        prec, rec, f1 = (float(v) for v in
                         train.macro_precision_recall_f1(pred_c, true_c, 6))
        cm = train.confusion_matrix(pred_c, true_c, 6)
        path = utils.plot_confusion_matrix(np.asarray(cm), C.CLASSES,
                                           args.ckpt_dir)
        print(f"eval over {n} rows: kldiv {kld:.4f}  acc {acc:.3f}  "
              f"soft-acc {soft:.3f}  macro P/R/F1 "
              f"{prec:.3f}/{rec:.3f}/{f1:.3f}")
        print(f"confusion matrix → {path}")
    return 0


def cmd_grid_search(args) -> int:
    """Hyperparameter grid search over the WaveNet (reference
    ``parallel_grid_search``, training_utils.py:48-132 — a
    torch.multiprocessing pool handing one GPU per (gamma, decay_epochs)
    combination; here every grid point trains simultaneously inside ONE
    vmapped jit, no processes).  Axes come from repeatable
    ``--grid name=v1,v2,...`` flags (default ``lr=1e-3,3e-3,1e-2``; only
    ``lr`` steers the optimizer — other axes are carried through to the
    report).  Prints the ranked table and the best configuration."""
    from . import config as C, data, models, ops, train

    grid = {}
    for spec in args.grid or ["lr=1e-3,3e-3,1e-2"]:
        name, _, vals = spec.partition("=")
        if not vals:
            print(f"error: --grid {spec!r} is not name=v1,v2,...")
            return 1
        try:
            grid[name.strip()] = [float(v) for v in vals.split(",")]
        except ValueError:
            print(f"error: --grid {spec!r} has a non-numeric value "
                  "(grid axes must be numbers)")
            return 1

    rng = np.random.default_rng(args.seed)
    if args.demo:
        n = 32
        x = rng.standard_normal((n, 256, 8)).astype(np.float32)
        y = train.cv.aggregate_vote_labels(rng.integers(0, 10, (n, 6)))
        model = models.DilatedInceptionWaveNet(block_layers=(3, 2),
                                               block_dims=(8, 8))
    else:
        cfg = _load_cfg(args)
        src = data.wavenet_arrays(cfg.paths, cache_dir=args.ckpt_dir,
                                  n_workers=args.workers, limit=args.limit)
        raw = src.pop("x")
        tcfg = C.EEGTransformConfig(apply_chris_magic_ch8=True, n_feats=8)
        x = _device_transform_chunks(raw,
                                     lambda a: ops.eeg_transform(a, tcfg))
        del raw
        y = src["y"].astype(np.float32)
        model = models.DilatedInceptionWaveNet()

    bs = args.batch_size or 16

    def batches():
        return data.batch_iterator({"x": x, "y": y}, bs, shuffle=True,
                                   seed=args.seed)

    best, results = train.parallel_grid_search(
        model, (x[:2],), batches, grid, train.kldiv_with_logits,
        epochs=args.epochs or 2, seed=args.seed)
    for r in results:
        print("  " + "  ".join(f"{k}={v:.4g}" for k, v in r.items()))
    print("best:", " ".join(f"{k}={v:.4g}" for k, v in best.items()))
    return 0


def cmd_dump_config(args) -> int:
    """Print the effective configuration (defaults + ``--config`` YAML +
    ``--set`` overrides) as round-trippable YAML — the generated
    counterpart of the reference's hand-maintained config.yml.  Save it
    and pass it back with ``--config`` to pin a run's full parameter
    set."""
    from . import config as C
    print(C.dump_yaml(_load_cfg(args)), end="")
    return 0


def cmd_sanity_check(args) -> int:
    """Autoencoder sanity training + sample grids — the counterpart of the
    reference's MNIST sanity loop (main.py:226-271, diffEEG.py:151-212,
    DiffEEG_utils.py:551-599) on synthetic digit-like blobs (the MNIST
    files themselves are an external dataset)."""
    import jax
    import jax.numpy as jnp
    import optax
    from . import models, utils

    rng = np.random.default_rng(args.seed)
    # synthetic "digits": gaussian blobs at class-dependent positions
    n = 256
    yy, xx = np.mgrid[0:28, 0:28]
    centers = rng.uniform(6, 22, size=(n, 2))
    imgs = np.exp(-(((yy[None] - centers[:, :1, None]) ** 2
                     + (xx[None] - centers[:, 1:, None]) ** 2) / 18.0))
    imgs = imgs.astype(np.float32)

    model = models.DiffEEGSanityCheck(input_dim=784, hidden=128)
    x = jnp.asarray(imgs)
    variables = model.init(jax.random.PRNGKey(args.seed), x[:2])
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    params = variables["params"]

    @jax.jit
    def step(params, opt_state, xb):
        def loss(p):
            out = model.apply({"params": p}, xb)
            return jnp.mean((out - xb) ** 2)
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state2, l

    epochs = args.epochs or 50
    for epoch in range(epochs):
        params, opt_state, l = step(params, opt_state, x)
        if epoch % 10 == 0 or epoch == epochs - 1:
            recon = np.asarray(model.apply({"params": params}, x[:16]))
            utils.plot_sample_grid(recon.reshape(-1, 28, 28), args.ckpt_dir,
                                   f"sanity_recon_epoch{epoch}")
            print(f"epoch {epoch}: mse {float(l):.5f}")
    return 0


def cmd_convert_spectrograms(args) -> int:
    """Parallel spectrogram parquet→npy conversion (reference main3.py:79-94:
    joblib loky pool, NaN→0, transpose to (Freq, Time)) — multiprocessing
    over the parquet directory."""
    import multiprocessing as mp
    from functools import partial
    from . import data

    cfg = _load_cfg(args)
    src = cfg.paths.train_spectr
    dst = os.path.join(args.ckpt_dir, "spectrograms_npy")
    os.makedirs(dst, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    with mp.Pool() as pool:
        n = sum(pool.map(partial(_convert_one, src=src, dst=dst), files))
    print(f"converted {n} spectrograms → {dst}")
    return 0


def _convert_one(fname: str, src: str, dst: str) -> int:
    from . import data
    arr = data.load_spectrogram_parquet(os.path.join(src, fname))
    arr = np.nan_to_num(arr, nan=0.0).T.astype(np.float32)  # (Freq, Time)
    np.save(os.path.join(dst, fname.replace(".parquet", ".npy")), arr)
    return 1


def cmd_long_eeg(args) -> int:
    """Long multi-hour EEG demo (BASELINE config #4): sequence-parallel
    transformer encoder over a sharded time axis + attention rollout."""
    import jax
    import jax.numpy as jnp
    from . import config as C, parallel, utils

    rng = np.random.default_rng(args.seed)
    n_dev = jax.device_count()
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=1, seq=n_dev))
    enc = parallel.LongEEGEncoder(n_channels=20, patch=200, d_model=128,
                                  depth=4, n_heads=4)
    params = enc.init(jax.random.PRNGKey(args.seed))
    # "multi-hour": T must divide by patch × seq shards; demo uses ~10 min
    T = 200 * 64 * n_dev
    x = rng.standard_normal((2, 20, T)).astype(np.float32)
    logits, roll = parallel.long_eeg_rollout(enc, params, jnp.asarray(x),
                                             mesh)
    print(f"devices={n_dev} seq-sharded T={T} ({T/200/60:.1f} min) "
          f"logits={logits.shape} rollout={tuple(roll.shape)}")
    utils.plot_saliency_heatmap(np.asarray(roll[0][:200, :200]),
                                args.ckpt_dir, "long_eeg_rollout")
    return 0


def cmd_cache_build(args) -> int:
    from . import data
    cfg = _load_cfg(args)
    meta = data.load_train_metadata(cfg.paths.train_csv)
    cache = data.EEGRecordCache(f"{args.ckpt_dir}/eeg_cache.npz")
    cache.build(cfg.paths.train_eegs, meta["eeg_id"].unique())
    cache.save()
    print(f"cached {len(cache)} records")
    return 0


def cmd_bench(args) -> int:
    """Headline benchmark via the repo-root harness (absolute path, own
    process — the harness supervises itself and always prints one JSON
    line; other modes run ``python bench.py --<mode>`` directly)."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(repo, "bench.py")
    if not os.path.exists(bench):
        # stderr: stdout is reserved for the harness's one JSON line
        print("bench.py not found next to the package "
              "(installed without the repo tree)", file=sys.stderr)
        return 1
    return subprocess.call([sys.executable, bench])


COMMANDS = {
    "train-wavenet": cmd_train_wavenet,
    "train-multimodal": cmd_train_multimodal,
    "train-eeg": cmd_train_eeg,
    "train-spectrogram": cmd_train_spectrogram,
    "train-diffeeg": cmd_train_diffeeg,
    "generate": cmd_generate,
    "predict": cmd_predict,
    "xai": cmd_xai,
    "cache-build": cmd_cache_build,
    "long-eeg": cmd_long_eeg,
    "convert-spectrograms": cmd_convert_spectrograms,
    "grid-search": cmd_grid_search,
    "sanity-check": cmd_sanity_check,
    "bench": cmd_bench,
    "dump-config": cmd_dump_config,
}


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="multimodal_brain_pattern_identification_xai_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in COMMANDS:
        p = sub.add_parser(name)
        _add_common(p)
    args = parser.parse_args(argv)
    os.makedirs(args.ckpt_dir, exist_ok=True)
    return COMMANDS[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
