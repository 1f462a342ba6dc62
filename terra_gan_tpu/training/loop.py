"""Training loop (reference: mvp_gan/src/train.py:23-453).

Faithful control flow — epochs over a shuffled loader, per-epoch
validation, best-checkpoint selection on val g-loss (train g-loss when
no val set), periodic epoch checkpoints, the reference's metric
namespace — but with the whole optimizer step as one jitted XLA
program (see step.py), device-sharded batches over a mesh, and
metrics fetched once per log interval instead of every batch (the
reference's .item() calls force a device sync every batch —
SURVEY §7.3 hard part 6).

Loss quirk preserved (train.py:110-114): initial training builds its
criterion without a boundary weight, so boundary runs at the default
0.5 regardless of config. TrainingConfig.faithful_boundary_default
controls this.
"""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, TrainingConfig
from ..data.dataset import BatchLoader, InpaintingDataset
from ..losses import InpaintingLossConfig
from ..models.vgg import VGGParams
from .checkpoint import export_pth, save_native
from .state import GANTrainState, adam
from .step import make_eval_step, make_train_step

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# graceful preemption (TPU pods are preemptible in production; the
# reference has no recovery story beyond re-running — SURVEY §5.3)
# ---------------------------------------------------------------------------

_PREEMPT = threading.Event()

# batches between cross-host preemption polls (multi-host only): the
# host-OR is a blocking allgather, so polling every batch would stall
# the dispatch pipeline; 8 batches ≈ 1.3 s at the measured 160 ms/step,
# well inside any SIGTERM grace window
_PREEMPT_POLL_BATCHES = 8


def _timed_iter(iterable, acc: Dict[str, float]):
    """Yield from iterable, accumulating the wall time spent blocked
    waiting for each item into acc['s'] — with async device dispatch,
    that wait IS the feed starvation (the loader's prefetch thread
    didn't have the next batch ready)."""
    it = iter(iterable)
    while True:
        t0 = time.perf_counter()
        try:
            item = next(it)
        except StopIteration:
            return
        acc["s"] = acc.get("s", 0.0) + (time.perf_counter() - t0)
        yield item


def request_preemption() -> None:
    """Ask the running train() to checkpoint and stop at the next batch
    boundary. Safe from signal handlers and other threads."""
    _PREEMPT.set()


class TrainingPreempted(RuntimeError):
    """Training was interrupted (SIGTERM or an injected drill) and the
    latest state was saved to a dedicated ``preempted.pth`` next to the
    master checkpoint — never OVER it, so the best-validation weights
    the master holds survive a preemption during a worse epoch. Carries
    the live state and the save path so drivers can export extra
    metadata / name the file before exiting; the CLI maps this to exit
    code 75 (EX_TEMPFAIL: re-run the same command to resume)."""

    def __init__(self, state=None, epoch: Optional[int] = None,
                 checkpoint: Optional[Path] = None):
        super().__init__(f"training preempted at epoch {epoch}")
        self.state = state
        self.epoch = epoch
        self.checkpoint = checkpoint


@contextlib.contextmanager
def _preemption_guard():
    """Arm SIGTERM -> graceful preemption for the duration of a training
    run. Main-thread only (signal.signal requires it); nested/threaded
    train() calls run unguarded — request_preemption() still works.

    The guard wraps the epoch loop only: a SIGTERM during the setup /
    first-compile phase still hard-kills the process, which is lossless
    (no training progress exists yet; any prior checkpoint is intact)."""
    armed = False
    prev = None
    if threading.current_thread() is threading.main_thread():
        try:
            prev = signal.signal(
                signal.SIGTERM, lambda signum, frame: request_preemption()
            )
            armed = True
            logger.info(
                "preemption handler armed: SIGTERM checkpoints and stops "
                "at the next batch boundary"
            )
        except ValueError:  # pragma: no cover - exotic embedding contexts
            pass
    try:
        yield
    finally:
        if armed:
            signal.signal(
                signal.SIGTERM, prev if prev is not None else signal.SIG_DFL
            )
        _PREEMPT.clear()


def _fault_injection(epoch: int, batch_idx: int) -> None:
    """Recovery-drill hook (the reference has no fault injection —
    SURVEY §5.3). TERRA_GAN_TPU_FAULT="preempt@E:B" requests a graceful
    preemption at epoch E, batch B, exercising exactly the SIGTERM path
    without a signal — usable from tests and operational drills."""
    spec = os.environ.get("TERRA_GAN_TPU_FAULT")
    if not spec:
        return
    try:
        kind, loc = spec.split("@", 1)
        at = tuple(int(v) for v in loc.split(":", 1))
    except ValueError:
        logger.warning("unrecognized TERRA_GAN_TPU_FAULT spec: %r", spec)
        return
    if kind == "preempt" and at == (epoch, batch_idx):
        logger.warning("fault injection: preempt@%d:%d", *at)
        request_preemption()


@jax.jit
def _snapshot(tree):
    """Device-side copy of a pytree: jit outputs are fresh buffers
    (inputs are not donated), so the result is independent of later
    donation of the original."""
    return tree


class _AsyncSaver:
    """One background checkpoint writer (training.async_checkpoint).

    The caller snapshots the state ON DEVICE first (cheap copy) — the
    train step donates its input buffers, so by the time this thread
    fetches, the original arrays may already be deleted. At most one
    save is in flight: submitting joins the previous one (natural
    back-pressure, and two writers can never race on the same path)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None

    def submit(self, fn) -> None:
        self.join()
        self._thread = threading.Thread(
            target=fn, name="ckpt-writer", daemon=False
        )
        self._thread.start()

    def join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def loss_config_for_initial_training(cfg: TrainingConfig) -> InpaintingLossConfig:
    return InpaintingLossConfig(
        perceptual_weight=cfg.loss_weights.perceptual,
        tv_weight=cfg.loss_weights.tv,
        boundary_weight=cfg.effective_boundary_weight(),
        vgg_remat=cfg.vgg_remat,
    )


def _to_device(batch: Dict[str, np.ndarray], mesh=None, shard_data=True):
    """Host batch -> device. With a mesh, tiles shard over the data axis
    (shard_data=False replicates instead — the tail-batch path; see
    shard_train_step). No padding: padded duplicate tiles would bias the
    loss means, gradients and BatchNorm batch statistics, while the
    reference computes them over the true tail batch
    (mvp_gan/src/train.py:75-81, drop_last unset)."""
    arrays = {
        k: v for k, v in batch.items() if isinstance(v, np.ndarray)
    }
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        return shard_batch(arrays, mesh, shard_data=shard_data)
    return {k: jnp.asarray(v) for k, v in arrays.items()}


def _fetch_floats(
    metrics: Dict[str, Any], epoch: int, batch_idx: Optional[int] = None
) -> Dict[str, float]:
    """Fetch device metrics to host floats, surfacing async failures.

    JAX dispatch is asynchronous: a device-side error in a jitted step
    (OOM, numerical runtime fault) does NOT raise at the step call — it
    poisons the returned arrays and raises at the first host fetch,
    i.e. here. The pre-failure state is unrecoverable (its buffers were
    donated into the failing step), so we abort with a pointer to the
    real failure site instead of a confusing far-away traceback.
    """
    try:
        return {k: float(v) for k, v in metrics.items()}
    except Exception as e:
        where = (
            f"epoch {epoch}" if batch_idx is None
            else f"epoch {epoch}, by batch {batch_idx}"
        )
        raise RuntimeError(
            f"device-side training failure surfaced at metric fetch "
            f"({where}): a jitted train step failed asynchronously on "
            f"device after dispatch; the training state is unrecoverable "
            f"(donated buffers). Original error: {e}"
        ) from e


def train(
    img_dir: str | Path,
    mask_dir: str | Path,
    generator,
    discriminator,
    state: Optional[GANTrainState] = None,
    checkpoint_path: Optional[str | Path] = None,
    config: Optional[Config] = None,
    tracker=None,
    val_img_dir: Optional[str | Path] = None,
    val_mask_dir: Optional[str | Path] = None,
    vgg_params: Optional[VGGParams] = None,
    mesh=None,
    image_size: int = 512,
    seed: int = 0,
    start_epoch: int = 0,
    resume_best: Optional[Dict[str, float]] = None,
    preempt_extra: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Adversarial training over one grid's train split.

    Returns {'best_train_loss', 'best_val_loss', 'total_time',
    'final_epoch', 'state'} (reference contract + the final state).

    start_epoch / resume_best: preemption resume. A preempted.pth
    stores the epoch it interrupted plus the best losses seen so far;
    passing them back (cli/main_pipeline.py) makes the resumed run
    finish epochs [start_epoch, epochs) — each epoch of the schedule
    runs and logs exactly once across the runs, and the best-model
    master is only overwritten by a validation loss that beats the
    PRE-preemption best, not a fresh inf. (The reference has no
    preemption at all — train.py:159 always runs range(epochs).)
    """
    config = config or Config()
    tcfg = config.training
    loss_cfg = loss_config_for_initial_training(tcfg)
    batch_size = tcfg.initial.batch_size
    lr = tcfg.initial.learning_rate

    # multi-host: per-host control flow must stay in lockstep — a host
    # that skips or stops at a batch the others run deadlocks them in
    # the next collective (parallel/distributed.py)
    import jax as _jax

    multihost = _jax.process_count() > 1
    if multihost:
        from ..parallel import any_process
    else:
        any_process = bool

    dataset = InpaintingDataset(img_dir, mask_dir, size=image_size)
    # torch DataLoader default keeps the partial tail batch
    # (train.py:75-81, drop_last unset); each distinct tail shape costs
    # one extra jit compile, which the persistent cache absorbs.
    # strict under multi-host: a producer-side batch skip on one host
    # would silently shift its batch sequence out of lockstep
    loader = BatchLoader(
        dataset, batch_size=batch_size, shuffle=True, seed=seed,
        drop_last=False, strict=multihost,
        num_workers=tcfg.feed_workers,
    )
    val_loader = None
    if val_img_dir and val_mask_dir:
        try:
            val_ds = InpaintingDataset(val_img_dir, val_mask_dir, size=image_size)
            if len(val_ds):
                # same lockstep rule as the train loader: a val batch
                # skipped on one host desyncs its eval_fn collective
                # schedule from the pod
                val_loader = BatchLoader(
                    val_ds, batch_size=batch_size, shuffle=False,
                    strict=multihost, num_workers=tcfg.feed_workers,
                )
        except Exception as e:
            logger.warning("validation dataset unavailable: %s", e)

    if state is None:
        state = GANTrainState.create(
            generator, discriminator, jax.random.PRNGKey(seed),
            sample_shape=(1, image_size, image_size, 1),
            g_tx=adam(lr), d_tx=adam(lr),
        )
    else:
        # copy (not view) the caller's state: the jitted step donates
        # its state buffers, which would otherwise silently delete the
        # arrays the caller still holds (one-time copy, ~params+moments)
        state = jax.tree.map(jnp.array, state)

    raw_step = make_train_step(
        generator, discriminator, adam(lr), adam(lr), loss_cfg,
        jit_compile=mesh is None,
        loss_compute_dtype=getattr(generator, "compute_dtype", None),
    )
    tail_step_fn = None
    data_size = 1
    if mesh is not None:
        from ..parallel.mesh import data_axis_size, shard_train_step

        data_size = data_axis_size(mesh)
        step_fn = shard_train_step(raw_step, mesh)
        # non-divisible final batches run data-replicated for exact
        # true-batch loss/BN semantics (no padding bias)
        tail_step_fn = shard_train_step(raw_step, mesh, shard_data=False)
    else:
        step_fn = raw_step
    eval_fn = make_eval_step(generator, discriminator, loss_cfg)

    best_val = float("inf")
    best_train = float("inf")
    if resume_best:
        best_val = float(resume_best.get("best_val_loss", best_val))
        best_train = float(resume_best.get("best_train_loss", best_train))
    t_start = time.time()
    epochs = tcfg.initial.epochs
    start_epoch = max(0, min(int(start_epoch), epochs))
    if start_epoch:
        # align the shuffle stream so epoch k's batch order matches the
        # uninterrupted run's (and, multi-host, every other host's)
        loader.set_epoch(start_epoch)
        logger.info(
            "resuming training at epoch %d/%d (best_val=%s)",
            start_epoch, epochs,
            f"{best_val:.4f}" if best_val != float("inf") else "n/a",
        )
    log_interval = tcfg.initial.log_interval
    ckpt_interval = tcfg.initial.checkpoint_interval
    checkpoint_path = Path(checkpoint_path) if checkpoint_path else None
    epoch = -1
    val_g = val_d = None

    saver = _AsyncSaver() if tcfg.async_checkpoint else None

    def do_save(path, save_epoch, extra):
        """Checkpoint write: synchronous (reference semantics) or, with
        training.async_checkpoint, snapshotted on-device and written on
        the background thread so training never stalls on the
        device->host fetch + disk write."""
        if saver is None:
            _save(path, state, save_epoch, lr, config, extra)
            return
        # one jitted program: fresh output buffers (no donation => no
        # aliasing), so the snapshot survives the next step's donation;
        # per-leaf jnp.array copies would pay a dispatch round trip per
        # tensor on remote-attached devices
        snap = _snapshot(state)
        saver.submit(
            lambda: _save(path, snap, save_epoch, lr, config, extra)
        )

    with contextlib.ExitStack() as _stack:
        _stack.enter_context(_preemption_guard())
        if saver is not None:
            # flush any in-flight write on every exit path (normal,
            # preempted, or failed) so checkpoints are never torn
            _stack.callback(saver.join)
        for epoch in range(start_epoch, epochs):
            t_epoch = time.time()
            sums: Dict[str, float] = {}
            n_batches = 0

            last_err: Optional[Exception] = None
            feed_wait = {"s": 0.0}
            for batch_idx, batch in enumerate(_timed_iter(loader, feed_wait)):
                _fault_injection(epoch, batch_idx)
                # lockstep: SIGTERM delivered to ANY host stops every
                # host at this same batch boundary (host-level OR; a
                # single-host run reduces to the plain flag check).
                # Multi-host polls the collective only every
                # _PREEMPT_POLL_BATCHES batches: a per-batch allgather
                # would block the host on the in-flight device step and
                # reintroduce the per-batch sync this loop exists to
                # avoid. The poll schedule is a pure function of
                # batch_idx, so every host enters the collective at the
                # same boundaries; a flag raised between polls waits at
                # most _PREEMPT_POLL_BATCHES-1 batches (~1-2 s).
                poll = (not multihost) or (
                    batch_idx % _PREEMPT_POLL_BATCHES == 0
                )
                if poll and any_process(_PREEMPT.is_set()):
                    # graceful preemption: persist the last committed
                    # state, then surface. Outside the per-batch except
                    # on purpose — preemption must never be "skipped".
                    # The save goes to a SIBLING preempted.pth, not the
                    # master checkpoint_path: the master holds the best-
                    # validation weights (train.py:314-397 contract) and
                    # must not be clobbered by a possibly-worse latest
                    # state. Resume prefers preempted.pth via
                    # resolve_checkpoint and consumes it on completion.
                    preempted_path = None
                    if checkpoint_path is not None:
                        preempted_path = (
                            checkpoint_path.parent / "preempted.pth"
                        )
                        logger.warning(
                            "preemption requested: saving latest state "
                            "to %s (epoch %d, batch %d)",
                            preempted_path, epoch, batch_idx,
                        )
                        if saver is not None:
                            saver.join()  # never race an async write
                        _save(
                            preempted_path, state, epoch, lr, config,
                            # best losses ride along so the resumed run
                            # compares against the pre-preemption best
                            # instead of a fresh inf
                            {"preempted": True,
                             "best_val_loss": best_val,
                             "best_train_loss": best_train,
                             # caller context (e.g. which parent grid's
                             # schedule this epoch belongs to) so resume
                             # applies the fast-forward to the right run
                             **(preempt_extra or {})},
                        )
                    raise TrainingPreempted(
                        state=state, epoch=epoch, checkpoint=preempted_path
                    )
                try:
                    n_tiles = next(
                        v.shape[0] for v in batch.values()
                        if isinstance(v, np.ndarray)
                    )
                    # non-divisible tail batches take the data-replicated
                    # step: true-batch loss/BN semantics, no padding bias
                    tail = mesh is not None and n_tiles % data_size != 0
                    dev_batch = _to_device(batch, mesh, shard_data=not tail)
                    fn = tail_step_fn if tail else step_fn
                    state, metrics = fn(state, dev_batch, vgg_params)
                except Exception as e:
                    if multihost:
                        # skipping would desync this host's collective
                        # schedule from the pod and deadlock the others
                        # — abort loudly instead; resume via the normal
                        # checkpoint chain
                        raise RuntimeError(
                            f"batch {batch_idx} failed on this host; "
                            "multi-host training cannot skip batches "
                            "(collective lockstep) — aborting"
                        ) from e
                    # reference behavior: log and skip the failed batch,
                    # never abort the epoch (train.py:268-270). Reliable
                    # only for host-side errors (data load, placement,
                    # trace/compile): JAX dispatch is async, so a *device*-
                    # side failure returns normally here and surfaces at
                    # the next metric fetch — see _fetch_floats.
                    logger.error("batch %d failed, skipping: %s", batch_idx, e)
                    last_err = e
                    continue
                n_batches += 1
                # accumulate on device; fetch lazily
                for k in ("g_loss", "d_loss", "real_loss", "fake_loss"):
                    sums[k] = sums.get(k, 0.0) + metrics[k]
                if loss_cfg.boundary_weight > 0 and "g_boundary" in metrics:
                    sums["boundary_loss"] = (
                        sums.get("boundary_loss", 0.0) + metrics["g_boundary"]
                    )
                if tracker is not None and batch_idx % log_interval == 0:
                    step_no = epoch * len(loader) + batch_idx
                    host = _fetch_floats(metrics, epoch, batch_idx)
                    tracker.log_training_batch(
                        batch_metrics=host, step=step_no
                    )

            if n_batches == 0:
                if last_err is not None:
                    # every single batch of an epoch failed: systematic
                    # (OOM, compile failure, wedged device, broken loss
                    # setup), not a bad tile — surface it instead of
                    # "succeeding" with no training (any epoch, not just
                    # the first: a device can wedge mid-run)
                    raise RuntimeError(
                        f"training made no progress: every batch of epoch "
                        f"{epoch} failed"
                    ) from last_err
                logger.warning("no batches in epoch %d", epoch)
                continue
            epoch_metrics = {
                k: v / n_batches
                for k, v in _fetch_floats(sums, epoch).items()
            }
            epoch_metrics["epoch_time"] = time.time() - t_epoch
            # feed starvation: how long the loop sat blocked on the
            # prefetch loader per batch. Device dispatch is async, so a
            # large value means the run is FEED-bound (host decode /
            # disk), not device-bound — the signal that says "raise
            # TERRA_GAN_TPU_TILE_CACHE_MB / check host IO", which no
            # loss metric can reveal
            epoch_metrics["data_wait_ms_per_batch"] = (
                feed_wait["s"] / max(1, batch_idx + 1) * 1000.0
            )

            # ---- validation (train.py:277-303) -----------------------------
            val_g = val_d = None
            if val_loader is not None:
                vg = vd = 0.0
                nv = 0
                for vb in val_loader:
                    state, _, vm = eval_fn(state, _to_device(vb), vgg_params)
                    vg += float(vm["val_g_loss"])
                    vd += float(vm["val_d_loss"])
                    nv += 1
                if nv:
                    val_g, val_d = vg / nv, vd / nv
                    if tracker is not None:
                        tracker.log_metrics(
                            {"validation.g_loss": val_g, "validation.d_loss": val_d},
                            step=epoch,
                        )

            # ---- best-model checkpointing (train.py:314-397) ---------------
            improved = False
            if val_g is not None:
                if val_g < best_val:
                    best_val, improved = val_g, True
            elif epoch_metrics["g_loss"] < best_train:
                best_train, improved = epoch_metrics["g_loss"], True
            if val_g is None:
                best_train = min(best_train, epoch_metrics["g_loss"])

            if improved and checkpoint_path is not None:
                extra = {
                    "epoch": epoch,
                    "g_loss": epoch_metrics["g_loss"],
                    "d_loss": epoch_metrics["d_loss"],
                }
                if val_g is not None:
                    extra.update({"val_g_loss": val_g, "val_d_loss": val_d})
                do_save(checkpoint_path, epoch, extra)
                if tracker is not None:
                    tracker.log_model(
                        {"params": state.g_params, "batch_stats": state.g_stats},
                        "best_model_validation" if val_g is not None
                        else "best_model_train",
                        metrics={**extra, "best_val_loss": best_val}
                        if val_g is not None else extra,
                    )

            # periodic checkpoint every ckpt_interval epochs (train.py:400-405)
            if checkpoint_path is not None and epoch % ckpt_interval == 0:
                do_save(
                    checkpoint_path.parent / f"checkpoint_epoch_{epoch}",
                    epoch, {},
                )

            if tracker is not None:
                tracker.log_metrics(
                    {
                        "epoch.g_loss": epoch_metrics["g_loss"],
                        "epoch.d_loss": epoch_metrics["d_loss"],
                        "epoch.real_loss": epoch_metrics["real_loss"],
                        "epoch.fake_loss": epoch_metrics["fake_loss"],
                        "epoch.time": epoch_metrics["epoch_time"],
                        "epoch.data_wait_ms_per_batch": epoch_metrics[
                            "data_wait_ms_per_batch"
                        ],
                    },
                    step=epoch,
                )
            msg = (
                f"epoch {epoch}: g_loss={epoch_metrics['g_loss']:.4f} "
                f"d_loss={epoch_metrics['d_loss']:.4f}"
            )
            if val_g is not None:
                msg += f" val_g={val_g:.4f} val_d={val_d:.4f}"
            logger.info("%s time=%.2fs", msg, epoch_metrics["epoch_time"])


    # ---- QAT tail fine-tune (training.qat_tail) -------------------------
    # Runs only on COMPLETED runs (a preemption raises out above): the
    # deployed w8a8_resident_full tail needs the final weights adapted
    # to its int8 numerics, and the frozen calibration scales must ship
    # with the checkpoint (deployment contract: QAT scale == serving
    # scale). Protocol + measured quality: scripts/exp_qat_tail.py,
    # BASELINE.md "QAT tail" section.
    quant_scales = None
    if tcfg.qat_tail.steps > 0:
        state, quant_scales = _qat_tail_finetune(
            generator, discriminator, state, loader, loss_cfg, tcfg,
            mesh=mesh, vgg_params=vgg_params, tracker=tracker,
        )
        if checkpoint_path is not None and quant_scales is not None:
            # the master/best checkpoints predate the fine-tune; persist
            # the QAT-adapted weights + scales alongside them so a crash
            # between here and the driver's final export loses nothing
            do_save(
                checkpoint_path.parent / "qat_tail.pth",
                epoch, {"qat_tail_steps": tcfg.qat_tail.steps,
                        "quant_scales": quant_scales},
            )
            if saver is not None:
                saver.join()

    if checkpoint_path is not None:
        # a completed run supersedes any preempted.pth it resumed from;
        # consume it so a later fresh run can't silently pick it up
        _remove_preempted(checkpoint_path.parent / "preempted.pth")

    total_time = time.time() - t_start
    if tracker is not None:
        final = {
            "training.total_time": total_time,
            "training.best_train_loss": best_train,
        }
        if val_loader is not None and val_g is not None:
            final["training.best_val_loss"] = best_val
            final["training.validation_improvement"] = best_val - val_g
        tracker.log_metrics(final)

    result = {
        "best_train_loss": best_train,
        "best_val_loss": best_val if val_loader is not None else None,
        "total_time": total_time,
        "final_epoch": epoch,
        "state": state,
    }
    if quant_scales is not None:
        result["quant_scales"] = quant_scales
    return result


def _qat_tail_finetune(
    generator, discriminator, state, loader, loss_cfg, tcfg,
    mesh=None, vgg_params=None, tracker=None,
):
    """Short quantization-aware fine-tune of the generator tail.

    1. Calibrate static int8 scales on training batches (frozen here
       and returned for deployment — serving must quantize at the
       scales the fine-tune saw).
    2. Fine-tune `tcfg.qat_tail.steps` steps at `tcfg.qat_tail.
       learning_rate` with dec1's output fake-quantized at the frozen
       scale and the final kernel per-channel (straight-through
       gradients, ops/quant.fake_quant_*): the forward computes exactly
       the numbers the deployed w8a8_resident_full tail produces, so
       the weights adapt to the int8 noise PTQ alone cannot absorb
       (-0.136 dB, BASELINE.md final-conv study).

    Returns (state, scales) — scales is the full calibrate_quant_scales
    dict (plain floats, JSON/pth-serializable), usable directly as
    ``PConvUNet(quant="w8a8", quant_scales=scales)``.
    """
    from ..ops.quant import calibrate_quant_scales

    steps = tcfg.qat_tail.steps
    lr = tcfg.qat_tail.learning_rate
    logger.info("QAT tail: calibrating int8 scales on training batches")
    calib_batches = []
    for batch in loader:
        img, msk = batch["image"], batch["mask"]
        calib_batches.append((img * msk, msk))
        if sum(b.shape[0] for b, _ in calib_batches) >= 16:
            break
    if not calib_batches:
        logger.warning("QAT tail: no training batches to calibrate on")
        return state, None
    scales = calibrate_quant_scales(
        generator, state.generator_variables(), calib_batches
    )
    scales = {k: v for k, v in scales.items()}  # plain dict of floats

    G_qat = generator.clone(
        qat_tail_scales={"dec1:out": scales["dec1:out"]}
    )
    raw_step = make_train_step(
        G_qat, discriminator, adam(lr), adam(lr), loss_cfg,
        jit_compile=mesh is None,
        loss_compute_dtype=getattr(generator, "compute_dtype", None),
    )
    if mesh is not None:
        from ..parallel.mesh import data_axis_size, shard_train_step

        data_size = data_axis_size(mesh)
        step_fn = shard_train_step(raw_step, mesh)
        tail_step_fn = shard_train_step(raw_step, mesh, shard_data=False)
    else:
        data_size = 1
        step_fn = raw_step
        tail_step_fn = raw_step
    # fresh small-lr optimizer state over the trained params (the main
    # run's Adam moments are tuned to the big lr and the un-quantized
    # objective; exp_qat_tail.py measured this protocol)
    state = state.replace(
        g_opt=adam(lr).init(state.g_params),
        d_opt=adam(lr).init(state.d_params),
    )
    t0 = time.time()
    it = 0
    metrics = {"g_loss": float("nan")}
    while it < steps:
        made_progress = False
        for batch in loader:
            if it >= steps:
                break
            made_progress = True
            n_tiles = next(
                v.shape[0] for v in batch.values()
                if isinstance(v, np.ndarray)
            )
            tail = mesh is not None and n_tiles % data_size != 0
            dev_batch = _to_device(batch, mesh, shard_data=not tail)
            fn = tail_step_fn if tail else step_fn
            state, metrics = fn(state, dev_batch, vgg_params)
            if tracker is not None and it % 50 == 0:
                tracker.log_metrics(
                    {"qat_tail.g_loss": float(metrics["g_loss"])}, step=it
                )
            it += 1
        if not made_progress:
            logger.warning("QAT tail: loader yielded no batches; stopping")
            break
    logger.info(
        "QAT tail: %d steps in %.1fs (g_loss=%.4f)",
        steps, time.time() - t0, float(metrics["g_loss"]),
    )
    return state, scales


def _remove_preempted(pth_path: Path) -> None:
    """Delete a consumed preempted checkpoint (.pth + .orbax sibling)."""
    import shutil

    import jax

    if jax.process_index() != 0:  # mirror _save's single-writer rule
        return
    try:
        if pth_path.exists():
            pth_path.unlink()
            logger.info("consumed preempted checkpoint %s", pth_path)
        orbax = pth_path.with_suffix(".orbax")
        if orbax.exists():
            shutil.rmtree(orbax)
    except OSError as e:  # pragma: no cover - fs race/permission
        logger.warning("could not remove %s: %s", pth_path, e)


def _save(path: Path, state, epoch, lr, config, extra):
    """Dual-format save: orbax native dir + reference-layout .pth.

    Multi-host runs write from process 0 only: the state is replicated,
    so every host would produce the same bytes — and race on a shared
    filesystem. Under that single-writer rule the orbax leg is SKIPPED:
    orbax's save is itself a collective (it barriers across the process
    group via sync_global_processes), so calling it from process 0
    alone deadlocks the pod at the first checkpoint. The reference-
    layout .pth is a pure host-side write of the fully-replicated state
    and is the canonical resume format (resolve_checkpoint), so
    multi-host runs lose nothing but the redundant second format."""
    import jax

    multihost = jax.process_count() > 1
    if jax.process_index() != 0:
        return
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        if path.suffix == ".pth":
            export_pth(
                path, state, epoch=epoch, lr=lr,
                config=getattr(config, "raw", {}), extra=extra,
            )
            if not multihost:
                save_native(path.with_suffix(".orbax"), state, extra)
        elif multihost:
            export_pth(
                path.with_suffix(".pth"), state, epoch=epoch, lr=lr,
                config=getattr(config, "raw", {}), extra=extra,
            )
        else:
            save_native(path, state, extra)
    except Exception as e:
        logger.error("checkpoint save failed for %s: %s", path, e)
