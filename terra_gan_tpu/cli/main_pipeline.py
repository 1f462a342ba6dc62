"""Pipeline driver CLI (reference: main_pipeline.py).

Same modes and flags:
    python -m terra_gan_tpu.cli.main_pipeline
        --mode {train,evaluate,human_guided_train}
        [--input_model PATH] [--grid GRID] [--debug] [--config PATH]

Behavior contracts preserved (with the TPU-native compute path):
  * train (main_pipeline.py:165-443): iterate zips in input_zip_folder;
    ONE shared "master" generator+discriminator across all parents;
    model-load priority user -> master_checkpoint.pth ->
    _BASELINE_MODEL/BASELINE_MODEL.pth -> fresh init; per-parent
    ingest -> checkerboard splits -> train(); final master checkpoint
    + timestamped copy + per-grid metrics JSON.
  * evaluate (main_pipeline.py:446-556): load master generator; per
    parent grid inpaint every test tile and colorize. The reference
    loops tiles at batch 1 — here the whole split is one mesh-sharded
    batch (inpaint_directory).
  * human_guided_train (main_pipeline.py:559-790): fetch + match
    annotations, DirectMatchDataset validation, HumanGuidedTrainer,
    save master_model_human_guided_<ts>.pth, optional portal cleanup.
  * env switches: EXPERIMENT_MODE suppresses interactive prompts
    (main_pipeline.py:602), DOCKER_ENV rebases data paths
    (main_pipeline.py:33-38).
  * logging to console + logs/pipeline.log (main_pipeline.py:59-71).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

logger = logging.getLogger("terra_gan_tpu.pipeline")


def setup_logging(debug: bool = False) -> None:
    Path("logs").mkdir(exist_ok=True)
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler("logs/pipeline.log"),
        ],
        force=True,
    )
    # third-party checkpoint/compiler libraries are very chatty at INFO
    for noisy in ("orbax", "absl", "jax._src", "etils"):
        logging.getLogger(noisy).setLevel(
            logging.DEBUG if debug else logging.WARNING
        )


def experiment_mode() -> bool:
    return os.environ.get("EXPERIMENT_MODE", "").lower() in ("1", "true", "yes")


def _load_config(config_path: str):
    from ..config import Config

    cfg = Config.load(config_path) if Path(config_path).exists() else None
    if cfg is None:
        logger.warning("config %s not found; using defaults", config_path)
        from ..config import Config as C

        cfg = C()
    if os.environ.get("DOCKER_ENV"):
        base = Path("/app")
        for field in ("raw_dir", "processed_dir", "output_dir",
                      "input_zip_folder", "models_dir"):
            setattr(cfg.data, field, str(base / getattr(cfg.data, field)))
    return cfg


def _master_checkpoint_path(cfg) -> Path:
    return Path(cfg.evaluation.checkpoint_dir) / "master_checkpoint.pth"


def _image_size(cfg) -> int:
    """Model tile size; 512 in the reference (train.py:67-70). The
    data.image_size config key exists for small-scale tests/dev runs."""
    return int((cfg.raw.get("data") or {}).get("image_size", 512))


def _build_models(cfg=None, remat: bool = False):
    """Models per config: training.compute_dtype selects bf16 perf mode
    (fp32 default keeps strict reference parity); remat trades FLOPs
    for HBM in large-batch training (training.remat = blanket,
    training.remat_stages = selective — only the named stages
    recompute, keeping deep-stage activations stored)."""
    import jax.numpy as jnp

    from ..models import Discriminator, PConvUNet

    from ..ops.pallas.pconv_kernel import pallas_enabled

    dtype_name = (
        (cfg.raw.get("training") or {}).get("compute_dtype") if cfg else None
    )
    cd = jnp.bfloat16 if str(dtype_name).lower() in (
        "bf16", "bfloat16"
    ) else None
    remat_stages = (
        frozenset(cfg.training.remat_stages)
        if cfg is not None and cfg.training.remat_stages else None
    )
    return (
        PConvUNet(compute_dtype=cd, precision=None, remat=remat,
                  remat_stages=remat_stages,
                  use_pallas=pallas_enabled()),
        Discriminator(compute_dtype=cd, precision=None),
    )


def _load_vgg(cfg):
    """Perceptual-loss weights: npz/pth path from config, else None.

    Returns (params, provenance) where provenance records WHICH weights
    the perceptual term ran on — "pretrained:<path>", "random:seed0" or
    "none" — so every run and exported checkpoint is auditable for the
    known numerical divergence from the reference objective (the
    reference uses torchvision IMAGENET1K_V1 features, unobtainable in
    this environment; reference mvp_gan/src/utils/losses.py:31).
    """
    from ..models import vgg as vgg_mod

    path = (cfg.raw.get("training", {}) or {}).get("vgg_weights_path")
    if path and Path(path).exists():
        return vgg_mod.load_weights(path), f"pretrained:{path}"
    if cfg.training.loss_weights.perceptual > 0:
        logger.warning(
            "no pretrained VGG weights configured "
            "(training.vgg_weights_path); using fixed-seed random VGG "
            "features for the perceptual term"
        )
        return vgg_mod.random_weights(0), "random:seed0"
    return None, "none"


def _init_master_state(cfg, input_model: Optional[str], image_size=512):
    import jax

    from ..training import GANTrainState, adam, import_pth, resolve_checkpoint

    G, D = _build_models(cfg, remat=cfg.training.remat)
    lr = cfg.training.initial.learning_rate
    state = GANTrainState.create(
        G, D, jax.random.PRNGKey(0),
        sample_shape=(1, image_size, image_size, 1),
        g_tx=adam(lr), d_tx=adam(lr),
    )
    master = _master_checkpoint_path(cfg)
    ckpt = resolve_checkpoint(
        input_model, master,
        "_BASELINE_MODEL/BASELINE_MODEL.pth",
        preempted=master.parent / "preempted.pth",
    )
    resume = None
    if ckpt is not None:
        try:
            state, extra = import_pth(ckpt, state)
            logger.info("loaded checkpoint %s (epoch %s)", ckpt, extra.get("epoch"))
            if extra.get("preempted"):
                # a preempted.pth carries the interrupted epoch, the
                # best losses so far, and the parent grid it belongs
                # to — run_training_mode fast-forwards that parent's
                # train() so each scheduled epoch runs exactly once
                # across the preemption (training/loop.py:train)
                resume = extra
        except Exception as e:
            logger.error("checkpoint load failed (%s); fresh init", e)
    return G, D, state, resume


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

def run_training_mode(
    cfg, input_model: Optional[str] = None, tracker=None, mesh=None
) -> bool:
    from ..data import GeographicalSplitter, PathManager, ingest_zip
    from ..data.visualization import create_split_visualization
    from ..training import TrainingPreempted, export_pth, train

    zip_folder = Path(cfg.data.input_zip_folder)
    zips = sorted(zip_folder.glob("*.zip")) if zip_folder.exists() else []
    if not zips:
        logger.error("no input zips in %s", zip_folder)
        return False

    pm = PathManager(cfg)
    G, D, state, resume = _init_master_state(cfg, input_model)
    from ..parallel import broadcast_from_primary, is_multiprocess

    if is_multiprocess():
        # single-writer rule's other half: only process 0 is guaranteed
        # to find the master/preempted checkpoint on per-host
        # filesystems — broadcast its loaded state so every host starts
        # from the SAME weights (else psums silently mix gradients
        # computed against different parameters)
        state = broadcast_from_primary(state)
        logger.info("multi-host: state broadcast from process 0")
    # NOTE r2 default flip: training previously always rematerialized;
    # remat now follows training.remat (default off — measured +42%
    # throughput at the production batch, BASELINE.md). Surfaced here so
    # an OOM on configs sized beyond the batch-16 512^2 envelope points
    # at the remedy.
    logger.info(
        "activation remat: %s (if training OOMs, set training.remat: "
        "true, training.remat_stages: [stages], or training.vgg_remat: "
        "true in config.yaml)",
        "on" if cfg.training.remat
        else f"selective {sorted(cfg.training.remat_stages)}"
        if cfg.training.remat_stages else "off",
    )
    vgg, vgg_provenance = _load_vgg(cfg)
    if tracker is not None:
        # run-level provenance tag: which VGG weights the perceptual
        # term ran on (auditable vs the reference's pretrained VGG)
        try:
            tracker.log_params({"vgg_weights": vgg_provenance})
        except Exception as e:
            logger.warning("could not log vgg provenance: %s", e)
    successful: List[str] = []
    failed: List[str] = []
    metrics: Dict[str, Any] = {}
    quant_scales: Optional[Dict[str, Any]] = None

    for zip_path in zips:
        try:
            parent = pm.parent_from_zip(zip_path)
        except ValueError as e:
            logger.error("%s", e)
            failed.append(zip_path.name)
            continue
        logger.info("=== processing parent grid %s ===", parent)
        try:
            splitter = GeographicalSplitter(
                parent, Path(cfg.data.processed_dir)
            )
            if not ingest_zip(zip_path, parent, cfg, splitter=splitter):
                failed.append(parent)
                continue
            splitter.generate_splits()
            splitter.apply_splits()
            splitter.save_metadata()
            try:
                create_split_visualization(
                    Path(cfg.data.processed_dir) / parent / "metadata",
                    parent_grid=parent,
                )
            except Exception as e:
                logger.warning("split visualization failed: %s", e)

            proc = Path(cfg.data.processed_dir) / parent
            resume_kwargs = {}
            if resume is not None and resume.get("parent") in (None, parent):
                # fast-forward only the parent grid whose schedule the
                # preemption interrupted (matched by the tag preempt_extra
                # stamps into preempted.pth); other parents run their
                # full schedule as always
                resume_kwargs = {
                    "start_epoch": int(resume.get("epoch", 0)),
                    "resume_best": resume,
                }
                resume = None
            result = train(
                proc / "train" / "images", proc / "train" / "masks",
                G, D, state=state,
                checkpoint_path=_master_checkpoint_path(cfg),
                config=cfg, tracker=tracker,
                val_img_dir=proc / "val" / "images",
                val_mask_dir=proc / "val" / "masks",
                vgg_params=vgg, mesh=mesh,
                image_size=_image_size(cfg),
                preempt_extra={"parent": parent},
                **resume_kwargs,
            )
            state = result.pop("state")
            # frozen int8 calibration scales from the QAT tail
            # (training.qat_tail): ride in the master checkpoint so
            # evaluate/serving quantize at EXACTLY the scales the
            # fine-tune adapted the weights to
            quant_scales = result.pop("quant_scales", quant_scales)
            metrics[parent] = result
            successful.append(parent)
        except TrainingPreempted:
            # not a per-parent failure: the loop already checkpointed;
            # propagate so main() exits 75 (resume = same command)
            raise
        except Exception as e:
            from ..parallel import is_multiprocess

            if is_multiprocess():
                # multi-host lockstep: this host CANNOT move on to the
                # next grid — the peers are still dispatching grid
                # collectives for this one, and a fresh train() here
                # would pair this host's psums against theirs (silent
                # gradient mixing or a wedged pod). Abort the whole
                # process loudly instead; resume via the checkpoint
                # chain restarts the group in lockstep.
                logger.error(
                    "parent %s failed under multi-host training — "
                    "aborting the process to keep the pod in lockstep",
                    parent,
                )
                raise
            logger.exception("parent %s failed: %s", parent, e)
            failed.append(parent)

    # final master checkpoint + timestamped copy (main_pipeline.py:386-412)
    from ..parallel import is_primary_process

    if not is_primary_process():
        # multi-host: the state is replicated — process 0 owns all
        # checkpoint writes (same single-writer rule as training/loop)
        logger.info(
            "training done: %d grids ok, %d failed (checkpoints "
            "written by process 0)", len(successful), len(failed),
        )
        return bool(successful)
    ckpt_path = _master_checkpoint_path(cfg)
    ckpt_path.parent.mkdir(parents=True, exist_ok=True)
    export_pth(
        ckpt_path, state,
        epoch=max(
            (m.get("final_epoch", 0) for m in metrics.values()), default=0
        ),
        lr=cfg.training.initial.learning_rate,
        config=cfg.raw,
        extra={
            "processed_grids": successful,
            "metrics": metrics,
            "vgg_weights_provenance": vgg_provenance,
            **({"quant_scales": quant_scales} if quant_scales else {}),
        },
    )
    stamp = time.strftime("%Y%m%d_%H%M%S")
    import shutil

    shutil.copy2(ckpt_path, ckpt_path.parent / f"master_checkpoint_{stamp}.pth")
    with open(ckpt_path.parent / f"training_metrics_{stamp}.json", "w") as f:
        json.dump(
            {"successful": successful, "failed": failed, "metrics": metrics},
            f, indent=2, default=str,
        )
    logger.info(
        "training done: %d grids ok, %d failed", len(successful), len(failed)
    )
    return bool(successful)


# ---------------------------------------------------------------------------
# evaluate
# ---------------------------------------------------------------------------

def run_evaluation_mode(
    cfg, input_model: Optional[str] = None, target_grid: Optional[str] = None,
    tracker=None, mesh=None,
) -> bool:
    from ..data import PathManager, is_valid_parent_grid
    from ..data.visualization import DSMColorizer
    from ..evaluation.inference import (
        inpaint_directory,
        load_checkpoint_quant_scales,
        load_generator_variables,
    )

    pm = PathManager(cfg)
    processed = Path(cfg.data.processed_dir)
    model_path = Path(input_model) if input_model else _master_checkpoint_path(cfg)
    if not model_path.exists():
        logger.error("no model for evaluation: %s", model_path)
        return False

    if target_grid and is_valid_parent_grid(target_grid):
        if not (processed / target_grid).is_dir():
            logger.error("grid %s not in processed data", target_grid)
            return False
        parents = [target_grid]
    else:
        parents = sorted(
            d.name for d in processed.glob("[A-Z][A-Z]*")
            if d.is_dir() and is_valid_parent_grid(d.name)
        )
    if not parents:
        logger.error("no processed parent grids found")
        return False

    from ..parallel import is_multiprocess, process_shard

    multihost = is_multiprocess()
    if multihost:
        # inference is collective-free: each host takes a disjoint
        # share of the grids and runs over its LOCAL devices (the
        # BatchedInpainter enforces the local mesh)
        import jax

        parents = process_shard(parents, equalize=False)
        if not parents:
            # this host's round-robin share is empty: done (skip the
            # model load entirely)
            logger.info("multi-host evaluate: no grids for this host")
            return True
        if mesh is not None:
            # rebuild the REQUESTED (data, spatial) geometry per host:
            # fit it to the local devices, preserving the spatial
            # factor when the global mesh is larger than one host
            # (parallel/mesh.py local_mesh_like)
            from ..parallel import local_mesh_like

            mesh = local_mesh_like(mesh, jax.local_devices())
            logger.info(
                "multi-host evaluate: --mesh rebuilt on local devices "
                "(data=%d spatial=%d)",
                mesh.shape["data"], mesh.shape["spatial"],
            )
        logger.info(
            "multi-host evaluate: %d grid(s) on this host", len(parents)
        )

    G, _ = _build_models(cfg)
    variables = load_generator_variables(model_path)
    quant_scales = None
    if cfg.evaluation.quant is not None:
        # QAT-tail checkpoints carry frozen calibration scales; deploy
        # at those exact scales instead of self-calibrating (the
        # fine-tuned weights are adapted to them)
        quant_scales = load_checkpoint_quant_scales(model_path)
        if quant_scales is not None:
            logger.info(
                "quant=%s using the checkpoint's frozen QAT scales",
                cfg.evaluation.quant,
            )
        elif cfg.evaluation.quant == "w8a8_resident_full":
            logger.warning(
                "quant=w8a8_resident_full on a checkpoint without QAT "
                "scales: self-calibrating; expect ~0.14 dB hole-PSNR "
                "loss (train with training.qat_tail to recover it)"
            )
    total = 0
    for parent in parents:
        paths = pm.create_parent_structure(parent)
        test_images = processed / parent / "test" / "images"
        test_masks = processed / parent / "test" / "masks"
        if not (test_images.exists() and test_masks.exists()):
            logger.warning("no test split for %s; skipping", parent)
            continue
        outs = inpaint_directory(
            G, variables, test_images, test_masks,
            paths["output_inpainted"], mesh=mesh,
            model_size=_image_size(cfg),
            quant=cfg.evaluation.quant,
            quant_scales=quant_scales,
        )
        if outs:
            DSMColorizer(
                paths["output_inpainted"], paths["output_colored"]
            ).recolor_all()
        logger.info("%s: %d tiles inpainted + colorized", parent, len(outs))
        total += len(outs)
    return total > 0


# ---------------------------------------------------------------------------
# human-guided train
# ---------------------------------------------------------------------------

def run_human_guided_training_mode(
    cfg, input_model: Optional[str] = None, target_grid: Optional[str] = None,
    tracker=None,
) -> bool:
    import jax

    from ..data.dataset import DirectMatchDataset
    from ..evaluation.inference import load_generator_variables
    from ..portal import (
        PortalClient,
        fetch_annotations_for_grid,
        match_human_and_system_masks,
        validate_dataset,
    )
    from ..training import HumanGuidedTrainer
    from ..utils.torch_compat import save_pth

    ckpt_dir = Path(cfg.evaluation.checkpoint_dir) / "human_guided"
    hg_preempted = ckpt_dir / "preempted.pth"
    # source_model records the TRUE lineage (the model the fine-tune
    # originally started from) even across a preemption resume — the
    # preempted.pth is consumed on completion, so its path would be a
    # dangling provenance reference
    source_model = (
        Path(input_model) if input_model else _master_checkpoint_path(cfg)
    )
    resumed_from_preemption = hg_preempted.exists()
    if resumed_from_preemption:
        # a previous HG run was interrupted mid-fine-tune: resume from
        # its latest weights, not the pre-HG source model — otherwise
        # "re-run the same command" would silently discard the completed
        # HG epochs (the file is consumed after a successful run)
        logger.warning(
            "resuming human-guided training from preempted checkpoint %s",
            hg_preempted,
        )
        model_path = hg_preempted
    else:
        model_path = source_model
    if not model_path.exists():
        logger.error("no model for human-guided training: %s", model_path)
        return False

    # resolve grid square (args -> EXPERIMENT_MODE zip scan -> prompt)
    grid = target_grid
    if grid is None and experiment_mode():
        zips = sorted(Path(cfg.data.input_zip_folder).glob("*.zip"))
        if zips:
            grid = zips[0].stem.upper()
    if grid is None:
        grid = input("Enter grid square for human-guided training: ").strip().upper()
    if not grid:
        logger.error("no grid square specified")
        return False

    # fetch annotations from the portal when configured
    if cfg.portal.base_url:
        try:
            client = PortalClient(cfg.portal.base_url, cfg.portal.api_key)
            fetch_annotations_for_grid(grid, client, cfg)
        except Exception as e:
            logger.warning("portal fetch failed (%s); using local files", e)

    pairs = match_human_and_system_masks(grid, cfg)
    if not pairs:
        logger.error("no matched annotation pairs for %s", grid)
        return False
    dataset = DirectMatchDataset(pairs, size=_image_size(cfg))
    if not validate_dataset(dataset):
        return False

    from ..models import PConvUNet

    G = PConvUNet(precision=None)
    variables = load_generator_variables(model_path)
    trainer = HumanGuidedTrainer(cfg, tracker=tracker)
    vgg, vgg_provenance = _load_vgg(cfg)
    if tracker is not None:
        try:
            tracker.log_params({"vgg_weights": vgg_provenance})
        except Exception as e:
            logger.warning("could not log vgg provenance: %s", e)
    result = trainer.train(
        G, variables, dataset,
        checkpoint_dir=ckpt_dir, vgg_params=vgg,
    )

    # save generator-only master with HG provenance (main_pipeline.py:705-737)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    out_vars = result["variables"]
    from ..utils.torch_compat import generator_vars_to_torch_state
    import numpy as np

    ckpt = {
        "generator_state_dict": generator_vars_to_torch_state(
            jax.tree.map(np.asarray, out_vars)
        ),
        "human_guided": True,
        "source_model": str(source_model),
        "resumed_from_preemption": resumed_from_preemption,
        "grid_square": grid,
        "best_loss": result["best_loss"],
        "config": cfg.raw,
        "vgg_weights_provenance": vgg_provenance,
    }
    master_dir = _master_checkpoint_path(cfg).parent
    master_dir.mkdir(parents=True, exist_ok=True)
    save_pth(master_dir / f"master_model_human_guided_{stamp}.pth", ckpt)
    save_pth(master_dir / "master_checkpoint.pth", ckpt)
    # (the trainer consumed its preempted.pth on successful completion)
    logger.info("human-guided training complete: best_loss=%s", result["best_loss"])

    # optional portal cleanup (main_pipeline.py:751-790)
    if cfg.portal.base_url and experiment_mode():
        try:
            client = PortalClient(cfg.portal.base_url, cfg.portal.api_key)
            names = [Path(p["human_mask_path"]).name for p in pairs]
            client.delete_processed_annotations(grid, names, confirm=True)
        except Exception as e:
            logger.warning("portal cleanup failed: %s", e)
    return True


# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="TERRA-GAN TPU pipeline driver"
    )
    parser.add_argument(
        "--mode", required=True,
        choices=["train", "evaluate", "human_guided_train"],
    )
    parser.add_argument("--input_model", default=None)
    parser.add_argument("--grid", default=None)
    parser.add_argument("--config", default="config.yaml")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument(
        "--no-tracking", action="store_true",
        help="disable experiment tracking for this run",
    )
    parser.add_argument(
        "--mesh", default=None, metavar="DATAxSPATIAL",
        help="device mesh: e.g. 8 or 4x2 (data x spatial), or 'auto' to "
        "use all local devices with the HBM-based spatial heuristic "
        "(parallel.mesh.auto_spatial); default: no mesh",
    )
    args = parser.parse_args(argv)

    setup_logging(args.debug)
    try:
        from ..utils.jax_setup import enable_persistent_cache

        enable_persistent_cache()
    except Exception as e:
        logger.debug("persistent compile cache unavailable: %s", e)
    cfg = _load_config(args.config)

    # multi-host pods: join the process group BEFORE any device use when
    # the coordinator env vars are set (no-op otherwise). `--mesh auto`
    # then spans the GLOBAL device list; see parallel/distributed.py
    # for the per-host data recipe.
    from ..parallel import initialize_from_env

    initialize_from_env()

    mesh = None
    if args.mesh:
        from ..parallel import parse_mesh_arg

        size = _image_size(cfg)  # data.image_size, 512 default
        mesh = parse_mesh_arg(
            args.mesh, height=size, width=size,
            training=args.mode != "evaluate",
        )
        logger.info(
            "device mesh: data=%d spatial=%d",
            mesh.shape["data"], mesh.shape["spatial"],
        )

    tracker = None
    from ..parallel import is_primary_process

    if (
        not args.no_tracking
        and cfg.experiment_tracking.enabled
        and is_primary_process()  # one tracked run per pod, not per host
    ):
        from ..tracking import ExperimentTracker

        tracker = ExperimentTracker(cfg)
        tracker.start_run(
            f"{args.mode}_{time.strftime('%Y%m%d_%H%M%S')}",
            params={"mode": args.mode, **(cfg.raw.get("training") or {})},
        )

    from ..training import TrainingPreempted  # lazy: pulls in jax

    try:
        if args.mode == "train":
            ok = run_training_mode(cfg, args.input_model, tracker, mesh=mesh)
        elif args.mode == "evaluate":
            ok = run_evaluation_mode(
                cfg, args.input_model, args.grid, tracker, mesh=mesh
            )
        elif not is_primary_process():
            # HG fine-tune is a small single-host workload (annotation
            # batches); on a pod only process 0 runs it — duplicating
            # it per host would double-write the master on shared FS
            logger.info(
                "human-guided training runs on process 0 only; idling"
            )
            ok = True
        else:
            ok = run_human_guided_training_mode(
                cfg, args.input_model, args.grid, tracker
            )
    except TrainingPreempted as e:
        # SIGTERM (pod preemption) or an injected drill: the training
        # loop saved the latest state to a preempted.pth (never over the
        # best-model master) before surfacing. Exit 75 (EX_TEMPFAIL) —
        # re-running the same command resumes from it (preempted.pth
        # outranks the rest of the load chain until consumed).
        logger.warning(
            "run preempted at epoch %s; latest state saved to %s — "
            "re-run the same command to resume (exit 75)",
            e.epoch, e.checkpoint,
        )
        return 75
    finally:
        if tracker is not None:
            tracker.end_run()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
