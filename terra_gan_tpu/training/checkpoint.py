"""Checkpoint / resume (reference: SURVEY §5.4).

Native format: orbax PyTree checkpoints of the full GANTrainState
(both nets, both Adam states, BN stats, step) — atomic by
construction. Interop: export/import the reference's torch `.pth`
layout so users can switch frameworks mid-project:

  * model state dicts via utils.torch_compat (exact key set incl.
    frozen mask_conv buffers)
  * torch Adam optimizer state (state[idx] = {step, exp_avg,
    exp_avg_sq} keyed by parameter order) <-> optax ScaleByAdamState
    (count, mu, nu), so resuming preserves optimizer momenta in both
    directions
  * checkpoint dict keys mirror train.py:318-330 / main_pipeline.py:
    386-397: epoch, generator_state_dict, discriminator_state_dict,
    optimizer_G_state_dict, optimizer_D_state_dict, losses, config,
    processed_grids, metrics

Load priority chain (main_pipeline.py:227-245): explicit --input_model
-> master_checkpoint -> _BASELINE_MODEL/BASELINE_MODEL.pth -> fresh
init; raw generator-only state dicts (legacy) are accepted everywhere.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..utils.torch_compat import (
    discriminator_vars_to_torch_state,
    generator_vars_to_torch_state,
    load_pth,
    save_pth,
    torch_state_to_discriminator_vars,
    torch_state_to_generator_vars,
)
from .state import GANTrainState

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# orbax native checkpoints
# ---------------------------------------------------------------------------

def save_native(path: str | Path, state: GANTrainState, extra: Optional[Dict] = None):
    """Atomic orbax save of the full training state; JSON-able extras go
    to a <path>.meta.json sidecar (orbax restore needs an exact tree
    structure, so free-form metadata lives outside the pytree)."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    meta = path.parent / (path.name + ".meta.json")
    meta.write_text(json.dumps(extra or {}, default=str))


def restore_native(path: str | Path, template: GANTrainState):
    """Restore a native checkpoint into the template's structure."""
    import json

    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path, item=template)
    meta = path.parent / (path.name + ".meta.json")
    extra = json.loads(meta.read_text()) if meta.exists() else {}
    return state, extra


# ---------------------------------------------------------------------------
# torch .pth interop
# ---------------------------------------------------------------------------

# torch parameter ordering for PConvUNet: per block input_conv.{w,b},
# mask_conv.w (frozen, no optimizer state), bn.{w,b}; then final.{w,b}.
_GEN_BLOCKS = [f"enc{i}" for i in range(1, 8)] + [
    f"dec{i}" for i in range(7, 0, -1)
]


def _gen_param_entries() -> List[Tuple[str, Optional[Tuple[str, str]]]]:
    """(torch param name, (flax block, leaf) or None-if-frozen), in
    torch .parameters() order."""
    entries: List[Tuple[str, Optional[Tuple[str, str]]]] = []
    for blk in _GEN_BLOCKS:
        entries.append((f"{blk}.input_conv.weight", (blk, "kernel")))
        entries.append((f"{blk}.input_conv.bias", (blk, "bias")))
        entries.append((f"{blk}.mask_conv.weight", None))  # frozen
        entries.append((f"{blk}.bn.weight", (blk, "bn.scale")))
        entries.append((f"{blk}.bn.bias", (blk, "bn.bias")))
    entries.append(("final.weight", ("final_kernel", "")))
    entries.append(("final.bias", ("final_bias", "")))
    return entries


def _disc_param_entries() -> List[Tuple[str, Tuple[str, str]]]:
    entries = []
    blocks = [(0, "block0", False), (2, "block1", True), (5, "block2", True),
              (8, "block3", True), (11, "final", None)]
    for idx, name, has_bn in blocks:
        entries.append((f"model.{idx}.weight", (f"{name}_kernel", "")))
        entries.append((f"model.{idx}.bias", (f"{name}_bias", "")))
        if has_bn:
            entries.append((f"model.{idx+1}.weight", (f"{name}_bn", "scale")))
            entries.append((f"model.{idx+1}.bias", (f"{name}_bn", "bias")))
    return entries


def _get_leaf(params: Dict, spec: Tuple[str, str]):
    top, leaf = spec
    node = params[top]
    if not leaf:
        return node
    for part in leaf.split("."):
        node = node[part]
    return node


def _set_leaf(params: Dict, spec: Tuple[str, str], value):
    top, leaf = spec
    if not leaf:
        params[top] = value
        return
    node = params.setdefault(top, {})
    parts = leaf.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    node[parts[-1]] = value


def _oihw(arr: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(arr), (3, 2, 0, 1)) if arr.ndim == 4 else np.asarray(arr)


def _hwio(arr: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(arr), (2, 3, 1, 0)) if np.asarray(arr).ndim == 4 else np.asarray(arr)


def _find_adam(opt_state) -> Any:
    """Locate the ScaleByAdamState (count/mu/nu) inside an optax state."""
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_adam(s)
            if found is not None:
                return found
    return None


def adam_state_to_torch(
    opt_state, params: Dict, entries, lr: float
) -> Dict:
    """optax adam moments -> torch.optim.Adam state dict layout."""
    adam = _find_adam(opt_state)
    state: Dict[int, Dict] = {}
    trainable_idx: List[int] = []
    step = int(np.asarray(adam.count)) if adam is not None else 0
    for i, (tname, spec) in enumerate(entries):
        if spec is None:
            continue
        trainable_idx.append(i)
        if adam is None or step == 0:
            continue
        mu = _oihw(np.asarray(_get_leaf(adam.mu, spec)))
        nu = _oihw(np.asarray(_get_leaf(adam.nu, spec)))
        state[i] = {"step": step, "exp_avg": mu, "exp_avg_sq": nu}
    return {
        "state": state,
        "param_groups": [
            {
                "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False, "differentiable": False,
                "fused": None, "params": list(range(len(entries))),
            }
        ],
    }


def torch_adam_to_optax(torch_opt: Dict, template_opt_state, entries):
    """torch Adam state dict -> optax state matching template structure."""
    adam = _find_adam(template_opt_state)
    if adam is None:
        return template_opt_state
    state = torch_opt.get("state", {})
    if not state:
        return template_opt_state
    mu = jax.tree.map(np.array, jax.tree.map(np.asarray, adam.mu))
    nu = jax.tree.map(np.array, jax.tree.map(np.asarray, adam.nu))
    step = 0
    for i, (tname, spec) in enumerate(entries):
        if spec is None:
            continue
        # torch state keys may be int or str
        s = state.get(i, state.get(str(i)))
        if s is None:
            continue
        step = int(np.asarray(s["step"]))
        _set_leaf(mu, spec, _hwio(np.asarray(s["exp_avg"])))
        _set_leaf(nu, spec, _hwio(np.asarray(s["exp_avg_sq"])))

    new_adam = adam._replace(
        count=np.asarray(step, np.int32),
        mu=jax.tree.map(np.asarray, mu),
        nu=jax.tree.map(np.asarray, nu),
    )

    def swap(node):
        if node is adam:
            return new_adam
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(swap(x) for x in node)
        if isinstance(node, tuple):
            return node
        return node

    return swap(template_opt_state)


def export_pth(
    path: str | Path,
    state: GANTrainState,
    epoch: int = 0,
    lr: float = 2e-4,
    config: Optional[Dict] = None,
    extra: Optional[Dict] = None,
) -> None:
    """Write a reference-layout master checkpoint .pth."""
    ckpt: Dict[str, Any] = {
        "epoch": epoch,
        "generator_state_dict": generator_vars_to_torch_state(
            {"params": jax.tree.map(np.asarray, state.g_params),
             "batch_stats": jax.tree.map(np.asarray, state.g_stats)}
        ),
        "discriminator_state_dict": discriminator_vars_to_torch_state(
            {"params": jax.tree.map(np.asarray, state.d_params),
             "batch_stats": jax.tree.map(np.asarray, state.d_stats)}
        ),
        "optimizer_G_state_dict": adam_state_to_torch(
            state.g_opt, state.g_params, _gen_param_entries(), lr
        ),
        "optimizer_D_state_dict": adam_state_to_torch(
            state.d_opt, state.d_params, _disc_param_entries(), lr
        ),
        "config": config or {},
    }
    if extra:
        ckpt.update(extra)
    tmp = Path(str(path) + ".tmp")
    save_pth(tmp, ckpt)
    tmp.replace(path)


def _adam_step_count(opt_state) -> Optional[int]:
    """The ScaleByAdamState count inside an optax state tree, if any."""
    import optax

    is_adam = lambda x: isinstance(x, optax.ScaleByAdamState)  # noqa: E731
    for leaf in jax.tree.leaves(opt_state, is_leaf=is_adam):
        if is_adam(leaf):
            return int(np.asarray(leaf.count))
    return None


def import_pth(path: str | Path, template: GANTrainState) -> Tuple[GANTrainState, Dict]:
    """Load a reference .pth (master dict or raw G state dict) into state."""
    obj = load_pth(path)
    extra: Dict[str, Any] = {}
    if isinstance(obj, dict) and "generator_state_dict" in obj:
        gvars = torch_state_to_generator_vars(obj["generator_state_dict"])
        state = template.replace(
            g_params=gvars["params"], g_stats=gvars["batch_stats"]
        )
        if "discriminator_state_dict" in obj:
            dvars = torch_state_to_discriminator_vars(
                obj["discriminator_state_dict"]
            )
            state = state.replace(
                d_params=dvars["params"], d_stats=dvars["batch_stats"]
            )
        if "optimizer_G_state_dict" in obj:
            state = state.replace(
                g_opt=torch_adam_to_optax(
                    obj["optimizer_G_state_dict"], template.g_opt,
                    _gen_param_entries(),
                )
            )
        if "optimizer_D_state_dict" in obj:
            state = state.replace(
                d_opt=torch_adam_to_optax(
                    obj["optimizer_D_state_dict"], template.d_opt,
                    _disc_param_entries(),
                )
            )
        # the reference layout carries no global step counter; the G
        # Adam count is the number of optimizer steps taken, so resume
        # continues the counter instead of resetting it (matters for
        # preemption resume bookkeeping and any step-based schedules)
        count = _adam_step_count(state.g_opt)
        if count is not None:
            import jax.numpy as jnp

            state = state.replace(step=jnp.asarray(count, jnp.int32))
        extra = {
            k: v for k, v in obj.items() if not k.endswith("_state_dict")
        }
    else:
        # legacy raw generator state dict (main_pipeline.py:252-265)
        gvars = torch_state_to_generator_vars(obj)
        state = template.replace(
            g_params=gvars["params"], g_stats=gvars["batch_stats"]
        )
    return state, extra


def resolve_checkpoint(
    input_model: Optional[str | Path],
    master_checkpoint: Optional[str | Path],
    baseline_model: Optional[str | Path] = "_BASELINE_MODEL/BASELINE_MODEL.pth",
    preempted: Optional[str | Path] = None,
) -> Optional[Path]:
    """Reference load-priority chain (main_pipeline.py:227-245), with one
    addition the reference lacks: a ``preempted`` candidate that OUTRANKS
    every other leg. A preempted.pth only exists if the previous run was
    interrupted mid-training (training/loop.py writes it on SIGTERM and
    consumes it on completion), so "re-run the same command to resume"
    continues from the latest interrupted state even when the original
    command named an --input_model warm start."""
    if preempted and Path(preempted).exists():
        logger.warning(
            "resuming from preempted checkpoint %s (latest interrupted "
            "state; outranks input_model/master until consumed by a "
            "completed run)", preempted,
        )
        return Path(preempted)
    for candidate in (input_model, master_checkpoint, baseline_model):
        if candidate and Path(candidate).exists():
            logger.info("using checkpoint: %s", candidate)
            return Path(candidate)
    logger.info("no checkpoint found; fresh initialization")
    return None
