"""Torch `.pth` checkpoint interop.

The reference persists everything with `torch.save` state dicts
(train.py:318-330, main_pipeline.py:386-397). To let users switch
frameworks without retraining, this module converts between those
state dicts and our flax variable pytrees, in both directions:

  * generator keys:  `encN.input_conv.{weight,bias}`,
    `encN.bn.{weight,bias,running_mean,running_var}`, same for decN,
    `final.{weight,bias}`; `mask_conv.weight` is a frozen all-ones
    buffer we do not store (mvp_gan/src/models/pconv.py:11-16).
  * discriminator keys: `model.{0,2,5,8,11}.{weight,bias}` convs and
    `model.{3,6,9}.*` batch norms (discriminator.py:17-23).

Conv weights are transposed OIHW -> HWIO (NHWC/TPU layout).
Loading works without torch installed only for numpy-pickled files;
real `.pth` files require the baked-in CPU torch.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping

import numpy as np

logger = logging.getLogger(__name__)

GEN_BLOCKS = [f"enc{i}" for i in range(1, 8)] + [f"dec{i}" for i in range(7, 0, -1)]
# (torch Sequential index, flax name, has batch norm)
DISC_BLOCKS = [(0, "block0", False), (2, "block1", True), (5, "block2", True),
               (8, "block3", True), (11, "final", None)]


def _to_numpy(v: Any) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v.copy()
    try:  # torch tensor; copy so in-place torch updates can't alias us
        return v.detach().cpu().numpy().copy()
    except AttributeError:
        return np.asarray(v)


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(_to_numpy(w), (2, 3, 1, 0))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def torch_state_to_generator_vars(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Torch PConvUNet state dict -> flax {'params', 'batch_stats'}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for blk in GEN_BLOCKS:
        entry = {
            "kernel": _oihw_to_hwio(sd[f"{blk}.input_conv.weight"]),
            "bias": _to_numpy(sd[f"{blk}.input_conv.bias"]),
        }
        if f"{blk}.bn.weight" in sd:
            entry["bn"] = {
                "scale": _to_numpy(sd[f"{blk}.bn.weight"]),
                "bias": _to_numpy(sd[f"{blk}.bn.bias"]),
            }
            stats[blk] = {"bn": {
                "mean": _to_numpy(sd[f"{blk}.bn.running_mean"]),
                "var": _to_numpy(sd[f"{blk}.bn.running_var"]),
            }}
        params[blk] = entry
    params["final_kernel"] = _oihw_to_hwio(sd["final.weight"])
    params["final_bias"] = _to_numpy(sd["final.bias"])
    return {"params": params, "batch_stats": stats}


def generator_vars_to_torch_state(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """flax generator variables -> torch-key state dict (numpy values)."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for blk in GEN_BLOCKS:
        p = params[blk]
        sd[f"{blk}.input_conv.weight"] = _hwio_to_oihw(p["kernel"])
        sd[f"{blk}.input_conv.bias"] = np.asarray(p["bias"])
        # frozen all-ones mask conv, kept for reference load compatibility
        k = np.asarray(p["kernel"]).shape[0]
        sd[f"{blk}.mask_conv.weight"] = np.ones((1, 1, k, k), np.float32)
        if "bn" in p:
            sd[f"{blk}.bn.weight"] = np.asarray(p["bn"]["scale"])
            sd[f"{blk}.bn.bias"] = np.asarray(p["bn"]["bias"])
            st = stats.get(blk, {}).get("bn", {})
            sd[f"{blk}.bn.running_mean"] = np.asarray(
                st.get("mean", np.zeros_like(p["bn"]["scale"])))
            sd[f"{blk}.bn.running_var"] = np.asarray(
                st.get("var", np.ones_like(p["bn"]["scale"])))
            sd[f"{blk}.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    sd["final.weight"] = _hwio_to_oihw(params["final_kernel"])
    sd["final.bias"] = np.asarray(params["final_bias"])
    return sd


def torch_state_to_discriminator_vars(sd: Mapping[str, Any]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for idx, name, has_bn in DISC_BLOCKS:
        params[f"{name}_kernel"] = _oihw_to_hwio(sd[f"model.{idx}.weight"])
        params[f"{name}_bias"] = _to_numpy(sd[f"model.{idx}.bias"])
        if has_bn:
            b = idx + 1
            params[f"{name}_bn"] = {
                "scale": _to_numpy(sd[f"model.{b}.weight"]),
                "bias": _to_numpy(sd[f"model.{b}.bias"]),
            }
            stats[f"{name}_bn"] = {
                "mean": _to_numpy(sd[f"model.{b}.running_mean"]),
                "var": _to_numpy(sd[f"model.{b}.running_var"]),
            }
    return {"params": params, "batch_stats": stats}


def discriminator_vars_to_torch_state(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    params, stats = variables["params"], variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for idx, name, has_bn in DISC_BLOCKS:
        sd[f"model.{idx}.weight"] = _hwio_to_oihw(params[f"{name}_kernel"])
        sd[f"model.{idx}.bias"] = np.asarray(params[f"{name}_bias"])
        if has_bn:
            b = idx + 1
            bn = params[f"{name}_bn"]
            st = stats.get(f"{name}_bn", {})
            sd[f"model.{b}.weight"] = np.asarray(bn["scale"])
            sd[f"model.{b}.bias"] = np.asarray(bn["bias"])
            sd[f"model.{b}.running_mean"] = np.asarray(
                st.get("mean", np.zeros_like(bn["scale"])))
            sd[f"model.{b}.running_var"] = np.asarray(
                st.get("var", np.ones_like(bn["scale"])))
            sd[f"model.{b}.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


def load_pth(path) -> Any:
    """Load a torch .pth file to plain python/numpy structures."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return _detorch(obj)


def _detorch(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _detorch(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_detorch(v) for v in obj)
    try:
        return obj.detach().cpu().numpy()
    except AttributeError:
        return obj


def save_pth(path, obj: Any) -> None:
    """Save nested numpy structures as a torch .pth (tensors for arrays)."""
    import torch

    def entorch(o):
        if isinstance(o, dict):
            return {k: entorch(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(entorch(v) for v in o)
        if isinstance(o, np.ndarray):
            # copy: jax buffers are non-writable and from_numpy shares memory
            return torch.from_numpy(np.array(o, copy=True))
        if hasattr(o, "dtype") and hasattr(o, "shape"):  # jax array
            return torch.from_numpy(np.array(np.asarray(o), copy=True))
        return o

    torch.save(entorch(obj), path)
