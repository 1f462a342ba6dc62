"""Inpainting loss stack (reference: mvp_gan/src/utils/losses.py).

Pure jnp functions (NHWC) designed to fuse under jit, reproducing the
reference's numerics exactly:

  * InpaintingLoss = L1(full image)
      + perceptual_weight * L1(VGG16 features[:16] of input vs target)
      + tv_weight * TV(input * hole_mask)
      + boundary_weight * boundary(input, target, mask)
    (losses.py:58-116)
  * TV uses the reference's own formula — sum of squared neighbour
    diffs, each normalized by its element count, x2, / batch
    (losses.py:118-127).
  * BoundaryAwareLoss.forward actually uses a fixed 3x3 dilate/erode
    (NOT the boundary_width=10 ctor arg, which only feeds the dead
    Sobel path) and an area-normalized L1 on the boundary band, with a
    hard zero when the band is empty (losses.py:403-416). We keep that
    exact behavior, expressed with lax.reduce_window + jnp.where so it
    stays branchless under jit.
  * HumanGuidedLoss = base_loss_weight * InpaintingLoss
      + human_feedback_weight * (L1 on human-mask region
                                 + boundary_weight * boundary(human mask))
    where the human term is zero when the human mask is empty
    (losses.py:152-204).

All reductions accumulate in float32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models.vgg import VGGParams, vgg16_features

_EPS_BOUNDARY = 1e-6


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over all elements (torch nn.L1Loss default)."""
    dt = jnp.promote_types(a.dtype, jnp.float32)
    return jnp.mean(jnp.abs(a.astype(dt) - b.astype(dt)))


def total_variation_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Reference TV formula (losses.py:118-127). x: [B, H, W, C]."""
    x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    b = x.shape[0]
    h_diff = x[:, 1:, :, :] - x[:, :-1, :, :]
    w_diff = x[:, :, 1:, :] - x[:, :, :-1, :]
    h_tv = jnp.sum(jnp.square(h_diff)) / h_diff.size
    w_tv = jnp.sum(jnp.square(w_diff)) / w_diff.size
    return 2.0 * (h_tv + w_tv) / b


def _max_pool_3x3(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def boundary_band(mask: jnp.ndarray) -> jnp.ndarray:
    """3x3 dilation minus erosion, clamped to [0,1] (losses.py:406-408).

    mask: [B, H, W, 1], 1 = preserved. Note torch's max_pool2d pads with
    -inf then clamps; with a {0,1} mask the padded dilate equals ours,
    and erode = 1 - dilate(1 - mask) where the pad contributes
    1 - max(1-m, pad=-inf edge) — torch pads with -inf so edge windows
    see only real values plus -inf, matching reduce_window identity.
    """
    m = mask.astype(jnp.promote_types(mask.dtype, jnp.float32))
    dilated = _max_pool_3x3(m)
    eroded = 1.0 - _max_pool_3x3(1.0 - m)
    return jnp.clip(dilated - eroded, 0.0, 1.0)


def boundary_aware_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Area-normalized L1 on the mask boundary band (losses.py:403-416)."""
    boundary = boundary_band(mask)
    band_sum = jnp.sum(boundary)
    num = jnp.sum(
        jnp.abs(
            pred.astype(jnp.promote_types(pred.dtype, jnp.float32))
            - target.astype(jnp.promote_types(pred.dtype, jnp.float32))
        ) * boundary
    )
    loss = num / (band_sum + _EPS_BOUNDARY)
    # reference returns exactly 0.0 when the band is empty (sum < 1)
    return jnp.where(band_sum < 1.0, 0.0, loss)


@dataclass
class InpaintingLossConfig:
    perceptual_weight: float = 0.1
    tv_weight: float = 0.1
    boundary_weight: float = 0.5  # reference default (losses.py:14); see SURVEY §2.1
    vgg_normalize: bool = False  # reference feeds raw [0,1]x3 into VGG
    # rematerialize VGG activations in the backward pass. True trades
    # ~1 extra VGG forward (~19 ms/step at batch 16 512^2, measured
    # v5e) for ~1.6 GB of stored activations; the VGG weights are
    # frozen, so its backward only needs ReLU signs, not weight grads.
    # Off by default — batch-16 512^2 full-loss training fits 16 GB
    # HBM without it; enable for memory-constrained shapes.
    vgg_remat: bool = False


def inpainting_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    vgg_params: Optional[VGGParams],
    config: InpaintingLossConfig = InpaintingLossConfig(),
    compute_dtype: Optional[Any] = None,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full inpainting loss. Returns (total, components dict).

    pred/target: [B, H, W, 1] in [0,1]; mask: [B, H, W, 1], 1 = preserved.
    """
    comps: Dict[str, jnp.ndarray] = {}
    comps["l1"] = l1_loss(pred, target)
    total = comps["l1"]

    if config.perceptual_weight > 0 and vgg_params is not None:
        # remat: VGG activations at 512^2 dominate training HBM (the
        # conv1 feature map alone is batch*512^2*64 floats); recompute
        # them in the backward pass instead of storing them.
        vgg_fn = lambda img: vgg16_features(  # noqa: E731
            img, vgg_params, compute_dtype=compute_dtype,
            normalize=config.vgg_normalize,
        )
        if config.vgg_remat:
            vgg_fn = jax.checkpoint(vgg_fn)
        feat_pred = vgg_fn(pred)
        # no gradient flows into the target branch (target is data), so
        # it never benefits from remat — keep it a plain forward
        feat_target = jax.lax.stop_gradient(
            vgg16_features(
                target, vgg_params, compute_dtype=compute_dtype,
                normalize=config.vgg_normalize,
            )
        )
        comps["perceptual"] = l1_loss(feat_pred, feat_target)
        total = total + config.perceptual_weight * comps["perceptual"]

    if config.tv_weight > 0:
        hole = 1.0 - mask
        comps["tv"] = total_variation_loss(pred * hole)
        total = total + config.tv_weight * comps["tv"]

    if config.boundary_weight > 0:
        comps["boundary"] = boundary_aware_loss(pred, target, mask)
        total = total + config.boundary_weight * comps["boundary"]

    comps["total"] = total
    return total, comps


@dataclass
class HumanGuidedLossConfig:
    base: InpaintingLossConfig = field(default_factory=InpaintingLossConfig)
    base_loss_weight: float = 0.7
    human_feedback_weight: float = 0.3


def human_guided_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    human_mask: Optional[jnp.ndarray],
    vgg_params: Optional[VGGParams],
    config: HumanGuidedLossConfig = HumanGuidedLossConfig(),
    compute_dtype: Optional[Any] = None,
) -> tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """HumanGuidedLoss (losses.py:152-204). human_mask: [B,H,W,1] or None."""
    base_total, comps = inpainting_loss(
        pred, target, mask, vgg_params, config.base, compute_dtype
    )
    comps = dict(comps)
    comps["base"] = base_total

    human = jnp.asarray(0.0, jnp.float32)
    if human_mask is not None:
        regions = (human_mask > 0).astype(jnp.float32)
        region_l1 = l1_loss(pred * regions, target * regions)
        human_term = region_l1
        if config.base.boundary_weight > 0:
            human_term = human_term + config.base.boundary_weight * (
                boundary_aware_loss(pred, target, regions)
            )
        # reference skips the human term entirely when the mask is empty
        human = jnp.where(jnp.sum(regions) > 0, human_term, 0.0)
    comps["human"] = human

    total = (
        config.base_loss_weight * base_total
        + config.human_feedback_weight * human
    )
    comps["total"] = total
    return total, comps
