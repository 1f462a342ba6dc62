"""VGG16 feature extractor for the perceptual loss.

The reference computes its perceptual loss on torchvision's VGG16
``features[:16]`` (IMAGENET1K_V1 weights) applied to the 1-channel DSM
repeated to 3 channels (mvp_gan/src/utils/losses.py:31-32,79-89).
``features[:16]`` is conv1_1..conv3_3 — i.e. everything up to (and
including) the ReLU after conv3_3, with 2 max-pools in between:

    conv(3->64) relu conv(64->64) relu pool
    conv(64->128) relu conv(128->128) relu pool
    conv(128->256) relu conv(256->256) relu conv(256->256) relu

TPU-native design: NHWC layout, a flat parameter pytree (list of
(kernel, bias)), bf16-friendly compute with fp32 accumulation. Weights
are pluggable because pretrained IMAGENET1K_V1 tensors cannot be
downloaded in this environment:

  * `load_weights(path)` reads an .npz (keys conv{i}_kernel / conv{i}_bias,
    HWIO) or a torch/torchvision state dict via `terra_gan_tpu.utils.
    torch_compat.load_pth` (keys features.{idx}.weight OIHW).
  * `random_weights(seed)` gives a fixed-seed He-init fallback — random
    VGG features are still a usable (if weaker) perceptual metric; runs
    using it are tagged so results are never silently non-comparable.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# (out_channels, followed_by_pool) for the 10 convs of features[:16]'s
# first three stages; pool positions follow torchvision's layer indices.
_CONV_CHANNELS = [64, 64, 128, 128, 256, 256, 256]
_POOL_AFTER = {1, 3}  # pool after conv index 1 (conv1_2) and 3 (conv2_2)
# torchvision features.* indices of the conv layers within features[:16]
_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14]

# ImageNet normalization used by torchvision pretrained models. The
# reference does NOT normalize its inputs before VGG (losses.py:79-89
# feeds raw [0,1] repeated channels), so we default to no normalization
# for parity; flag available for users who want the canonical form.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VGGParams = List[Tuple[jnp.ndarray, jnp.ndarray]]


def random_weights(seed: int = 0, dtype=jnp.float32) -> VGGParams:
    """Fixed-seed He-normal VGG16 conv weights (documented fallback)."""
    key = jax.random.PRNGKey(seed)
    params: VGGParams = []
    in_ch = 3
    for out_ch in _CONV_CHANNELS:
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * in_ch
        kernel = jax.random.normal(k1, (3, 3, in_ch, out_ch), dtype) * np.sqrt(
            2.0 / fan_in
        )
        params.append((kernel, jnp.zeros((out_ch,), dtype)))
        in_ch = out_ch
    return params


def load_weights(path: str) -> VGGParams:
    """Load VGG16 conv weights from .npz (HWIO) or torch .pth/.pt state dict."""
    if str(path).endswith(".npz"):
        data = np.load(path)
        return [
            (jnp.asarray(data[f"conv{i}_kernel"]), jnp.asarray(data[f"conv{i}_bias"]))
            for i in range(len(_CONV_CHANNELS))
        ]
    from ..utils.torch_compat import load_pth

    sd = load_pth(path)
    # accept either a full torchvision VGG16 state dict or features-only
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params: VGGParams = []
    for i, idx in enumerate(_TORCH_CONV_IDX):
        w = np.transpose(sd[f"{prefix}{idx}.weight"], (2, 3, 1, 0))
        b = sd[f"{prefix}{idx}.bias"]
        params.append((jnp.asarray(w), jnp.asarray(b)))
    return params


def save_weights(path: str, params: VGGParams) -> None:
    arrays = {}
    for i, (k, b) in enumerate(params):
        arrays[f"conv{i}_kernel"] = np.asarray(k)
        arrays[f"conv{i}_bias"] = np.asarray(b)
    np.savez(path, **arrays)


def vgg16_features(
    x: jnp.ndarray,
    params: VGGParams,
    compute_dtype: Optional[Any] = None,
    normalize: bool = False,
) -> jnp.ndarray:
    """Forward x [B,H,W,C] through VGG16 features[:16]; C=1 is repeated to 3.

    Returns the conv3_3 post-ReLU activation map [B, H/4, W/4, 256] fp32.
    """
    params = list(params)
    if (
        x.shape[-1] == 1
        and params[0][0].shape[2] == 3
        and compute_dtype is not None
        and not normalize
    ):
        # perf mode: conv(repeat3(x), W) == conv(x, sum_cin W) — fold
        # the channel repeat into conv1_1 (sum in fp32; one bf16
        # rounding of the summed kernel instead of three products);
        # skips materializing the 3x-repeated 512^2 tensor entirely.
        # Parity mode (compute_dtype None) keeps the literal repeat.
        k0, b0 = params[0]
        params[0] = (
            jnp.sum(k0.astype(jnp.float32), axis=2, keepdims=True), b0
        )
    elif x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if normalize:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    h = x if compute_dtype is None else x.astype(compute_dtype)
    for i, (kernel, bias) in enumerate(params):
        ki = kernel if compute_dtype is None else kernel.astype(compute_dtype)
        h = lax.conv_general_dilated(
            h,
            ki,
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=(
                jnp.float32 if compute_dtype is None else None
            ),
        ).astype(jnp.float32)
        h = jax.nn.relu(h + bias)
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
        if i in _POOL_AFTER:
            h = lax.reduce_window(
                h,
                -jnp.inf,
                lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
    return h.astype(jnp.float32)
