"""PatchGAN discriminator (reference: mvp_gan/src/models/discriminator.py).

4 conv blocks (widths 64/128/256/512, k4 s2 p1, BatchNorm on all but
the first, LeakyReLU 0.2) followed by a final k4 s1 p1 conv to a
1-channel logit patch map (discriminator.py:10-26). NHWC layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from .layers import TorchBatchNorm, torch_conv_bias_init, torch_conv_kernel_init


def _conv(x, kernel, bias, stride, padding, compute_dtype, precision=None):
    xi = x if compute_dtype is None else x.astype(compute_dtype)
    ki = kernel if compute_dtype is None else kernel.astype(compute_dtype)
    # see ops/pconv.py: under mixed precision the conv emits the compute
    # dtype (separate upcast) so its VJP dtypes stay consistent
    out = lax.conv_general_dilated(
        xi, ki, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=(
            jnp.promote_types(x.dtype, jnp.float32)
            if compute_dtype is None else None
        ),
        precision=precision,
    ).astype(jnp.promote_types(x.dtype, jnp.float32))
    return out + bias


class Discriminator(nn.Module):
    """Outputs a [B, H/16-1, W/16-1, 1] patch logit map."""

    base_width: int = 64
    compute_dtype: Optional[Any] = None
    precision: Optional[Any] = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.base_width
        widths = [w, 2 * w, 4 * w, 8 * w]
        h = x
        for i, f in enumerate(widths):
            in_ch = h.shape[-1]
            kernel = self.param(
                f"block{i}_kernel", torch_conv_kernel_init, (4, 4, in_ch, f)
            )
            bias = self.param(
                f"block{i}_bias", torch_conv_bias_init(16 * in_ch), (f,)
            )
            h = _conv(h, kernel, bias, 2, 1, self.compute_dtype, self.precision)
            if i > 0:  # no normalization on the first block
                h = TorchBatchNorm(name=f"block{i}_bn")(
                    h, use_running_average=not train
                )
            h = nn.leaky_relu(h, negative_slope=0.2)

        in_ch = h.shape[-1]
        kernel = self.param(
            "final_kernel", torch_conv_kernel_init, (4, 4, in_ch, 1)
        )
        bias = self.param("final_bias", torch_conv_bias_init(16 * in_ch), (1,))
        return _conv(h, kernel, bias, 1, 1, self.compute_dtype, self.precision)
