"""Shared layers with torch-exact semantics (for reference parity).

The reference is built on PyTorch defaults; two of them matter
numerically and are NOT flax defaults, so we implement them here:

  * BatchNorm: torch normalizes with the *biased* batch variance in
    train mode but updates the running variance with the *unbiased*
    one, using `running = (1-momentum)*running + momentum*batch`
    (momentum=0.1, eps=1e-5). flax's BatchNorm uses biased variance
    for the update and the opposite momentum convention.
  * Conv init: torch Conv2d uses kaiming_uniform(a=sqrt(5)) which
    reduces to U(+-1/sqrt(fan_in)) for both weight and bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) for HWIO kernels — torch Conv2d default."""
    kh, kw, in_ch, _ = shape
    bound = 1.0 / jnp.sqrt(jnp.asarray(kh * kw * in_ch, jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact torch train/eval + running-stat semantics.

    Operates on NHWC; statistics are over (N, H, W). Running stats live
    in the 'batch_stats' variable collection.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_running_average: bool,
        return_params: bool = False,
    ):
        """Normalize x — or, with return_params, declare the variables
        and hand back (scale, bias, mean, var) so a fused kernel can
        consume them (x then only provides the feature count)."""
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if return_params:
            return scale, bias, ra_mean.value, ra_var.value

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # f32 statistics for f32/bf16 activations; f64 activations
            # (jax_enable_x64 parity runs) keep f64 like torch .double()
            x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(x32, axis=(0, 1, 2))
            # biased variance used for normalization (torch train mode).
            # Two-pass E[(x-mean)^2] like torch — NOT E[x^2]-E[x]^2,
            # whose cancellation loses ~ulp*mean^2/var relative accuracy
            # and destabilized the deep 1x1 stages where var << mean^2
            # (r3 trajectory-parity investigation)
            var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean) * (inv * scale) + bias
        return y.astype(x.dtype)
