"""Experiment: does int8 conv beat bf16 conv on this TPU through XLA?

Motivation (BASELINE.md): eval forward sits at ~49% bf16 MFU; deep
stages are MXU-bound (int8 doubles MXU peak on v5e: ~394 TOPS vs
197 TFLOP/s bf16) and shallow 512² stages are HBM-bound (int8
activations halve the bytes vs bf16). If XLA lowers
int8 x int8 -> int32 convs onto the int8 MXU path, a quantized
(w8a8) eval mode is a real model-level lever; if it upcasts, the
question closes like the Pallas one did — by measurement.

Timing: each measurement runs ITERS conv applications inside ONE
jitted lax.scan (device-side loop, no host round trips), so the
numbers are valid even with other load on this 1-core host.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

ITERS = 30

# (name, B, H, W, Cin, Cout, k, stride) — representative U-Net stages
SHAPES = [
    ("shallow_dec1_like", 16, 512, 512, 64, 64, 3, 1),
    ("mid_enc3_like", 16, 128, 128, 128, 256, 3, 2),
    ("deep_enc5_like", 16, 32, 32, 512, 512, 3, 1),
    ("deep_1x1_like", 16, 32, 32, 512, 512, 1, 1),
]

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride, acc_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=DN, preferred_element_type=acc_dtype,
    )


@functools.partial(jax.jit, static_argnames=("stride", "acc_dtype", "out_cast"))
def loop(x, w, stride, acc_dtype, out_cast):
    if stride == 1:
        def body1(carry, _):
            y = conv(carry, w, stride, acc_dtype)
            return out_cast(y), y[0, 0, 0, 0].astype(jnp.float32)
        _, outs = lax.scan(body1, x, None, length=ITERS)
    else:
        # stride>1 shrinks H/W so the output can't be the carry; carry
        # a scalar and mix it into the input each iteration so the conv
        # is NOT loop-invariant (else XLA hoists it out of the scan)
        def body(carry, _):
            if x.dtype == jnp.int8:
                xi = x ^ (carry.astype(jnp.int8) & 1)
            else:
                xi = x + carry.astype(x.dtype) * 1e-6
            y = conv(xi, w, stride, acc_dtype)
            return y[0, 0, 0, 0].astype(jnp.float32), (
                y[0, 0, 0, 1].astype(jnp.float32)
            )
        _, outs = lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=ITERS
        )
    return outs.sum()


def measure(name, B, H, W, Cin, Cout, k, stride, dtype):
    key = jax.random.PRNGKey(0)
    if dtype == "bf16":
        x = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, Cin, Cout), jnp.bfloat16) * 0.05
        acc = jnp.float32
        cast = lambda y: y.astype(jnp.bfloat16)
    else:
        x = jax.random.randint(key, (B, H, W, Cin), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, k, Cin, Cout), -127, 127, jnp.int8)
        acc = jnp.int32
        # requant stand-in: shift-scale back to int8 (what a real
        # quantized pipeline pays between stages)
        cast = lambda y: jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    # data-dependent sync: block_until_ready does not reliably block
    # through the axon relay plugin — fetch the scalar value instead
    float(loop(x, w, stride, acc, cast))  # compile + warmup
    t0 = time.perf_counter()
    float(loop(x, w, stride, acc, cast))
    dt = (time.perf_counter() - t0) / ITERS
    Ho, Wo = H // stride, W // stride
    flops = 2 * B * Ho * Wo * Cin * Cout * k * k
    print(
        f"{name:20s} {dtype:5s} {dt*1e3:8.3f} ms/conv "
        f"{flops/dt/1e12:7.1f} T(FL)OPS",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for shape in SHAPES:
        tb = measure(*shape, "bf16")
        ti = measure(*shape, "int8")
        print(f"{shape[0]:20s} int8/bf16 speedup: {tb/ti:.2f}x", flush=True)
