"""GAN training state: one pytree carrying both networks and optimizers.

The reference keeps a "master" generator+discriminator pair with two
Adam optimizers threaded through the whole pipeline
(main_pipeline.py:208-221, train.py:137-147). Here that is a single
immutable flax-struct pytree so the entire train step — both nets'
forward/backward, both optimizer updates, and the BatchNorm running
stats — compiles into one XLA program and shards over a device mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

DEFAULT_LR = 2e-4  # reference: main_pipeline.py:214-221, train.py:138-147


def adam(lr: float = DEFAULT_LR) -> optax.GradientTransformation:
    """torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any
    d_params: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any

    @classmethod
    def create(
        cls,
        generator,
        discriminator,
        rng: jax.Array,
        sample_shape=(1, 512, 512, 1),
        g_tx: Optional[optax.GradientTransformation] = None,
        d_tx: Optional[optax.GradientTransformation] = None,
        g_variables: Optional[Any] = None,
        d_variables: Optional[Any] = None,
    ) -> "GANTrainState":
        g_tx = g_tx or adam()
        d_tx = d_tx or adam()
        x = jnp.zeros(sample_shape, jnp.float32)
        m = jnp.ones(sample_shape[:3] + (1,), jnp.float32)
        if g_variables is None:
            rng, k = jax.random.split(rng)
            g_variables = jax.jit(generator.init, static_argnums=3)(k, x, m, False)
        if d_variables is None:
            rng, k = jax.random.split(rng)
            d_variables = jax.jit(discriminator.init, static_argnums=2)(k, x, False)
        g_variables = jax.tree.map(jnp.asarray, dict(g_variables))
        d_variables = jax.tree.map(jnp.asarray, dict(d_variables))
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_variables["params"],
            g_stats=g_variables.get("batch_stats", {}),
            d_params=d_variables["params"],
            d_stats=d_variables.get("batch_stats", {}),
            g_opt=g_tx.init(g_variables["params"]),
            d_opt=d_tx.init(d_variables["params"]),
        )

    def generator_variables(self):
        return {"params": self.g_params, "batch_stats": self.g_stats}

    def discriminator_variables(self):
        return {"params": self.d_params, "batch_stats": self.d_stats}
