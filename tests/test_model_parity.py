"""Numerical parity of the JAX models vs the PyTorch reference.

Gate (BASELINE.md): <=1e-3 normalized RMSE vs reference outputs on
identical weights. These tests check much tighter (fp32-roundoff)
tolerances at the layer and model level.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from terra_gan_tpu.models import Discriminator, PConvUNet
from terra_gan_tpu.models.generator import PConv2d as JaxPConv2d
from terra_gan_tpu.ops.resize import upsample2x_bilinear, upsample2x_nearest
from terra_gan_tpu.utils.torch_compat import (
    discriminator_vars_to_torch_state,
    generator_vars_to_torch_state,
    torch_state_to_discriminator_vars,
    torch_state_to_generator_vars,
)

from ref_loader import load_reference_models, reference_available

requires_ref = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def nrmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.abs(b).max(), 1e-12)
    return np.sqrt(np.mean((a - b) ** 2)) / denom


def rand_image_mask(rng, b, h, w, c=1):
    img = rng.random((b, h, w, c), dtype=np.float32)
    mask = (rng.random((b, h, w, 1)) > 0.35).astype(np.float32)
    # carve a solid hole so some windows are fully invalid
    mask[:, h // 4 : h // 2, w // 4 : w // 2, :] = 0.0
    return img, mask


def to_torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


class TestUpsampleParity:
    def test_bilinear_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 7, 9, 3), dtype=np.float32)
        ref = torch.nn.functional.interpolate(
            to_torch_nchw(x), scale_factor=2, mode="bilinear", align_corners=False
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_nearest_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 5, 6, 2), dtype=np.float32)
        ref = torch.nn.functional.interpolate(
            to_torch_nchw(x), scale_factor=2, mode="nearest"
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(upsample2x_nearest(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@requires_ref
class TestPConvLayerParity:
    @pytest.mark.parametrize("k,s,p", [(7, 2, 3), (5, 2, 2), (3, 1, 1)])
    def test_layer_eval(self, k, s, p):
        ref = load_reference_models()
        torch.manual_seed(0)
        tlayer = ref.pconv.PConv2d(4, 8, kernel_size=k, stride=s, padding=p)
        tlayer.eval()

        rng = np.random.default_rng(2)
        x, mask = rand_image_mask(rng, 2, 32, 32, c=4)
        with torch.no_grad():
            tout, tmask = tlayer(to_torch_nchw(x), to_torch_nchw(mask))

        jlayer = JaxPConv2d(features=8, kernel_size=k, stride=s, padding=p)
        sd = {f"blk.input_conv.{n}": v for n, v in
              tlayer.input_conv.state_dict().items()}
        sd.update({f"blk.bn.{n}": v for n, v in tlayer.bn.state_dict().items()})
        params = {
            "kernel": np.transpose(sd["blk.input_conv.weight"].numpy(), (2, 3, 1, 0)),
            "bias": sd["blk.input_conv.bias"].numpy(),
            "bn": {"scale": sd["blk.bn.weight"].numpy(),
                   "bias": sd["blk.bn.bias"].numpy()},
        }
        stats = {"bn": {"mean": sd["blk.bn.running_mean"].numpy(),
                        "var": sd["blk.bn.running_var"].numpy()}}
        jout, jmask = jlayer.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x), jnp.asarray(mask), False,
        )
        np.testing.assert_allclose(
            np.asarray(jout),
            tout.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(jmask), tmask.numpy().transpose(0, 2, 3, 1)
        )


@requires_ref
class TestGeneratorParity:
    @pytest.fixture(scope="class")
    def pair(self):
        ref = load_reference_models()
        torch.manual_seed(42)
        tmodel = ref.generator.PConvUNet()
        variables = torch_state_to_generator_vars(tmodel.state_dict())
        return tmodel, variables

    def test_eval_forward(self, pair):
        tmodel, variables = pair
        tmodel.eval()
        rng = np.random.default_rng(3)
        x, mask = rand_image_mask(rng, 1, 128, 128)
        with torch.no_grad():
            tout = tmodel(to_torch_nchw(x) * to_torch_nchw(mask), to_torch_nchw(mask))
        jout = PConvUNet().apply(
            variables, jnp.asarray(x * mask), jnp.asarray(mask), False
        )
        err = nrmse(np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1))
        assert err < 1e-5, f"normalized RMSE {err}"

    def test_train_forward_and_bn_stats(self, pair):
        tmodel, variables = pair
        tmodel.train()
        rng = np.random.default_rng(4)
        x, mask = rand_image_mask(rng, 2, 128, 128)
        tout = tmodel(
            to_torch_nchw(x) * to_torch_nchw(mask), to_torch_nchw(mask)
        ).detach()
        jout, updates = PConvUNet().apply(
            variables, jnp.asarray(x * mask), jnp.asarray(mask), True,
            mutable=["batch_stats"],
        )
        err = nrmse(np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1))
        assert err < 1e-5, f"normalized RMSE {err}"
        # running stats after one train step must match torch exactly
        tsd = tmodel.state_dict()
        got = np.asarray(updates["batch_stats"]["enc1"]["bn"]["var"])
        want = tsd["enc1.bn.running_var"].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_roundtrip_to_torch_state(self, pair):
        tmodel, _ = pair
        variables = torch_state_to_generator_vars(tmodel.state_dict())
        sd = generator_vars_to_torch_state(variables)
        ref_sd = tmodel.state_dict()
        assert set(sd) == set(ref_sd)
        for k in ref_sd:
            if k.endswith("num_batches_tracked"):
                continue  # bookkeeping counter, not used numerically
            np.testing.assert_allclose(
                np.asarray(sd[k], np.float64),
                ref_sd[k].numpy().astype(np.float64),
                rtol=0, atol=0,
            )


@requires_ref
class TestDiscriminatorParity:
    def test_eval_forward(self):
        ref = load_reference_models()
        torch.manual_seed(7)
        tmodel = ref.discriminator.Discriminator()
        tmodel.eval()
        variables = torch_state_to_discriminator_vars(tmodel.state_dict())
        rng = np.random.default_rng(5)
        x = rng.random((2, 128, 128, 1), dtype=np.float32)
        with torch.no_grad():
            tout = tmodel(to_torch_nchw(x))
        jout = Discriminator().apply(variables, jnp.asarray(x), False)
        np.testing.assert_allclose(
            np.asarray(jout), tout.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )

    def test_roundtrip(self):
        ref = load_reference_models()
        torch.manual_seed(8)
        tmodel = ref.discriminator.Discriminator()
        variables = torch_state_to_discriminator_vars(tmodel.state_dict())
        sd = discriminator_vars_to_torch_state(variables)
        ref_sd = tmodel.state_dict()
        assert set(sd) == set(ref_sd)
        for k in ref_sd:
            np.testing.assert_allclose(np.asarray(sd[k]), ref_sd[k].numpy())
