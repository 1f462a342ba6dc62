"""Loss-stack parity vs the reference formulas (mvp_gan/src/utils/losses.py).

The reference loss module can't be imported here (it hard-imports
torchvision, absent in this env), so each test re-states the reference
formula directly in torch (losses.py line refs inline) and checks our
jnp implementation against it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from terra_gan_tpu.losses import (
    HumanGuidedLossConfig,
    InpaintingLossConfig,
    boundary_aware_loss,
    boundary_band,
    human_guided_loss,
    inpainting_loss,
    total_variation_loss,
)
from terra_gan_tpu.models.vgg import random_weights, vgg16_features


def to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def torch_tv(x):
    # reference formula, losses.py:118-127
    b, h, w = x.size(0), x.size(2), x.size(3)
    count_h = x[:, :, 1:, :].numel()
    count_w = x[:, :, :, 1:].numel()
    h_tv = torch.pow(x[:, :, 1:, :] - x[:, :, : h - 1, :], 2).sum()
    w_tv = torch.pow(x[:, :, :, 1:] - x[:, :, :, : w - 1], 2).sum()
    return 2 * (h_tv / count_h + w_tv / count_w) / b


def torch_boundary(pred, target, mask, eps=1e-6):
    # reference forward, losses.py:403-416 (fixed 3x3 morphology)
    dilated = F.max_pool2d(mask, kernel_size=3, stride=1, padding=1)
    eroded = 1 - F.max_pool2d(1 - mask, kernel_size=3, stride=1, padding=1)
    boundary = torch.clamp(dilated - eroded, 0.0, 1.0)
    if torch.sum(boundary) < 1.0:
        return torch.tensor(0.0)
    return (torch.abs(pred - target) * boundary).sum() / (boundary.sum() + eps)


@pytest.fixture
def batch():
    rng = np.random.default_rng(11)
    pred = rng.random((2, 64, 64, 1), dtype=np.float32)
    target = rng.random((2, 64, 64, 1), dtype=np.float32)
    mask = (rng.random((2, 64, 64, 1)) > 0.3).astype(np.float32)
    mask[:, 10:30, 10:30, :] = 0.0
    return pred, target, mask


class TestTV:
    def test_matches_reference_formula(self, batch):
        pred, _, mask = batch
        hole = 1.0 - mask
        want = torch_tv(to_nchw(pred * hole)).item()
        got = float(total_variation_loss(jnp.asarray(pred * hole)))
        assert abs(got - want) < 1e-6 * max(1.0, abs(want))


class TestBoundary:
    def test_band_matches_torch_morphology(self, batch):
        _, _, mask = batch
        dil = F.max_pool2d(to_nchw(mask), 3, 1, 1)
        ero = 1 - F.max_pool2d(1 - to_nchw(mask), 3, 1, 1)
        want = torch.clamp(dil - ero, 0, 1).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(boundary_band(jnp.asarray(mask)))
        np.testing.assert_array_equal(got, want)

    def test_loss_matches(self, batch):
        pred, target, mask = batch
        want = torch_boundary(to_nchw(pred), to_nchw(target), to_nchw(mask)).item()
        got = float(boundary_aware_loss(*map(jnp.asarray, (pred, target, mask))))
        assert abs(got - want) < 1e-6

    def test_empty_band_is_zero(self):
        ones = jnp.ones((1, 16, 16, 1))
        pred = jnp.zeros((1, 16, 16, 1))
        assert float(boundary_aware_loss(pred, pred + 1.0, ones)) == 0.0


class TestVGGFeatures:
    def test_matches_torch_stack(self):
        """Same weights through a torch replica of features[:16]."""
        params = random_weights(seed=3)
        rng = np.random.default_rng(5)
        x = rng.random((1, 64, 64, 1), dtype=np.float32)

        # torch replica: conv-relu pairs with pools after conv2 and conv4
        h = to_nchw(np.repeat(x, 3, axis=-1))
        for i, (k, b) in enumerate(params):
            w = torch.from_numpy(np.transpose(np.asarray(k), (3, 2, 0, 1)))
            h = F.relu(F.conv2d(h, w, torch.from_numpy(np.asarray(b)), padding=1))
            if i in (1, 3):
                h = F.max_pool2d(h, 2, 2)
        want = h.numpy().transpose(0, 2, 3, 1)

        got = np.asarray(vgg16_features(jnp.asarray(x), params))
        assert got.shape == want.shape == (1, 16, 16, 256)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_folded_1ch_conv_matches_repeat(self):
        """Perf mode folds the channel repeat into conv1_1
        (conv(repeat3(x), W) == conv(x, sum_cin W)); must match the
        explicit-repeat path within bf16 rounding."""
        params = random_weights(seed=3)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((2, 64, 64, 1), dtype=np.float32))

        folded = np.asarray(
            vgg16_features(x, params, compute_dtype=jnp.bfloat16)
        )
        explicit = np.asarray(
            vgg16_features(
                jnp.repeat(x, 3, axis=-1), params,
                compute_dtype=jnp.bfloat16,
            )
        )
        ref = np.asarray(vgg16_features(x, params))  # fp32 repeat path
        scale = np.abs(ref).max()
        assert np.abs(folded - explicit).max() / scale < 2e-2
        # both bf16 variants sit within bf16 tolerance of fp32
        assert np.abs(folded - ref).max() / scale < 3e-2


class TestComposite:
    def test_inpainting_loss_components(self, batch):
        pred, target, mask = batch
        vgg = random_weights(seed=0)
        cfg = InpaintingLossConfig(
            perceptual_weight=0.1, tv_weight=0.1, boundary_weight=0.5
        )
        total, comps = jax.jit(
            lambda p, t, m: inpainting_loss(p, t, m, vgg, cfg)
        )(*map(jnp.asarray, (pred, target, mask)))

        l1 = float(np.mean(np.abs(pred - target)))
        tv = torch_tv(to_nchw(pred * (1 - mask))).item()
        bd = torch_boundary(to_nchw(pred), to_nchw(target), to_nchw(mask)).item()
        assert abs(float(comps["l1"]) - l1) < 1e-6
        want_partial = l1 + 0.1 * tv + 0.5 * bd
        got_partial = float(total) - 0.1 * float(comps["perceptual"])
        assert abs(got_partial - want_partial) < 1e-5

    def test_weights_disable_terms(self, batch):
        pred, target, mask = batch
        cfg = InpaintingLossConfig(
            perceptual_weight=0.0, tv_weight=0.0, boundary_weight=0.0
        )
        total, comps = inpainting_loss(
            *map(jnp.asarray, (pred, target, mask)), None, cfg
        )
        assert set(comps) == {"l1", "total"}
        assert abs(float(total) - float(comps["l1"])) == 0.0

    def test_human_guided_combination(self, batch):
        pred, target, mask = batch
        rng = np.random.default_rng(7)
        hmask = (rng.random((2, 64, 64, 1)) > 0.8).astype(np.float32)
        cfg = HumanGuidedLossConfig(
            base=InpaintingLossConfig(perceptual_weight=0.0),
            base_loss_weight=0.7,
            human_feedback_weight=0.3,
        )
        total, comps = human_guided_loss(
            *map(jnp.asarray, (pred, target, mask)),
            jnp.asarray(hmask), None, cfg,
        )
        # human term = L1 on region + 0.5 * boundary on region (losses.py:172-185)
        region_l1 = float(np.mean(np.abs(pred * hmask - target * hmask)))
        region_bd = torch_boundary(
            to_nchw(pred), to_nchw(target), to_nchw(hmask)
        ).item()
        want_human = region_l1 + 0.5 * region_bd
        assert abs(float(comps["human"]) - want_human) < 1e-6
        want = 0.7 * float(comps["base"]) + 0.3 * want_human
        assert abs(float(total) - want) < 1e-6

    def test_human_guided_empty_mask(self, batch):
        pred, target, mask = batch
        hmask = jnp.zeros((2, 64, 64, 1))
        cfg = HumanGuidedLossConfig(base=InpaintingLossConfig(perceptual_weight=0.0))
        _, comps = human_guided_loss(
            *map(jnp.asarray, (pred, target, mask)), hmask, None, cfg
        )
        assert float(comps["human"]) == 0.0
