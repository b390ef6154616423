"""Fixture tests for pooling ops (torch MaxPool2d/MaxUnpool2d parity) and warps."""
import jax
import jax.numpy as jnp
import numpy as np

from dct_tpu.ops import affine_warp, make_affine, max_pool_2x2_with_mask, mask_unpool_2x2
from dct_tpu.ops.pooling import max_pool_2x2


class TestPooling:
    def test_hand_fixture(self):
        # 4x4 single channel; windows: [[1,2],[3,4]] etc.
        x = jnp.asarray(np.array([
            [1, 2, 5, 6],
            [3, 4, 7, 8],
            [9, 10, 13, 14],
            [11, 12, 15, 16],
        ], np.float32))[None, :, :, None]
        pooled, mask = max_pool_2x2_with_mask(x)
        assert np.allclose(np.asarray(pooled)[0, :, :, 0], [[4, 8], [12, 16]])
        # argmax of each window is its bottom-right element here
        expect_mask = np.zeros((4, 4))
        expect_mask[1, 1] = expect_mask[1, 3] = expect_mask[3, 1] = expect_mask[3, 3] = 1
        assert np.allclose(np.asarray(mask)[0, :, :, 0], expect_mask)
        up = mask_unpool_2x2(pooled, mask)
        expect_up = np.zeros((4, 4))
        expect_up[1, 1], expect_up[1, 3], expect_up[3, 1], expect_up[3, 3] = 4, 8, 12, 16
        assert np.allclose(np.asarray(up)[0, :, :, 0], expect_up)

    def test_tie_break_first_rowmajor(self):
        x = jnp.ones((1, 2, 2, 1))
        pooled, mask = max_pool_2x2_with_mask(x)
        m = np.asarray(mask)[0, :, :, 0]
        assert m[0, 0] == 1 and m.sum() == 1  # first element in row-major order

    def test_mask_is_onehot_per_window(self, rng):
        x = jax.random.normal(rng, (3, 16, 16, 8))
        _, mask = max_pool_2x2_with_mask(x)
        window_sums = np.asarray(mask).reshape(3, 8, 2, 8, 2, 8).sum(axis=(2, 4))
        assert np.allclose(window_sums, 1.0)

    def test_matches_plain_pool(self, rng):
        x = jax.random.normal(rng, (2, 8, 8, 4))
        p1, _ = max_pool_2x2_with_mask(x)
        assert np.allclose(np.asarray(p1), np.asarray(max_pool_2x2(x)))

    def test_impls_bit_identical_and_torch_tiebreak(self, rng):
        """The "slices" and "s2d" window-split formulations (pooling.IMPL)
        must agree bit-for-bit, including torch's first-row-major tie-break
        on quantized (tie-heavy) inputs."""
        import torch
        import torch.nn.functional as F

        from dct_tpu.ops import pooling as pool_mod

        x_np = np.round(np.random.RandomState(3).rand(2, 8, 10, 3) * 4) / 4
        x = jnp.asarray(x_np, jnp.float32)
        outs = {}
        prev = pool_mod.IMPL
        try:
            for impl in ("slices", "s2d"):
                pool_mod.IMPL = impl
                p, m = jax.jit(max_pool_2x2_with_mask)(x)
                u = jax.jit(mask_unpool_2x2)(p, m)
                outs[impl] = (np.asarray(p), np.asarray(m), np.asarray(u))
        finally:
            pool_mod.IMPL = prev
        for a, b in zip(outs["slices"], outs["s2d"]):
            np.testing.assert_array_equal(a, b)
        xt = torch.tensor(x_np.transpose(0, 3, 1, 2), dtype=torch.float32)
        pt, it = F.max_pool2d(xt, 2, 2, return_indices=True)
        ut = F.max_unpool2d(pt, it, 2)
        np.testing.assert_allclose(outs["slices"][0],
                                   pt.numpy().transpose(0, 2, 3, 1), rtol=0, atol=0)
        np.testing.assert_allclose(outs["slices"][2],
                                   ut.numpy().transpose(0, 2, 3, 1), rtol=0, atol=0)

    def test_grad_flows_through_unpool(self, rng):
        x = jax.random.normal(rng, (1, 4, 4, 1))

        def f(x):
            p, m = max_pool_2x2_with_mask(x)
            return jnp.sum(mask_unpool_2x2(p * 2.0, m))
        g = np.asarray(jax.grad(f)(x))
        # gradient is 2 exactly at each window argmax, 0 elsewhere
        assert np.allclose(np.sort(g.flatten())[-4:], 2.0)
        assert np.allclose(g.sum(), 8.0)


class TestWarp:
    def test_identity(self, rng):
        img = jax.random.normal(rng, (8, 8))
        out = affine_warp(img, make_affine(), "bilinear")
        assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_flip_lr(self, rng):
        img = jax.random.normal(rng, (8, 8))
        out = affine_warp(img, make_affine(flip_lr=True), "nearest")
        assert np.allclose(np.asarray(out), np.asarray(img)[:, ::-1], atol=1e-5)

    def test_flip_ud(self, rng):
        img = jax.random.normal(rng, (8, 8))
        out = affine_warp(img, make_affine(flip_ud=True), "nearest")
        assert np.allclose(np.asarray(out), np.asarray(img)[::-1, :], atol=1e-5)

    def test_rotate_180(self, rng):
        img = jax.random.normal(rng, (9, 9))
        out = affine_warp(img, make_affine(angle_deg=180.0), "nearest")
        assert np.allclose(np.asarray(out), np.asarray(img)[::-1, ::-1], atol=1e-4)

    def test_nearest_preserves_labels(self, rng):
        gt = jax.random.randint(rng, (16, 16), 0, 4).astype(jnp.float32)
        out = affine_warp(gt, make_affine(angle_deg=30.0), "nearest")
        vals = set(np.unique(np.asarray(out)).tolist())
        assert vals.issubset({0.0, 1.0, 2.0, 3.0})

    def test_zoom_crop_center(self):
        # zoom 2x on a constant-gradient image: center preserved
        img = jnp.arange(64.0).reshape(8, 8)
        out = affine_warp(img, make_affine(zoom_y=2.0, zoom_x=2.0), "bilinear")
        assert abs(float(out[4, 4]) - float(img[4, 4])) < 10.0
        assert np.isfinite(np.asarray(out)).all()


class TestShearWarp:
    """The LDU shear-decomposed warp vs the exact single-gather warp."""

    def _coord_img(self, h, w):
        yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 10.0
        xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 10.0
        return jnp.stack([yy, xx], axis=-1)                      # (h,w,2)

    def test_identity_exact(self):
        from dct_tpu.ops.warp import affine_warp_shear
        img = self._coord_img(32, 32)
        out = affine_warp_shear(img, make_affine())
        assert np.allclose(np.asarray(out), np.asarray(img))

    def test_flips_exact(self):
        from dct_tpu.ops.warp import affine_warp_shear
        img = self._coord_img(32, 32)
        out = affine_warp_shear(img, make_affine(flip_lr=True, flip_ud=True))
        assert np.allclose(np.asarray(out), np.asarray(img)[::-1, ::-1])

    def test_displacement_vs_exact_warp(self):
        """For PILaugment-distributed thetas, every in-bounds pixel of the
        shear warp decodes to a source position ≤ 2 px from the exact
        nearest warp's, and validity masks agree on ≥ 95% of pixels."""
        from dct_tpu.data.augment import sample_aug_thetas
        from dct_tpu.ops.warp import affine_warp_shear_batch

        h = w = 64
        img = jnp.stack([self._coord_img(h, w)] * 8)            # (8,h,w,2)
        thetas = sample_aug_thetas(jax.random.PRNGKey(3), 8, h, w)
        exact = jax.vmap(affine_warp, in_axes=(0, 0, None, None))(
            img, thetas, "nearest", 0.0)
        shear = affine_warp_shear_batch(img, thetas)

        e, s = np.asarray(exact), np.asarray(shear)
        valid_e, valid_s = e[..., 0] > 0, s[..., 0] > 0
        agree = valid_e == valid_s
        assert agree.mean() > 0.95, agree.mean()
        both = valid_e & valid_s
        disp = np.abs(e - s).max(-1)[both]
        assert disp.max() <= 2.0 + 1e-5, disp.max()

    def test_labels_preserved(self):
        from dct_tpu.ops.warp import affine_warp_shear
        gt = jax.random.randint(jax.random.PRNGKey(0), (32, 32), 0, 4)
        out = affine_warp_shear(gt.astype(jnp.float32)[..., None],
                                make_affine(angle_deg=30.0))
        vals = set(np.unique(np.asarray(out)).tolist())
        assert vals.issubset({0.0, 1.0, 2.0, 3.0})
