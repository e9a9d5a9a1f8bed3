"""Augmentation: branch semantics, box/image consistency, determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from k210_yolo_framework_tpu.ops import augment as A

# jitted entry points: eager tracing of the slice-built shears costs seconds
# per call on 1-core XLA:CPU; compiled forms ride the persistent cache
_aug_one = jax.jit(A.augment_image_and_boxes)
_aug_batch = jax.jit(A.augment_batch, static_argnames="mode")
_shear_x = jax.jit(A._shear_x, static_argnames="bound")
_shear_y = jax.jit(A._shear_y, static_argnames="bound")
_shear_x_direct = jax.jit(A._shear_x_direct, static_argnames="bound")
_shear_y_direct = jax.jit(A._shear_y_direct, static_argnames="bound")


def _img(h=32, w=48):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))


def test_flip_branch_mirrors_image_and_boxes():
    img = _img()
    # continuous-coordinate mirror x' = w - x (imgaug convention): lands
    # exactly on pixel centers, so the warp must equal an index flip
    fwd = jnp.asarray([[-1.0, 0, float(img.shape[1])], [0, 1, 0], [0, 0, 1]])
    out = A._inverse_affine_sample(img, jnp.linalg.inv(fwd))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img)[:, ::-1], atol=1e-3)

    boxes = jnp.asarray([[0, 0.25, 0.5, 0.2, 0.4]], jnp.float32)
    nb, nv = A._affine_boxes(boxes, jnp.asarray([True]), fwd, (32, 48))
    assert bool(nv[0])
    # boxes ride the SAME matrix: x' = 1 - x exactly
    np.testing.assert_allclose(float(nb[0, 1]), 1 - 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nb[0, 3:5]), [0.2, 0.4], atol=1e-5)


def test_flip_edge_box_stays_in_image():
    """A box touching the left edge must mirror to touch the right edge
    exactly (the old index-space matrix shifted it 1px out)."""
    w, h = 48, 32
    fwd = jnp.asarray([[-1.0, 0, float(w)], [0, 1, 0], [0, 0, 1]])
    boxes = jnp.asarray([[0, 4 / w, 0.5, 8 / w, 0.5]], jnp.float32)  # x0 = 0
    nb, nv = A._affine_boxes(boxes, jnp.asarray([True]), fwd, (h, w))
    assert bool(nv[0])
    x1 = float(nb[0, 1]) + float(nb[0, 3]) / 2
    np.testing.assert_allclose(x1, 1.0, rtol=1e-6)  # touches right edge
    np.testing.assert_allclose(float(nb[0, 3]), 8 / w, rtol=1e-6)  # width kept


def test_identity_affine_is_noop():
    img = _img()
    out = A._inverse_affine_sample(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_translate_moves_boxes_out():
    fwd = jnp.asarray([[1.0, 0, 1000.0], [0, 1, 0], [0, 0, 1]])  # huge shift
    boxes = jnp.asarray([[3, 0.5, 0.5, 0.2, 0.2]], jnp.float32)
    _, nv = A._affine_boxes(boxes, jnp.asarray([True]), fwd, (32, 48))
    assert not bool(nv[0])  # fully outside -> dropped


def test_partial_clip_keeps_class_alignment():
    """Reference bug fixed: dropping box 0 must not relabel box 1
    (utils.py:336 would assign p[0] to the survivor)."""
    fwd = jnp.asarray([[1.0, 0, -40.0], [0, 1, 0], [0, 0, 1]])  # shift left 40px of 48
    boxes = jnp.asarray([[7, 0.1, 0.5, 0.1, 0.2],    # dropped (fully out)
                         [11, 0.95, 0.5, 0.1, 0.2]], jnp.float32)  # clipped, stays
    nb, nv = A._affine_boxes(boxes, jnp.asarray([True, True]), fwd, (32, 48))
    assert not bool(nv[0]) and bool(nv[1])
    assert int(nb[1, 0]) == 11  # class rides with its own box


def test_rotation_preserves_center_box_validity():
    img = _img(64, 64)
    boxes = jnp.asarray([[0, 0.5, 0.5, 0.3, 0.3]], jnp.float32)
    key = jax.random.PRNGKey(1)
    for i in range(8):
        k = jax.random.fold_in(key, i)
        oi, ob, ov = _aug_one(k, img, boxes, jnp.asarray([True]))
        assert oi.shape == img.shape
        assert bool(ov[0])  # center box survives +-10deg / +-10% / flip
        # rotation can only grow an axis-aligned box slightly (<= ~1.35x @10deg)
        assert float(ob[0, 3]) <= 0.45 and float(ob[0, 4]) <= 0.45


def test_batched_augment_deterministic():
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 32, 48, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.3, 0.6, (4, 6, 5)).astype(np.float32))
    valid = jnp.ones((4, 6), bool)
    key = jax.random.PRNGKey(42)
    f = jax.jit(A.augment_batch)
    o1 = f(key, imgs, boxes, valid)
    o2 = f(key, imgs, boxes, valid)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different key -> different augmentation somewhere in the batch
    o3 = f(jax.random.PRNGKey(43), imgs, boxes, valid)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o3)))


def test_shear_passes_match_gather_oracle():
    """Each gather-free shear pass is EXACT two-tap bilinear: it must match
    the gather-based oracle on the same shear matrix to fp tolerance."""
    img = _img(32, 48)
    h, w = 32, 48
    a = 0.061  # some non-integer shear slope
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2.0
    got = _shear_x(img, a * ys, bound=4)
    # forward shear x' = x + a*(y - cy) in continuous coords
    fwd = jnp.asarray([[1.0, a, -a * h / 2.0], [0, 1, 0], [0, 0, 1]])
    want = A._inverse_affine_sample(img, jnp.linalg.inv(fwd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    b = -0.113
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 - w / 2.0
    got = _shear_y(img, b * xs, bound=4)
    fwd = jnp.asarray([[1.0, 0, 0], [b, 1, -b * w / 2.0], [0, 0, 1]])
    want = A._inverse_affine_sample(img, jnp.linalg.inv(fwd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_radix_shear_matches_direct():
    """Above the radix threshold the shear splits into coarse-shift + fine
    shear; the split must be numerically IDENTICAL to the direct weighted
    sum (the fractional taps are untouched — only zero-weight slice terms
    are removed).  Big offsets exercise both coarse directions."""
    img = _img(64, 96)
    h, w = 64, 96
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2.0
    offs = 0.83 * ys  # reaches +-26: well past the 2*R=16 threshold
    got = _shear_x(img, offs, bound=28)
    want = _shear_x_direct(img, offs, bound=28)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-3)  # bf16-safe exactness

    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 - w / 2.0
    offs = -0.61 * xs  # +-29
    got = _shear_y(img, offs, bound=31)
    want = _shear_y_direct(img, offs, bound=31)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-3)


def test_translate_bilinear_matches_gather_oracle():
    img = _img(32, 48)
    tx, ty = jnp.float32(2.7), jnp.float32(-1.3)
    got = A._translate_bilinear(img, tx, ty)
    fwd = jnp.asarray([[1.0, 0, tx], [0, 1, ty], [0, 0, 1]])
    want = A._inverse_affine_sample(img, jnp.linalg.inv(fwd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_rotate_3shear_close_to_direct_bilinear():
    """The 3-shear rotation interpolates three times, so it is not bitwise
    equal to one direct bilinear — but on a smooth image the two must agree
    closely, and exactly at theta=0."""
    h, w = 64, 64
    yy, xx = np.meshgrid(np.linspace(0, 3, h), np.linspace(0, 3, w),
                         indexing="ij")
    smooth = np.stack([np.sin(yy) * np.cos(xx)] * 3, -1).astype(np.float32) * 100
    img = jnp.asarray(smooth)

    out0 = A._rotate_3shear(img, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out0), smooth, atol=1e-3)

    theta = jnp.deg2rad(jnp.float32(8.0))
    got = A._rotate_3shear(img, theta)
    c, s = np.cos(float(theta)), np.sin(float(theta))
    cx, cy = w / 2.0, h / 2.0
    fwd = jnp.asarray([[c, -s, cx - c * cx + s * cy],
                       [s, c, cy - s * cx - c * cy],
                       [0, 0, 1]], jnp.float32)
    inv = np.asarray(jnp.linalg.inv(fwd))
    want = A._inverse_affine_sample(img, jnp.asarray(inv))
    # full-frame mean: the shear working frame is padded, so border content
    # the rotation keeps must survive (a same-size intermediate used to
    # zero-clip an ~11px edge band and this mean was ~2.5)
    g = np.asarray(got)
    v = np.asarray(want)
    assert np.abs(g - v).mean() < 0.5          # values span ~[-100, 100]
    # max error: exclude only pixels whose SOURCE is within 2px of the
    # frame boundary — there the direct sampler hard-cuts to zero while
    # three chained interpolations blur the cut over ~2px; every pixel
    # with an interior source (incl. the formerly-clipped band) must match
    ys, xs = np.meshgrid(np.arange(64) + 0.5, np.arange(64) + 0.5,
                         indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    interior = (sx > 2) & (sx < 62) & (sy > 2) & (sy < 62)
    assert np.abs(g - v).max(-1)[interior].max() < 8.0


def test_branch_distribution_covers_all_three():
    """Over many keys each OneOf branch must occur (utils.py:84-88)."""
    img = jnp.ones((16, 16, 3), jnp.float32)
    boxes = jnp.zeros((1, 5), jnp.float32)
    valid = jnp.asarray([False])
    kinds = set()
    base = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (16, 16, 3)).astype(np.float32))
    for i in range(30):
        k = jax.random.PRNGKey(i)
        out, _, _ = _aug_one(k, base, boxes, valid)
        d = np.asarray(out) - np.asarray(base)
        if np.allclose(d, 0, atol=1e-3):
            kinds.add("identity")      # flip branch, coin said no
        elif np.allclose(np.asarray(out), np.asarray(base)[:, ::-1], atol=1e-3):
            kinds.add("flip")
        else:
            kinds.add("affine")
    assert {"identity", "flip", "affine"} <= kinds


def test_augment_batch_iid_matches_per_image_vmap():
    """mode='iid' is exactly the reference OneOf semantics: per-image keys
    through augment_image_and_boxes (utils.py:84-88)."""
    b, h, w = 4, 32, 32
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.3, 0.6, (b, 2, 5)).astype(np.float32))
    valid = jnp.ones((b, 2), bool)
    key = jax.random.PRNGKey(7)
    got = _aug_batch(key, imgs, boxes, valid, mode="iid")
    keys = jax.random.split(key, b)
    want = jax.jit(jax.vmap(A.augment_image_and_boxes))(keys, imgs, boxes, valid)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))


def test_augment_batch_small_batch_falls_back_to_iid():
    """B<3 cannot be stratified into three slices."""
    b = 2
    imgs = jnp.zeros((b, 16, 16, 3), jnp.float32)
    boxes = jnp.full((b, 1, 5), 0.5, jnp.float32)
    valid = jnp.ones((b, 1), bool)
    key = jax.random.PRNGKey(0)
    got = _aug_batch(key, imgs, boxes, valid, mode="stratified")
    want = _aug_batch(key, imgs, boxes, valid, mode="iid")
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))


def test_augment_batch_stratified_keeps_image_box_alignment():
    """Stratified mode permutes the batch; images, boxes and valid must ride
    the SAME permutation.  Each input image is a constant plane whose value
    encodes its index, and its single box carries the index as class id —
    after augmentation the center-pixel value must still identify the same
    source as the class id, for every output slot, under every branch
    (flip/rotate/translate all fix a constant image's interior)."""
    b, h, w = 9, 32, 32
    imgs = jnp.stack([jnp.full((h, w, 3), i * 10.0, jnp.float32)
                      for i in range(b)])
    boxes = np.zeros((b, 1, 5), np.float32)
    for i in range(b):
        boxes[i, 0] = [i, 0.5, 0.5, 0.25, 0.25]   # (class, x, y, w, h)
    valid = jnp.ones((b, 1), bool)

    for seed in range(4):
        out_i, out_b, out_v = _aug_batch(
            jax.random.PRNGKey(seed), imgs, jnp.asarray(boxes), valid)
        assert out_i.shape == imgs.shape
        assert bool(np.asarray(out_v).all())       # centered box survives all branches
        cls = np.asarray(out_b)[:, 0, 0]
        center = np.asarray(out_i)[:, h // 2, w // 2, 0]
        np.testing.assert_allclose(center, cls * 10.0, atol=1.0)
        # outputs are a permutation of the inputs, nothing lost or duplicated
        assert sorted(cls.tolist()) == list(range(b))


def test_augment_batch_stratified_slices_apply_distinct_branches():
    """The three static slices really run different branches: translate by
    a nonzero offset moves a gradient image, rotation tilts it, and the
    flip slice either mirrors or passes through."""
    b, h, w = 6, 32, 32
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    grad = np.stack([xx] * 3, -1)
    imgs = jnp.asarray(np.stack([grad] * b))
    boxes = jnp.full((b, 1, 5), 0.5, jnp.float32)
    valid = jnp.ones((b, 1), bool)
    out, _, _ = _aug_batch(jax.random.PRNGKey(3), imgs, boxes, valid)
    out = np.asarray(out)
    kinds = set()
    for i in range(b):
        d = out[i] - grad
        if np.allclose(d, 0, atol=1e-2):
            kinds.add("identity")
        elif np.allclose(out[i], grad[:, ::-1], atol=1e-2):
            kinds.add("flip")
        else:
            kinds.add("affine")
    # slices are flip(2)/rot(2)/tr(2): at least one affine output must exist
    assert "affine" in kinds


def test_conv_shear_twin_matches_production_exactly():
    """The depthwise-conv batched shear (a round-5 measured-negative kept
    with its numbers, see `_shear_conv_batch` docstring) must stay an EXACT
    fp32 twin of the production slice-sum path — both the single passes and
    the full 3-shear rotation frame math."""
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (3, 12, 16, 2)).astype(np.float32))
    offsx = jnp.asarray(rng.uniform(-2.9, 2.9, (3, 12)).astype(np.float32))
    offsy = jnp.asarray(rng.uniform(-2.9, 2.9, (3, 16)).astype(np.float32))
    wantx = jax.vmap(lambda im, of: A._shear_x_direct(im, of, 3))(imgs, offsx)
    gotx = A._shear_conv_batch(imgs, offsx, 3, axis=2)
    np.testing.assert_array_equal(np.asarray(wantx), np.asarray(gotx))
    wanty = jax.vmap(lambda im, of: A._shear_y_direct(im, of, 3))(imgs, offsy)
    goty = A._shear_conv_batch(imgs, offsy, 3, axis=1)
    np.testing.assert_array_equal(np.asarray(wanty), np.asarray(goty))

    imgs2 = jnp.asarray(rng.uniform(0, 255, (2, 24, 32, 3)).astype(np.float32))
    thetas = jnp.asarray(np.deg2rad(rng.uniform(-10, 10, 2)).astype(np.float32))
    want = jax.vmap(A._rotate_3shear)(imgs2, thetas)
    got = A._rotate_3shear_batch(imgs2, thetas)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_rotate_pallas_matches_slice_sum():
    """The VMEM-fused 3-shear rotation kernel (ops/rotate_pallas.py,
    interpret mode off-TPU) is the same term-by-term weighted sum as the
    production per-image slice-sum rotation.  fp32: the two compile as
    SEPARATE XLA programs, so mul+add -> FMA contraction choices can differ
    and the match is ULP-level, not bit-level (measured max 2.3e-07
    relative on CPU).  bf16: the kernel accumulates internally in fp32 (a
    Mosaic 16-bit lowering limit forced the design; strictly MORE accurate)
    while the slice path rounds to bf16 per op, so the tolerance is bf16
    resolution itself (measured max 1.5e-2 relative, 8/6912 elements above
    1e-2).  Includes a width large enough that the production y-pass takes
    the radix path (the kernel's direct sum differs from radix only by
    added exact-zero terms)."""
    from k210_yolo_framework_tpu.ops import rotate_pallas as RP

    rng = np.random.default_rng(7)
    for h, w, c, dt, rtol, atol in (
            (24, 32, 3, jnp.float32, 1e-6, 1e-4),
            (48, 200, 3, jnp.float32, 1e-6, 1e-4),  # y-pass bound > 2*radix
            (24, 32, 3, jnp.bfloat16, 3e-2, 2.5)):
        imgs = jnp.asarray(
            rng.uniform(0, 255, (3, h, w, c)).astype(np.float32)).astype(dt)
        thetas = jnp.asarray(
            np.deg2rad(rng.uniform(-10, 10, 3)).astype(np.float32))
        want = jax.vmap(A._rotate_3shear)(imgs, thetas)
        got = RP.rotate_3shear_pallas(imgs, thetas, interpret=True)
        assert got.dtype == want.dtype
        np.testing.assert_allclose(
            np.asarray(want, np.float32), np.asarray(got, np.float32),
            rtol=rtol, atol=atol)
        assert RP.pallas_rotate_supported(h, w, c, dt)


def test_rotate_pallas_dispatch_gates_off_tpu():
    """augment_batch's 'auto' rotation dispatch must resolve to the slice
    path on non-TPU backends (CPU tests, the CPU-mesh dryrun) and the
    module flag must force the kernel (interpret) end-to-end."""
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 255, (6, 24, 32, 3)).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([[2.0, 0.5, 0.5, 0.3, 0.3]]), (6, 1, 1))
    valid = jnp.ones((6, 1), bool)
    key = jax.random.PRNGKey(0)
    want = A.augment_batch(key, imgs, boxes, valid)       # auto -> slice here
    old = A.ROTATE_IMPL
    try:
        A.ROTATE_IMPL = "interpret"
        got = A.augment_batch(key, imgs, boxes, valid)
    finally:
        A.ROTATE_IMPL = old
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-4)
