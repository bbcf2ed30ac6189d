"""Camera geometry core (L0): pure-JAX, static-shaped, vmap/jit friendly.

Semantics mirror the reference implementation's geometry layer
(`mvtracker/models/core/model_utils.py:320-482` and `mvtracker/utils/basic.py`
in the reference repo) but are written TPU-first:

- everything is expressed as batched einsums so XLA can fuse and tile
  them onto the MXU;
- matrix inversions are done in float32 regardless of the ambient compute
  dtype (the reference does the same: `mvtracker/mvtracker.py:288-291`);
- no data-dependent Python control flow, no in-place mutation.

Conventions (identical to the reference):
- intrinsics ``K``: [..., 3, 3], pixel coordinates are continuous with the
  center of the top-left pixel at (0, 0);
- extrinsics ``E``: [..., 3, 4] world->camera;
- a depth map sampled with stride ``s`` places the sample for cell (i, j)
  at pixel center ``(j + 0.5) * s - 0.5, (i + 0.5) * s - 0.5``
  (reference `model_utils.py:461-466`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_homogeneous(x: jax.Array) -> jax.Array:
    """Append a constant 1 to the last axis. [..., D] -> [..., D+1]."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(x: jax.Array) -> jax.Array:
    """Drop the last (homogeneous) coordinate. [..., D+1] -> [..., D]."""
    return x[..., :-1]


def extrinsics_square(extrs: jax.Array) -> jax.Array:
    """Pad [..., 3, 4] world->camera extrinsics to a square [..., 4, 4]."""
    batch_shape = extrs.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extrs.dtype), batch_shape + (1, 4)
    )
    return jnp.concatenate([extrs, bottom], axis=-2)


def invert_intrinsics(intrs: jax.Array) -> jax.Array:
    """Invert [..., 3, 3] intrinsics in float32, cast back to input dtype.

    Mirrors reference `mvtracker/mvtracker.py:288` (`torch.inverse(intrs.float())`).
    """
    return jnp.linalg.inv(intrs.astype(jnp.float32)).astype(intrs.dtype)


def invert_extrinsics(extrs: jax.Array) -> jax.Array:
    """Invert [..., 3, 4] world->camera extrinsics to a [..., 4, 4] camera->world.

    Float32 inversion of the squared matrix, as the reference does
    (`mvtracker/mvtracker.py:289-291`).
    """
    sq = extrinsics_square(extrs)
    return jnp.linalg.inv(sq.astype(jnp.float32)).astype(extrs.dtype)


def world_to_pixel_xy_and_camera_z(
    world_xyz: jax.Array, intrs: jax.Array, extrs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Project world points into a camera.

    Mirrors reference `model_utils.py:344-360`
    (`world_space_to_pixel_xy_and_camera_z`), generalized to arbitrary
    leading batch axes.

    Args:
        world_xyz: [*B, N, 3] world-space points.
        intrs: [*B, 3, 3] intrinsics.
        extrs: [*B, 3, 4] world->camera extrinsics.

    Returns:
        pixel_xy: [*B, N, 2]; camera_z: [*B, N, 1].
    """
    world_h = to_homogeneous(world_xyz)  # [*B, N, 4]
    camera_xyz = jnp.einsum("...ij,...nj->...ni", extrs, world_h)
    camera_z = camera_xyz[..., -1:]
    pixel_h = jnp.einsum("...ij,...nj->...ni", intrs, camera_xyz)
    pixel_xy = pixel_h[..., :2] / pixel_h[..., -1:]
    return pixel_xy, camera_z


def pixel_xy_and_camera_z_to_world(
    pixel_xy: jax.Array,
    camera_z: jax.Array,
    intrs_inv: jax.Array,
    extrs_inv: jax.Array,
) -> jax.Array:
    """Lift pixel coordinates + camera-space depth back to world space.

    Mirrors reference `model_utils.py:320-342`
    (`pixel_xy_and_camera_z_to_world_space`).

    Args:
        pixel_xy: [*B, N, 2].
        camera_z: [*B, N, 1].
        intrs_inv: [*B, 3, 3] inverse intrinsics.
        extrs_inv: [*B, 4, 4] camera->world.

    Returns:
        world_xyz: [*B, N, 3].
    """
    pixel_h = to_homogeneous(pixel_xy)  # [*B, N, 3]
    camera_xyz = jnp.einsum("...ij,...nj->...ni", intrs_inv, pixel_h) * camera_z
    camera_h = to_homogeneous(camera_xyz)
    world_h = jnp.einsum("...ij,...nj->...ni", extrs_inv, camera_h)
    return world_h[..., :3]


def pixel_grid(height: int, width: int, stride: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-center coordinates of a strided sampling grid, in xy order.

    Mirrors reference `model_utils.py:461-466`: cell (i, j) maps to pixel
    ``((j + 0.5) * stride - 0.5, (i + 0.5) * stride - 0.5)``.

    Returns: [H, W, 2] (x, y).
    """
    ys = (jnp.arange(height, dtype=dtype) + 0.5) * stride - 0.5
    xs = (jnp.arange(width, dtype=dtype) + 0.5) * stride - 0.5
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx, yy], axis=-1)


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool over the last two axes of [..., H, W]."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    return x.mean(axis=(-3, -1))


def nearest_downsample_2x(x: jax.Array) -> jax.Array:
    """Nearest 2x downsample over the last two axes: picks even indices.

    Equivalent to the reference's `F.interpolate(scale_factor=0.5,
    mode='nearest')` on depth maps (`model_utils.py:444-447`).
    """
    return x[..., ::2, ::2]


def nearest_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Nearest downsample over the last two axes by an integer factor.

    For factor f, output[i] = input[floor(i * f)] = input[i * f], which
    matches `F.interpolate(scale_factor=1/f, mode='nearest')`.
    """
    return x[..., ::factor, ::factor]


def unproject_depth_to_world(
    depths: jax.Array,  # [*B, H, W]
    intrs_inv: jax.Array,  # [*B, 3, 3]
    extrs_inv: jax.Array,  # [*B, 4, 4]
    stride: int,
) -> jax.Array:
    """Unproject a (strided) depth map to world-space xyz per pixel.

    This is the geometric core of the fused point cloud construction
    (reference `model_utils.py:461-473`). Returns [*B, H, W, 3].
    """
    *lead, h, w = depths.shape
    grid = pixel_grid(h, w, stride, dtype=jnp.float32).astype(depths.dtype)
    grid_h = to_homogeneous(grid)  # [H, W, 3]
    cam = jnp.einsum("...ij,hwj->...hwi", intrs_inv, grid_h)
    cam = cam * depths[..., None]
    cam_h = to_homogeneous(cam)
    world_h = jnp.einsum("...ij,...hwj->...hwi", extrs_inv, cam_h)
    return world_h[..., :3]


def init_pointcloud_from_rgbd(
    fmaps: jax.Array,  # [B, V, S, H, W, C]  (channels-last!)
    depths: jax.Array,  # [B, V, S, H, W]
    intrs: jax.Array,  # [B, V, S, 3, 3]
    extrs: jax.Array,  # [B, V, S, 3, 4]
    stride: int = 4,
    level: int = 0,
    return_validity_mask: bool = False,
):
    """Fuse per-view feature maps + depths into a world-space feature cloud.

    TPU-native re-design of reference `model_utils.py:420-482`
    (`init_pointcloud_from_rgbd`): same math — average-pool features and
    nearest-downsample depths to pyramid `level`, unproject through inverse
    intrinsics/extrinsics, flatten views into one cloud per (batch, frame) —
    but channels-last, purely functional, and fully einsum-based.

    Returns:
        xyz:  [B*S, V*H'*W', 3]
        fvec: [B*S, V*H'*W', C]
        (optional) valid: [B*S, V*H'*W'] bool, true where depth > 0.

    Note the flattening order is (V, H, W) within a frame and (B, S) across
    frames — identical to the reference's
    ``permute(0, 2, 1, 3, 4, 5).reshape(B * S, V * H * W, ...)``.
    """
    b, v, s, h, w, c = fmaps.shape
    assert depths.shape == (b, v, s, h, w)

    for _ in range(level):
        # Pool over the trailing spatial axes; fmaps are channels-last so we
        # pool on axes (-3, -2) via a transpose-free reshape trick.
        fmaps = fmaps.reshape(b, v, s, h // 2, 2, w // 2, 2, c).mean(axis=(4, 6))
        depths = nearest_downsample_2x(depths)
        h, w = h // 2, w // 2
    lvl_stride = stride * (2**level)

    intrs_inv = invert_intrinsics(intrs)
    extrs_inv = invert_extrinsics(extrs)

    world_xyz = unproject_depth_to_world(depths, intrs_inv, extrs_inv, lvl_stride)
    # [B, V, S, H, W, 3] -> [B, S, V, H, W, 3] -> [B*S, V*H*W, 3]
    xyz = world_xyz.transpose(0, 2, 1, 3, 4, 5).reshape(b * s, v * h * w, 3)
    fvec = fmaps.transpose(0, 2, 1, 3, 4, 5).reshape(b * s, v * h * w, c)

    if return_validity_mask:
        valid = (depths > 0).transpose(0, 2, 1, 3, 4).reshape(b * s, v * h * w)
        return xyz, fvec, valid
    return xyz, fvec


def reprojection_roundtrip_dev(
    world_xyz: jax.Array, intrs: jax.Array, extrs: jax.Array
) -> jax.Array:
    """Max |world -> (pixel xy, camera z) -> world| deviation over all views.

    Runtime sanity guard on the projection algebra: the reference computes
    this round trip on every train step (`cli/train.py:194-204`) and eval
    sequence (`evaluator_3dpt.py:569`) and WARNS beyond atol=1 (it does not
    abort). A blow-up here means intrinsics/extrinsics are being mis-applied
    somewhere upstream — or the predictions themselves diverged (f32
    round-trip error scales with |coords|).

    Points with |camera z| < 1e-3 are excluded: the round trip divides and
    re-multiplies by z, so near-camera-plane points amplify fp error without
    indicating a real calibration bug.

    Args:
        world_xyz: [*B, N, 3] predicted world points.
        intrs: [V, *B, 3, 3]; extrs: [V, *B, 3, 4] (leading view axis).

    Returns:
        scalar max absolute deviation (0 when every point is excluded).
    """
    pix, z = world_to_pixel_xy_and_camera_z(world_xyz[None], intrs, extrs)
    back = pixel_xy_and_camera_z_to_world(
        pix, z, invert_intrinsics(intrs), invert_extrinsics(extrs)
    )
    dev = jnp.abs(back - world_xyz[None]).max(axis=-1)
    ok = jnp.abs(z[..., 0]) > 1e-3
    return jnp.max(jnp.where(ok, dev, 0.0))


def get_points_on_a_grid(
    size: int,
    extent: tuple[float, float],
    center: tuple[float, float] | None = None,
) -> jax.Array:
    """Uniform grid of size*size 2D points covering `extent` with margin W/64.

    Mirrors reference `model_utils.py:361-417` (`get_points_on_a_grid`).
    Returns [1, size*size, 2] in (x, y) order.
    """
    if size == 1:
        return jnp.asarray([[[extent[1] / 2, extent[0] / 2]]], dtype=jnp.float32)
    if center is None:
        center = (extent[0] / 2, extent[1] / 2)
    margin = extent[1] / 64
    range_y = (margin - extent[0] / 2 + center[0], extent[0] / 2 + center[0] - margin)
    range_x = (margin - extent[1] / 2 + center[1], extent[1] / 2 + center[1] - margin)
    grid_y, grid_x = jnp.meshgrid(
        jnp.linspace(range_y[0], range_y[1], size),
        jnp.linspace(range_x[0], range_x[1], size),
        indexing="ij",
    )
    return jnp.stack([grid_x, grid_y], axis=-1).reshape(1, -1, 2)


def bilinear_sample2d(
    im: jax.Array,  # [B, H, W, C] channels-last
    x: jax.Array,  # [B, N]
    y: jax.Array,  # [B, N]
) -> jax.Array:
    """Bilinearly sample feature maps at continuous pixel locations.

    Equivalent to reference `model_utils.py:81-186` (`bilinear_sample2d`),
    channels-last. Out-of-range coordinates are clamped.

    Returns [B, N, C].
    """
    b, h, w, c = im.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x1.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y1.astype(jnp.int32), 0, h - 1)

    def gather(yy, xx):
        flat = im.reshape(b, h * w, c)
        idx = yy * w + xx  # [B, N]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def reduce_masked_mean(
    x: jax.Array, mask: jax.Array, axis=None, keepdims: bool = False, eps: float = 1e-6
) -> jax.Array:
    """Mean of `x` over entries where `mask` is nonzero.

    Mirrors reference `model_utils.py:63-79` (`reduce_masked_mean`).
    """
    mask = mask.astype(x.dtype)
    prod = x * mask
    numer = jnp.sum(prod, axis=axis, keepdims=keepdims)
    denom = jnp.sum(mask, axis=axis, keepdims=keepdims) + eps
    return numer / denom
