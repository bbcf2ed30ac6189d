"""GT-visibility correctness for the synthetic benchmark (VERDICT r2 #1a).

The occlusion-accuracy ceiling of any model on this benchmark is set by the
correctness of the ground-truth visibility labels. These tests pin the
analytic (exact) visibility against hand-constructed occlusion geometry and
against the z-buffer sampling it replaces.
"""

import numpy as np

from mvtracker_tpu.datasets import synthetic


def _single_cam(cam_pos, target, w=64, h=64, f=None):
    intr = np.array(
        [[f or w, 0, w / 2], [0, f or w, h / 2], [0, 0, 1]], np.float32
    )
    extr = synthetic._look_at(np.asarray(cam_pos, float), np.asarray(target, float))
    return intr[None, None], extr.astype(np.float32)[None, None]  # [V=1,T=1,...]


def test_occluded_by_construction_sphere_point():
    """A point on the far sphere's camera-facing side, with another sphere
    directly on the line of sight, MUST be labeled occluded; removing the
    occluder must make it visible."""
    intrs, extrs = _single_cam([4.0, 0.0, 0.7], [0.0, 0.0, 0.7])
    centers = np.array([[[0.0, 0.0, 0.7]], [[2.0, 0.0, 0.7]]])  # [O=2, T=1, 3]
    radii = np.array([0.4, 0.3])
    # Camera-facing point on sphere 0 (the reference geometry puts track
    # points at 0.999 * r).
    p = np.array([[[0.4 * 0.999, 0.0, 0.7]]])  # [T=1, N=1, 3]
    obj = np.array([0])

    vis = synthetic.analytic_visibility(p, obj, centers, radii, intrs, extrs, 64, 64)
    assert vis.shape == (1, 1, 1)
    assert not vis[0, 0, 0], "occluder on the line of sight must occlude"

    # Move the occluder off the line of sight -> visible.
    centers_clear = np.array([[[0.0, 0.0, 0.7]], [[2.0, 1.5, 0.7]]])
    vis2 = synthetic.analytic_visibility(
        p, obj, centers_clear, radii, intrs, extrs, 64, 64
    )
    assert vis2[0, 0, 0]


def test_self_occlusion_back_hemisphere():
    intrs, extrs = _single_cam([4.0, 0.0, 0.7], [0.0, 0.0, 0.7])
    centers = np.array([[[0.0, 0.0, 0.7]]])
    radii = np.array([0.4])
    back = np.array([[[-0.4 * 0.999, 0.0, 0.7]]])  # far side of the sphere
    front = np.array([[[0.4 * 0.999, 0.0, 0.7]]])
    obj = np.array([0])
    assert not synthetic.analytic_visibility(
        back, obj, centers, radii, intrs, extrs, 64, 64
    )[0, 0, 0]
    assert synthetic.analytic_visibility(
        front, obj, centers, radii, intrs, extrs, 64, 64
    )[0, 0, 0]


def test_ground_plane_occludes_submerged_point():
    """A sphere dipping below z=0: its bottom point is behind the rendered
    ground from any camera above the plane."""
    intrs, extrs = _single_cam([4.0, 0.0, 1.5], [0.0, 0.0, 0.0])
    centers = np.array([[[0.0, 0.0, 0.2]]])
    radii = np.array([0.5])
    bottom = np.array([[[0.0, 0.0, 0.2 - 0.5 * 0.999]]])  # z ~ -0.3
    obj = np.array([0])
    assert not synthetic.analytic_visibility(
        bottom, obj, centers, radii, intrs, extrs, 64, 64
    )[0, 0, 0]


def test_out_of_bounds_is_invisible():
    intrs, extrs = _single_cam([4.0, 0.0, 0.7], [0.0, 0.0, 0.7])
    centers = np.array([[[0.0, 20.0, 0.7]]])  # far off-axis: projects outside
    radii = np.array([0.4])
    p = centers[:, 0] + np.array([[0.4 * 0.999, 0.0, 0.0]])
    obj = np.array([0])
    assert not synthetic.analytic_visibility(
        p[None], obj, centers, radii, intrs, extrs, 64, 64
    )[0, 0, 0]


def test_analytic_matches_high_res_zbuffer():
    """Away from silhouettes the z-buffer agrees with the analytic labels.
    The residual disagreement is the silhouette band, in BOTH directions:
    the +0.05 camera-z tolerance marks just-behind-the-horizon points
    visible, and the diverging depth gradient at grazing incidence makes
    the rounded-pixel depth lookup mark truly visible limb points occluded.
    Measured on seed 3: ~4.4% disagreement at 256px, ~10% at 64px — that
    10% label-noise rate is what capped occlusion accuracy in rounds 1-2."""
    hi = synthetic.render_scene(
        seed=3, n_views=3, n_frames=4, height=256, width=256, n_tracks=64,
        use_analytic_visibility=False,
    )
    ana = synthetic.render_scene(
        seed=3, n_views=3, n_frames=4, height=256, width=256, n_tracks=64,
        use_analytic_visibility=True,
    )
    agree = (hi.visibility == ana.visibility).mean()
    assert agree > 0.93, f"analytic vs 256px z-buffer agreement {agree:.3f}"

    lo = synthetic.render_scene(
        seed=3, n_views=3, n_frames=4, height=64, width=64, n_tracks=64,
        use_analytic_visibility=False,
    )
    lo_ana = synthetic.render_scene(
        seed=3, n_views=3, n_frames=4, height=64, width=64, n_tracks=64,
        use_analytic_visibility=True,
    )
    # Analytic labels are resolution-independent (geometry only).
    assert (lo_ana.visibility == ana.visibility).all()
    lo_agree = (lo.visibility == lo_ana.visibility).mean()
    assert lo_agree < agree  # z-buffer noise grows as resolution drops ...
    assert lo_agree > 0.80  # ... but stays bounded


def test_render_scene_query_frames_consistent_with_analytic_labels():
    dp = synthetic.render_scene(seed=5, n_views=4, n_frames=8, height=64, width=64,
                                n_tracks=32)
    vis_any = dp.visibility.any(axis=0)
    qt = dp.query_points_3d[:, 0].astype(int)
    has_vis = vis_any.any(axis=0)
    # Queries sit at the first any-view-visible frame whenever one exists.
    for n in range(32):
        if has_vis[n]:
            assert vis_any[qt[n], n]
            assert not vis_any[: qt[n], n].any()
