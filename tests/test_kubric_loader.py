"""Kubric disk-format round-trip: write a synthetic scene in the reference's
on-disk layout (`kubric_multiview_dataset.py:1114-1258`), load it back, and
check geometric consistency."""

import json
import os

import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.datasets.kubric import (
    KubricMultiViewDataset,
    depth_euclidean_to_z,
    load_scene,
    quaternion_to_rotation_matrix,
)


def rotation_to_quaternion(r: np.ndarray) -> np.ndarray:
    """[3,3] -> (w, x, y, z)."""
    w = np.sqrt(max(0, 1 + r[0, 0] + r[1, 1] + r[2, 2])) / 2
    if w > 1e-6:
        x = (r[2, 1] - r[1, 2]) / (4 * w)
        y = (r[0, 2] - r[2, 0]) / (4 * w)
        z = (r[1, 0] - r[0, 1]) / (4 * w)
    else:  # pragma: no cover
        raise ValueError("degenerate quaternion")
    return np.array([w, x, y, z])


def write_kubric_scene(scene, path):
    """Serialize a synthetic Datapoint into the Kubric on-disk format."""
    import imageio.v3 as iio

    os.makedirs(path, exist_ok=True)
    v, t, h, w, _ = scene.video.shape
    n = scene.trajectory_3d.shape[1]
    np.savez(os.path.join(path, "tracks_3d.npz"), tracks_3d=scene.trajectory_3d)
    np.savez(
        os.path.join(path, "tracks_segmentation_ids.npz"),
        tracks_segmentation_ids=np.zeros(n, np.int32),
    )
    np.savez(
        os.path.join(path, "cameras.npz"),
        camera_positions=np.zeros((v, 3)),
        lookat_positions=np.zeros((v, 3)),
    )
    flip = np.diag([1.0, -1.0, -1.0])
    for vi in range(v):
        vp = os.path.join(path, f"view_{vi}")
        os.makedirs(vp, exist_ok=True)
        intr = scene.intrs[vi, 0].astype(np.float64)
        # Loader applies: K_out = diag(w,h,1) @ K_norm @ flip.
        k_norm = np.diag([1.0 / w, 1.0 / h, 1.0]) @ intr @ flip

        positions, quaternions = [], []
        for ti in range(t):
            e_out = scene.extrs[vi, ti].astype(np.float64)
            e_k = flip @ e_out  # loader: E_out = flip @ E_k
            sq = np.eye(4)
            sq[:3] = e_k
            c2w = np.linalg.inv(sq)
            positions.append(c2w[:3, 3])
            quaternions.append(rotation_to_quaternion(c2w[:3, :3]))

        # Depth: write euclidean depth that converts back to our z-depth.
        f_pix = intr[0, 0]
        sensor_width = 1.0
        focal_length = f_pix / w * sensor_width
        ones = np.ones((t, h, w), np.float32)
        rescale = ones[0] / depth_euclidean_to_z(ones, sensor_width, focal_length)[0]
        for ti in range(t):
            rgba = np.concatenate(
                [
                    scene.video[vi, ti].astype(np.uint8),
                    np.full((h, w, 1), 255, np.uint8),
                ],
                axis=-1,
            )
            iio.imwrite(os.path.join(vp, f"rgba_{ti:05d}.png"), rgba)
            eucl = (scene.videodepth[vi, ti] * rescale).astype(np.float32)
            iio.imwrite(os.path.join(vp, f"depth_{ti:05d}.tiff"), eucl)

        np.savez(
            os.path.join(vp, "tracks_2d.npz"),
            tracks_2d=scene.trajectory[vi, :, :, :2].astype(np.float32),
            occlusion=~scene.visibility[vi],
        )
        meta = {
            "camera": {
                "K": k_norm.tolist(),
                "positions": np.asarray(positions).tolist(),
                "quaternions": np.asarray(quaternions).tolist(),
                "sensor_width": sensor_width,
                "focal_length": focal_length,
            },
            "metadata": {"resolution": [w, h]},
        }
        with open(os.path.join(vp, "metadata.json"), "w") as f:
            json.dump(meta, f)


@pytest.fixture(scope="module")
def kubric_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kubric")
    scene = synthetic.render_scene(
        seed=3, n_views=2, n_frames=4, height=32, width=40, n_tracks=10
    )
    write_kubric_scene(scene, str(root / "scene_000"))
    return str(root), scene


def test_quaternion_roundtrip(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    quat = rotation_to_quaternion(q)
    np.testing.assert_allclose(quaternion_to_rotation_matrix(quat), q, atol=1e-8)


def test_load_scene_roundtrip(kubric_dir):
    root, scene = kubric_dir
    raw = load_scene(os.path.join(root, "scene_000"), sanity_check_projection=False)
    np.testing.assert_allclose(raw["tracks_3d"], scene.trajectory_3d, atol=1e-5)
    np.testing.assert_allclose(raw["extrs"], scene.extrs, atol=1e-4)
    np.testing.assert_allclose(raw["intrs"], scene.intrs, atol=1e-3)
    np.testing.assert_allclose(raw["videodepth"], scene.videodepth, atol=1e-3)
    np.testing.assert_allclose(raw["video"], scene.video.astype(np.uint8), atol=1)


def test_load_scene_projection_sanity(kubric_dir):
    """The loader's own projection sanity check must pass (reference
    :1219-1226) — proves K/E conventions are handled exactly."""
    root, scene = kubric_dir
    # The check projects tracks_3d[0,0] and compares to tracks_2d[0,0]:
    # only meaningful if that point is in front of the camera.
    raw = load_scene(os.path.join(root, "scene_000"), sanity_check_projection=True)
    assert raw["video"].shape[0] == 2


def test_dataset_datapoint(kubric_dir):
    root, scene = kubric_dir
    ds = KubricMultiViewDataset(root, num_tracks=4, seed=0)
    assert len(ds) == 1
    dp = ds[0]
    assert dp.video.shape[0] == 2
    assert dp.query_points_3d.shape == (4, 4)
    assert dp.trajectory_3d.shape[1] == 4
    # Query points must coincide with GT tracks at their query frames.
    for i in range(4):
        t0 = int(dp.query_points_3d[i, 0])
        np.testing.assert_allclose(
            dp.query_points_3d[i, 1:], dp.trajectory_3d[t0, i], atol=1e-5
        )


@pytest.fixture(scope="module")
def kubric_dir4(tmp_path_factory):
    root = tmp_path_factory.mktemp("kubric4")
    scene = synthetic.render_scene(
        seed=5, n_views=4, n_frames=3, height=32, width=40, n_tracks=8
    )
    write_kubric_scene(scene, str(root / "scene_000"))
    write_kubric_scene(scene, str(root / "scene_001"))
    return str(root), scene


class TestNameGrammar:
    """Reference name mini-DSL (`kubric_multiview_dataset.py:30-204`)."""

    def test_views_noise_duster_flags(self, kubric_dir4):
        root, _ = kubric_dir4
        ds = KubricMultiViewDataset.from_name(
            "kubric-multiview-v3-views0_2-noise2.5cm-dustercleaned", root
        )
        assert ds.view_subset == [0, 2]
        assert ds.depth_noise_cm == 2.5
        assert ds.depth_source == "duster_cleaned"

    def test_split_single_2dpt_flags(self, kubric_dir4):
        root, _ = kubric_dir4
        ds = KubricMultiViewDataset.from_name(
            "kubric-multiview-v3-training-single-2dpt", root
        )
        assert ds.split == "training"
        assert ds.mode_2d
        assert len(ds.scenes) == 1  # -single restricts to the first scene

        ds2 = KubricMultiViewDataset.from_name(
            "kubric-multiview-v3-overfit-on-training", root
        )
        assert ds2.split == "overfit"
        assert len(ds2.scenes) == 2

    def test_novelviews_held_out_and_attached(self, kubric_dir4):
        root, scene = kubric_dir4
        ds = KubricMultiViewDataset.from_name(
            "kubric-multiview-v3-novelviews1_3", root
        )
        assert ds.novel_view_subset == [1, 3]
        dp = ds[0]
        # inputs exclude views 1 and 3
        assert dp.video.shape[0] == 2
        # novel tensors attached with the held-out views
        assert dp.novel_video.shape[0] == 2
        assert dp.novel_intrs.shape[0] == 2 and dp.novel_extrs.shape[0] == 2
        np.testing.assert_allclose(
            dp.novel_video[0], scene.video[1], atol=2
        )  # uint8 roundtrip tolerance

    def test_dispatch_routes_through_full_grammar(self, kubric_dir4, tmp_path):
        from mvtracker_tpu.datasets.real_world import dataset_from_name

        root, _ = kubric_dir4
        link = tmp_path / "kubric-multiview"
        os.symlink(root, link)
        ds = dataset_from_name("kubric-multiview-v3-views0_1-noise1cm", str(tmp_path))
        assert ds.view_subset == [0, 1]
        assert ds.depth_noise_cm == 1.0


def test_duster_depth_follows_view_subset(kubric_dir4):
    """'-views2_3-duster': estimated depth must come from view_2/view_3
    directories, not view_0/view_1 (post-subset positional indexing paired
    the wrong views' depth with the kept views' RGB/cameras)."""
    root, scene = kubric_dir4
    scene_path = os.path.join(root, sorted(os.listdir(root))[0])
    v, t = scene.videodepth.shape[:2]
    for vi in range(v):
        # Distinct constant per ORIGINAL view id.
        d = np.full((t,) + scene.videodepth.shape[2:], float(vi + 1), np.float32)
        np.save(os.path.join(scene_path, f"view_{vi}", "duster_depth.npy"), d)

    ds = KubricMultiViewDataset.from_name("kubric-multiview-v3-views2_3-duster", root)
    dp = ds[0]
    assert dp.videodepth.shape[0] == 2
    np.testing.assert_array_equal(np.unique(dp.videodepth[0]), [3.0])
    np.testing.assert_array_equal(np.unique(dp.videodepth[1]), [4.0])


def test_track_topup_keeps_static_n(kubric_dir4):
    """Scenes with fewer candidate tracks than num_tracks resample with
    replacement so N stays static (ragged N breaks batched collate)."""
    root, scene = kubric_dir4
    ds = KubricMultiViewDataset(root, num_tracks=64)
    dp = ds[0]
    assert dp.query_points_3d.shape[0] == 64
    assert dp.trajectory_3d.shape[1] == 64


def test_training_split_uses_train_subdir(tmp_path):
    """'-training' switches to the train/ subdirectory when present
    (reference `kubric_multiview_dataset.py:160-164`)."""
    sc = synthetic.render_scene(seed=1, n_views=2, n_frames=3, height=32, width=40, n_tracks=6)
    write_kubric_scene(sc, str(tmp_path / "eval_scene"))
    write_kubric_scene(sc, str(tmp_path / "train" / "train_scene_a"))
    write_kubric_scene(sc, str(tmp_path / "train" / "train_scene_b"))
    ds_eval = KubricMultiViewDataset.from_name("kubric-multiview-v3", str(tmp_path))
    ds_train = KubricMultiViewDataset.from_name("kubric-multiview-v3-training", str(tmp_path))
    assert ds_eval.scenes == ["eval_scene", "train"] or ds_eval.scenes == ["eval_scene"]
    assert sorted(ds_train.scenes) == ["train_scene_a", "train_scene_b"]
