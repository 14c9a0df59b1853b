"""Unit tests for SH, quaternion/covariance, KNN, camera, config, PLY."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.ops import sh as sh_ops
from dreamgaussian_tpu.ops import quat as quat_ops
from dreamgaussian_tpu.ops.knn import mean_knn_sq_dist
from dreamgaussian_tpu.utils import camera as cam
from dreamgaussian_tpu.utils import config as cfg
from dreamgaussian_tpu.utils import ply as ply_io


class TestSH:
    def test_degree0_is_dc(self):
        rng = np.random.default_rng(0)
        coeffs = jnp.asarray(rng.normal(size=(5, 1, 3)).astype(np.float32))
        dirs = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        out = sh_ops.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh_ops.SH_C0 * coeffs[:, 0, :], rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.asarray([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(
            sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(rgb)), rgb, rtol=1e-6
        )

    @pytest.mark.parametrize("deg", [1, 2, 3, 4])
    def test_matches_scipy_sph_harm(self, deg):
        # Real SH from complex scipy harmonics: check one basis function per
        # degree (l=deg, m=0 has the simple form sqrt((2l+1)/4pi) P_l(cos th)).
        from scipy.special import sph_harm_y

        rng = np.random.default_rng(1)
        d = rng.normal(size=(10, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        theta = np.arccos(d[:, 2])
        phi = np.arctan2(d[:, 1], d[:, 0])
        k = (deg + 1) ** 2
        coeffs = np.zeros((10, k, 3), dtype=np.float32)
        # isolate the (l=deg, m=0) coefficient (z-axis polynomial entries).
        m0_index = deg * deg + deg
        coeffs[:, m0_index, 0] = 1.0
        out = np.asarray(sh_ops.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(d)))
        expected = np.real(sph_harm_y(deg, 0, theta, phi))
        np.testing.assert_allclose(out[:, 0], expected, rtol=1e-4, atol=1e-5)


class TestQuat:
    def test_identity(self):
        q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(quat_ops.quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)

    def test_rotation_properties(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        R = quat_ops.quat_to_rotmat(quat_ops.normalize_quat(q))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(3)
        q = rng.normal(size=(8, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        ours = np.asarray(quat_ops.quat_to_rotmat(jnp.asarray(q, dtype=jnp.float32)))
        # scipy uses xyzw order.
        theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_covariance_psd_and_eigvals(self):
        rng = np.random.default_rng(4)
        scale = jnp.asarray(np.abs(rng.normal(size=(8, 3))).astype(np.float32) + 0.1)
        q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        cov = quat_ops.build_covariance(scale, q)
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(
            np.sort(eig, axis=-1), np.sort(np.asarray(scale) ** 2, axis=-1), rtol=1e-3
        )

    def test_gaussian_3d_weight_isotropic(self):
        cov6 = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0, 1.0]])
        offs = jnp.asarray([[1.0, 0.0, 0.0]])
        w = quat_ops.gaussian_3d_weight(offs, cov6)
        np.testing.assert_allclose(w, math.exp(-0.5), rtol=1e-5)


class TestKNN:
    def test_matches_scipy_kdtree(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(5)
        pts = rng.normal(size=(700, 3)).astype(np.float32)
        ours = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), k=3, block_size=256))
        dists, _ = cKDTree(pts).query(pts, k=4)  # includes self at index 0
        expected = np.mean(dists[:, 1:] ** 2, axis=-1)
        np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-5)


class TestCamera:
    def test_orbit_front_view(self):
        pose = cam.orbit_camera(0.0, 0.0, 2.0)
        np.testing.assert_allclose(pose[:3, 3], [0, 0, 2], atol=1e-6)
        np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-6)

    def test_orbit_elevation_sign(self):
        # positive elevation puts the camera below +y (reference convention).
        pose = cam.orbit_camera(30.0, 0.0, 2.0)
        assert pose[1, 3] < 0

    def test_camera_center_quirk(self):
        pose = cam.orbit_camera(10.0, 40.0, 2.0)
        c = cam.Camera.from_pose(pose, 64, 64, math.radians(49.1), math.radians(49.1))
        np.testing.assert_allclose(c.campos, -pose[:3, 3], atol=1e-6)

    def test_projection_of_origin(self):
        # Origin should project to image center with depth = radius.
        pose = cam.orbit_camera(20.0, -50.0, 2.0)
        c = cam.Camera.from_pose(pose, 128, 128, math.radians(49.1), math.radians(49.1))
        p = np.array([0.0, 0.0, 0.0, 1.0])
        view_p = c.view @ p
        np.testing.assert_allclose(view_p[2], 2.0, atol=1e-5)
        hom = c.full_proj @ p
        ndc = hom[:2] / hom[3]
        np.testing.assert_allclose(ndc, [0, 0], atol=1e-5)

    def test_full_proj_composition(self):
        pose = cam.orbit_camera(15.0, 75.0, 2.0)
        c = cam.Camera.from_pose(pose, 64, 64, 0.8, 0.9)
        proj = cam.gs_projection(c.znear, c.zfar, 0.9, 0.8)
        np.testing.assert_allclose(c.full_proj, proj @ c.view, atol=1e-6)

    def test_orbit_camera_class(self):
        oc = cam.OrbitCamera(64, 64, r=2.0, fovy=49.1)
        np.testing.assert_allclose(oc.pose[:3, 3], [0, 0, 2], atol=1e-6)
        assert oc.perspective[1, 1] < 0  # flipped y row
        oc.scale(1.0)
        assert oc.radius < 2.0


class TestConfig:
    def test_yaml_and_cli_merge(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: 1\nb: hello\nnested:\n  x: 2.5\nmandatory: ???\n")
        conf = cfg.load_with_cli(str(p), ["a=7", "nested.x=1e-3", "new=true"])
        assert conf.a == 7
        assert conf.b == "hello"
        assert conf.nested.x == 1e-3
        assert conf.new is True
        with pytest.raises(ValueError):
            _ = conf.mandatory
        assert conf.get("missing", 5) == 5

    def test_none_values(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("input:\nprompt:\n")
        conf = cfg.load(str(p))
        assert conf.input is None


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(6)
        cols = {
            "x": rng.normal(size=10), "y": rng.normal(size=10),
            "opacity": rng.normal(size=10),
        }
        arr = ply_io.structured_from_columns(cols)
        path = str(tmp_path / "t.ply")
        ply_io.write_ply(path, {"vertex": arr})
        back = ply_io.read_ply(path)["vertex"]
        for k in cols:
            np.testing.assert_allclose(back[k], cols[k].astype(np.float32), rtol=1e-6)

    def test_roundtrip_ascii(self, tmp_path):
        arr = ply_io.structured_from_columns({"x": np.array([1.0, 2.0])})
        path = str(tmp_path / "t.ply")
        ply_io.write_ply(path, {"vertex": arr}, binary=False)
        back = ply_io.read_ply(path)["vertex"]
        np.testing.assert_allclose(back["x"], [1.0, 2.0])
