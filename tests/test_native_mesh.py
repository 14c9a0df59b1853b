"""Native mesh toolchain tests (C++ clean/decimate/smooth via ctypes)."""

import numpy as np
import pytest

from dreamgaussian_tpu.meshing import marching_cubes

native = pytest.importorskip("dreamgaussian_tpu.native")


def sphere_mesh(r=0.6, res=40):
    lin = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    occ = r * r - (x * x + y * y + z * z)
    v, f = marching_cubes(occ, 0.0)
    return v / (res - 1) * 2 - 1, f


def volume(v, f):
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    return np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6


class TestClean:
    def test_weld_duplicates(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1e-9, 0, 0]])
        f = np.array([[0, 1, 2], [3, 1, 2]], dtype=np.int32)
        v2, f2 = native.clean_mesh(v, f, weld_eps=1e-6)
        assert len(v2) == 3
        assert len(f2) == 2  # both faces survive, remapped to same verts

    def test_drop_small_components(self):
        v, f = sphere_mesh()
        # add a far-away lone triangle
        extra_v = np.array([[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]])
        v_all = np.concatenate([v, extra_v])
        f_all = np.concatenate(
            [f, np.array([[len(v), len(v) + 1, len(v) + 2]])]
        ).astype(np.int32)
        v2, f2 = native.clean_mesh(v_all, f_all, min_comp_frac=0.01)
        assert len(f2) == len(f)
        assert v2.max() < 2.0


class TestDecimate:
    def test_volume_preserved(self):
        v, f = sphere_mesh()
        v2, f2 = native.decimate_mesh(v, f, 600)
        assert 500 <= len(f2) <= 650
        assert abs(volume(v2, f2) - volume(v, f)) / abs(volume(v, f)) < 0.1

    def test_watertight_after_decimate(self):
        v, f = sphere_mesh()
        _, f2 = native.decimate_mesh(v, f, 800)
        edges = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
        k = edges[:, 0].astype(np.int64) * 10**6 + edges[:, 1]
        r = edges[:, 1].astype(np.int64) * 10**6 + edges[:, 0]
        assert np.array_equal(np.sort(k), np.sort(r))

    def test_target_larger_than_mesh_is_noop(self):
        v, f = sphere_mesh(res=16)
        v2, f2 = native.decimate_mesh(v, f, 10**6)
        assert len(f2) == len(f)


class TestSmooth:
    def test_shrinks_sphere_slightly(self):
        v, f = sphere_mesh()
        r0 = np.linalg.norm(v, axis=1).mean()
        v2 = native.laplacian_smooth(v, f.astype(np.int32), 3, 0.5)
        r1 = np.linalg.norm(v2, axis=1).mean()
        assert 0.9 * r0 < r1 <= r0 + 1e-9


class TestIsotropicRemesh:
    def test_converges_to_target_edge_length(self):
        from dreamgaussian_tpu.native import isotropic_remesh

        from test_meshing import sphere_grid
        from dreamgaussian_tpu.meshing.marching_cubes import marching_cubes

        occ = sphere_grid(0.6, 24)
        verts, faces = marching_cubes(occ, 0.0)
        verts = np.asarray(verts, float)
        faces = np.asarray(faces)
        target = 0.12 * float(
            np.linalg.norm(verts.max(0) - verts.min(0))
        ) / 10.0
        v2, f2 = isotropic_remesh(verts, faces, target, n_iter=8)
        e = np.concatenate([
            np.linalg.norm(v2[f2[:, i]] - v2[f2[:, (i + 1) % 3]], axis=1)
            for i in range(3)
        ])
        # Most edges inside the Botsch-Kobbelt band [2/3 L, 4/3 L].
        assert ((e > target * 2 / 3) & (e < target * 4 / 3)).mean() > 0.7
        assert abs(float(e.mean()) - target) < 0.35 * target
        # No duplicated directed edge (stays manifold/consistent).
        from collections import Counter

        cnt = Counter()
        for f in f2:
            for k in range(3):
                cnt[(f[k], f[(k + 1) % 3])] += 1
        assert sum(1 for c in cnt.values() if c > 1) == 0
        # Shape preserved: mean radius about the centroid unchanged.
        c0 = verts.mean(0)
        r_old = np.linalg.norm(verts - c0, axis=1).mean()
        r_new = np.linalg.norm(v2 - v2.mean(0), axis=1).mean()
        assert abs(r_new - r_old) / r_old < 0.05
