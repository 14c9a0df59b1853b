"""Mesh rasterizer tests: Pallas z-test vs dense oracle, deferred grads."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamgaussian_tpu.ops.mesh_raster import (
    RastOut,
    interpolate,
    rasterize,
    sample_texture,
)


def dense_rasterize(v_clip, faces, width, height):
    """O(F * H * W) oracle with the same conventions."""
    v_clip = np.asarray(v_clip)
    faces = np.asarray(faces)
    w = v_clip[:, 3:4]
    ndc = v_clip[:, :3] / w
    xy = ((ndc[:, :2] + 1.0) * np.array([width, height]) - 1.0) * 0.5
    z = ndc[:, 2]

    tri_id = np.zeros((height, width), np.int32)
    zbuf = np.full((height, width), np.inf)
    ys, xs = np.mgrid[0:height, 0:width]
    for fi, f in enumerate(faces):
        p = xy[f]
        e0 = (p[2, 0] - p[1, 0]) * (ys - p[1, 1]) - (p[2, 1] - p[1, 1]) * (xs - p[1, 0])
        e1 = (p[0, 0] - p[2, 0]) * (ys - p[2, 1]) - (p[0, 1] - p[2, 1]) * (xs - p[2, 0])
        e2 = (p[1, 0] - p[0, 0]) * (ys - p[0, 1]) - (p[1, 1] - p[0, 1]) * (xs - p[0, 0])
        area = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - (
            p[1, 1] - p[0, 1]
        ) * (p[2, 0] - p[0, 0])
        if area == 0:
            continue
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) if area > 0 else (
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        )
        zf = (e0 * z[f[0]] + e1 * z[f[1]] + e2 * z[f[2]]) / area
        upd = inside & (zf < zbuf)
        zbuf[upd] = zf[upd]
        tri_id[upd] = fi + 1
    zbuf[tri_id == 0] = 0
    return tri_id, zbuf


def simple_scene():
    """Two overlapping triangles at different depths, w=1 (ortho-like)."""
    v = jnp.asarray([
        # near triangle (z=0.2), covers left
        [-0.8, -0.8, 0.2, 1.0],
        [0.4, -0.8, 0.2, 1.0],
        [-0.2, 0.8, 0.2, 1.0],
        # far triangle (z=0.6), covers right
        [-0.4, -0.6, 0.6, 1.0],
        [0.8, -0.6, 0.6, 1.0],
        [0.2, 0.9, 0.6, 1.0],
    ])
    f = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    return v, f


class TestRasterize:
    def test_matches_dense_oracle(self):
        v, f = simple_scene()
        out = rasterize(v, f, 64, 64, tile=32, max_tiles=4)
        ref_id, ref_z = dense_rasterize(v, f, 64, 64)
        np.testing.assert_array_equal(np.asarray(out.tri_id), ref_id)
        np.testing.assert_allclose(np.asarray(out.zbuf), ref_z, atol=1e-5)

    def test_perspective_scene_matches(self):
        rng = np.random.default_rng(0)
        nv = 30
        v3 = rng.normal(size=(nv, 3)) * 0.4
        w = 2.0 + v3[:, 2]
        v_clip = np.concatenate(
            [v3[:, :2] * 1.5, (w * 0.5 + v3[:, 2:3] * 0.1), w[:, None]],
            axis=1,
        ).astype(np.float32)
        f = rng.integers(0, nv, size=(20, 3)).astype(np.int32)
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        f = f[ok]
        out = rasterize(jnp.asarray(v_clip), jnp.asarray(f), 64, 64,
                        tile=32, max_tiles=4)
        ref_id, ref_z = dense_rasterize(v_clip, f, 64, 64)
        same = (np.asarray(out.tri_id) == ref_id)
        # allow tiny disagreement at exact shared edges
        assert same.mean() > 0.995

    def test_bary_sums_to_one_on_coverage(self):
        v, f = simple_scene()
        out = rasterize(v, f, 64, 64, tile=32, max_tiles=4)
        s = np.asarray(out.bary.sum(-1))
        m = np.asarray(out.mask)
        np.testing.assert_allclose(s[m], 1.0, atol=1e-5)
        assert (s[~m] == 0).all()

    def test_empty_scene(self):
        v = jnp.zeros((3, 4)).at[:, 3].set(1.0)
        f = jnp.asarray([[0, 1, 2]], jnp.int32)
        out = rasterize(v, f, 32, 32, tile=32, max_tiles=4)
        assert not bool(out.mask.any())


class TestInterpolate:
    def test_vertex_colors(self):
        v, f = simple_scene()
        colors = jnp.asarray(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1],
             [1, 1, 0], [0, 1, 1], [1, 0, 1]], jnp.float32
        )
        out = rasterize(v, f, 64, 64, tile=32, max_tiles=4)
        img = interpolate(colors, f, out)
        m = np.asarray(out.mask)
        img_np = np.asarray(img)
        assert (img_np[m].sum(-1) > 0.99).all()
        assert (img_np[~m] == 0).all()

    def test_attr_gradients_flow(self):
        v, f = simple_scene()
        out = rasterize(v, f, 64, 64, tile=32, max_tiles=4)

        def loss(colors):
            return jnp.sum(interpolate(colors, f, out) ** 2)

        g = jax.grad(loss)(jnp.ones((6, 3)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_vertex_position_gradients_flow(self):
        v, f = simple_scene()
        colors = jnp.asarray(np.random.default_rng(0).random((6, 3)),
                             jnp.float32)

        def loss(verts):
            out = rasterize(verts, f, 64, 64, tile=32, max_tiles=4)
            return jnp.sum(interpolate(colors, f, out) ** 2)

        g = jax.grad(loss)(v)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)[:, :2]).max() > 0


class TestTexture:
    def test_bilinear_exact_on_grid(self):
        tex = jnp.arange(16.0).reshape(4, 4, 1)
        uv = jnp.asarray([[[1.0 / 3.0, 2.0 / 3.0]]])  # texel (x=1, y=2)
        out = sample_texture(tex, uv)
        np.testing.assert_allclose(float(out[0, 0, 0]), 9.0, atol=1e-5)

    def test_gradients_to_texture(self):
        uv = jnp.asarray(np.random.default_rng(0).random((8, 8, 2)),
                         jnp.float32)

        def loss(tex):
            return jnp.sum(sample_texture(tex, uv) ** 2)

        g = jax.grad(loss)(jnp.ones((16, 16, 3)))
        assert np.abs(np.asarray(g)).sum() > 0


class TestMipmap:
    """linear-mipmap-linear sampling: LOD selection, antialiasing, grads."""

    def _quad(self):
        # One screen-filling quad (two triangles), w=1.
        v = jnp.asarray([
            [-1.0, -1.0, 0.5, 1.0],
            [1.0, -1.0, 0.5, 1.0],
            [1.0, 1.0, 0.5, 1.0],
            [-1.0, 1.0, 0.5, 1.0],
        ])
        f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        vt = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        return v, f, vt

    def test_mip_chain_shapes_and_mean(self):
        from dreamgaussian_tpu.ops.mesh_raster import build_mip_chain

        tex = jnp.asarray(
            np.random.default_rng(0).random((64, 64, 3)), jnp.float32
        )
        chain = build_mip_chain(tex, min_size=4)
        assert [c.shape[0] for c in chain] == [64, 32, 16, 8, 4]
        for c in chain:  # average pooling preserves the mean
            np.testing.assert_allclose(
                float(c.mean()), float(tex.mean()), atol=1e-5
            )

    def test_minified_checker_antialiases(self):
        """A 64-texel checker rendered into 32 px: bilinear aliases
        (near-binary pixels), mipmap converges toward the 0.5 mean."""
        from dreamgaussian_tpu.ops.mesh_raster import (
            build_mip_chain,
            interpolate_with_derivs,
            sample_texture_mip,
        )

        v, f, vt = self._quad()
        size = 32
        checker = (np.indices((64, 64)).sum(0) % 2).astype(np.float32)
        tex = jnp.asarray(np.repeat(checker[..., None], 3, -1))

        rast = rasterize(v, f, size, size, derivs=True)
        uv, uv_dx, uv_dy = interpolate_with_derivs(vt, f, rast)
        mip = sample_texture_mip(build_mip_chain(tex), uv, uv_dx, uv_dy)
        bil = sample_texture(tex, uv)
        m = np.asarray(rast.mask)
        assert m.all()
        # LOD = log2(64/32) = 1 -> second mip (all 0.5) dominates.
        mip_dev = np.abs(np.asarray(mip)[..., 0] - 0.5).mean()
        bil_dev = np.abs(np.asarray(bil)[..., 0] - 0.5).mean()
        assert mip_dev < 0.1 < bil_dev

    def test_magnified_matches_bilinear(self):
        """At magnification (LOD <= 0), mip sampling == bilinear."""
        from dreamgaussian_tpu.ops.mesh_raster import (
            build_mip_chain,
            interpolate_with_derivs,
            sample_texture_mip,
        )

        v, f, vt = self._quad()
        size = 64
        tex = jnp.asarray(
            np.random.default_rng(1).random((16, 16, 3)), jnp.float32
        )
        rast = rasterize(v, f, size, size, derivs=True)
        uv, uv_dx, uv_dy = interpolate_with_derivs(vt, f, rast)
        mip = sample_texture_mip(build_mip_chain(tex), uv, uv_dx, uv_dy)
        bil = sample_texture(tex, uv)
        np.testing.assert_allclose(np.asarray(mip), np.asarray(bil), atol=1e-5)

    def test_gradients_flow_through_pyramid(self):
        from dreamgaussian_tpu.ops.mesh_raster import (
            build_mip_chain,
            interpolate_with_derivs,
            sample_texture_mip,
        )

        v, f, vt = self._quad()
        size = 32
        rast = rasterize(v, f, size, size, derivs=True)
        uv, uv_dx, uv_dy = interpolate_with_derivs(vt, f, rast)

        def loss(tex):
            out = sample_texture_mip(build_mip_chain(tex), uv, uv_dx, uv_dy)
            return jnp.sum((out - 0.3) ** 2)

        tex = jnp.full((64, 64, 3), 0.6)
        g = jax.grad(loss)(tex)
        assert np.isfinite(np.asarray(g)).all()
        # Minified: gradient spreads across MANY texels via the pyramid.
        assert (np.abs(np.asarray(g)) > 1e-8).mean() > 0.9

    def test_render_mesh_mipmap_end_to_end(self):
        """render_mesh default filter runs and is differentiable."""
        from dreamgaussian_tpu.render.mesh_renderer import (
            MeshRendererState, render_mesh, trunc_rev_sigmoid,
        )

        rng = np.random.default_rng(2)
        v, f, vt = self._quad()
        state = MeshRendererState(
            v=v[:, :3], f=f, vn=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (4, 1)),
            vt=vt, ft=f,
            raw_albedo=trunc_rev_sigmoid(
                jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
            ),
            v_offsets=jnp.zeros((4, 3)),
        )
        cam = {
            "view": jnp.eye(4), "full_proj": jnp.eye(4),
        }

        def loss(raw):
            out = render_mesh(
                state._replace(raw_albedo=raw), cam, jnp.eye(3), 32, 32,
            )
            return jnp.sum(out["image"] ** 2)

        g = jax.grad(loss)(state.raw_albedo)
        assert np.isfinite(np.asarray(g)).all()
        assert float(np.abs(np.asarray(g)).max()) > 0


class TestAntialias:
    """Analytic silhouette edge AA (nvdiffrast dr.antialias analogue)."""

    def _tri(self, shift=0.0):
        # One big near-vertical-edged triangle over background.
        v = jnp.asarray([
            [-0.7 + shift, -0.9, 0.0, 1.0],
            [0.5 + shift, -0.9, 0.0, 1.0],
            [0.5 + shift, 0.9, 0.0, 1.0],
        ])
        f = jnp.asarray([[0, 1, 2]], jnp.int32)
        return v, f

    def test_reduces_error_vs_supersampled_coverage(self):
        from dreamgaussian_tpu.ops.mesh_raster import antialias

        size = 64
        v, f = self._tri(shift=0.013)  # edge off pixel centers
        rast = rasterize(v, f, size, size, tile=32, max_tiles=4)
        hard = rast.mask.astype(jnp.float32)[..., None]
        aa = antialias(hard, rast, v, f, size, size)

        # 8x supersampled coverage oracle.
        ss = 8
        rast_ss = rasterize(v, f, size * ss, size * ss, tile=32,
                            max_tiles=256)  # one tri spans ~140 tiles
        cov = np.asarray(rast_ss.mask, np.float32).reshape(
            size, ss, size, ss
        ).mean((1, 3))[..., None]

        err_hard = float(np.abs(np.asarray(hard) - cov).sum())
        err_aa = float(np.abs(np.asarray(aa) - cov).sum())
        assert err_aa < 0.55 * err_hard, (err_aa, err_hard)
        # AA only moves mass at edges; interior/background untouched.
        changed = np.abs(np.asarray(aa - hard))[..., 0] > 0
        assert changed.sum() <= 3 * size

    def test_gradient_reaches_silhouette_vertices(self):
        """For flat colors, coverage is the ONLY gradient path to the
        vertices; without AA it is identically zero."""
        from dreamgaussian_tpu.ops.mesh_raster import antialias

        size = 64

        def mean_img(shift, use_aa, edge_only):
            v, f = self._tri(0.013)
            # edge_only: move just the vertical right edge (verts 1, 2)
            # -> true d(coverage)/d(shift) = edge height * image width
            # fraction; else translate everything -> true derivative 0.
            d = jnp.asarray([0.0, 1.0, 1.0])[:, None] if edge_only else 1.0
            v = v.at[:, 0].add(shift * (d[..., 0] if edge_only else 1.0))
            rast = rasterize(v, f, size, size, tile=32, max_tiles=4)
            col = rast.mask.astype(jnp.float32)[..., None]
            col = jax.lax.stop_gradient(col)
            if use_aa:
                col = antialias(col, rast, v, f, size, size)
            return jnp.mean(col)

        g_no = jax.grad(lambda s: mean_img(s, False, True))(0.0)
        g_aa = jax.grad(lambda s: mean_img(s, True, True))(0.0)
        assert float(jnp.abs(g_no)) < 1e-12
        # Analytic area rate: dA/ds = height/2 = 0.9 ndc^2 (the right
        # edge translates, the hypotenuse rotates about v0 and takes
        # half back); ndc area 4 == full image -> 0.225 mean/unit.
        true = 0.225
        assert abs(float(g_aa) - true) < 0.25 * true, (float(g_aa), true)
        # Translation invariance: per-edge contributions must cancel
        # (catches double-counted diagonal edges).
        g_tr = jax.grad(lambda s: mean_img(s, True, False))(0.0)
        assert abs(float(g_tr)) < 0.1 * true, float(g_tr)

    def test_interior_shared_edges_untouched(self):
        """A flat two-triangle quad: the shared diagonal must NOT be
        blended (depth-continuity silhouette test)."""
        from dreamgaussian_tpu.ops.mesh_raster import antialias

        size = 64
        v = jnp.asarray([
            [-0.8, -0.8, 0.1, 1.0],
            [0.8, -0.8, 0.1, 1.0],
            [0.8, 0.8, 0.1, 1.0],
            [-0.8, 0.8, 0.1, 1.0],
        ])
        f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        rast = rasterize(v, f, size, size, tile=32, max_tiles=4)
        # Distinct per-triangle colors to expose any diagonal blending.
        col = jnp.where(
            (rast.tri_id == 1)[..., None],
            jnp.asarray([1.0, 0.0, 0.0]),
            jnp.where(
                (rast.tri_id == 2)[..., None],
                jnp.asarray([0.0, 1.0, 0.0]),
                0.0,
            ),
        )
        aa = antialias(col, rast, v, f, size, size)
        diff = np.abs(np.asarray(aa - col)).sum(-1)
        inner = np.asarray(rast.mask)
        # erode: strictly-interior pixels (all 4 neighbors covered)
        core = inner[1:-1, 1:-1] & inner[:-2, 1:-1] & inner[2:, 1:-1] \
            & inner[1:-1, :-2] & inner[1:-1, 2:]
        assert diff[1:-1, 1:-1][core].max() < 1e-6
