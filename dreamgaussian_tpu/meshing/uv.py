"""UV atlas generation (xatlas replacement, pure numpy).

The reference unwraps with the external xatlas C++ library
(/root/reference/mesh.py:367-398) and remaps vertices so each UV vertex is
unique (``align_v_to_vt``). This implementation is a from-scratch
box-projection atlas:

1. each face is assigned to one of 6 charts by the dominant signed axis of
   its normal (overlap-free within a chart only up to occlusion, so...)
2. each (axis-chart, connected-component) pair becomes its own chart —
   this is what makes the projection injective per chart for typical
   closed surfaces;
3. charts are projected onto their complementary axis pair, and their
   rectangles are packed into the unit square with a shelf packer;
4. vertices are duplicated per chart (xatlas ``vmapping`` equivalent), so
   the result plugs into the same ``align_v_to_vt`` flow.

Lower chart quality than xatlas (distortion grows for faces oblique to
their chart axis, up to ~54 deg) but dependency-free and deterministic;
good enough for the 1024^2 texture bake that follows.
"""

from __future__ import annotations

import numpy as np

_AXES = np.array(
    [
        [1, 0, 0], [-1, 0, 0],
        [0, 1, 0], [0, -1, 0],
        [0, 0, 1], [0, 0, -1],
    ],
    dtype=np.float64,
)
# complementary (u, v) axes per chart axis
_UV_AXES = {
    0: (1, 2), 1: (1, 2),
    2: (0, 2), 3: (0, 2),
    4: (0, 1), 5: (0, 1),
}


def _face_components(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """Label connected components of the face graph (shared vertices)."""
    parent = np.arange(n_verts)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for f in faces:
        a = find(f[0])
        for k in (1, 2):
            b = find(f[k])
            parent[b] = a
    roots = np.array([find(f[0]) for f in faces])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def unwrap(
    verts: np.ndarray, faces: np.ndarray, padding: float = 0.01
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute a UV atlas.

    Returns (vmapping [Nvt] int64 — source vertex of each UV vert,
    ft [F, 3] int32 — faces into the vt array, vt [Nvt, 2] float32 in
    [0, 1]) — the same triple xatlas returns
    (/root/reference/mesh.py:385).
    """
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    nf = faces.shape[0]

    # Face normals -> dominant signed axis chart.
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    axis_scores = n @ _AXES.T  # [F, 6]
    chart_axis = np.argmax(axis_scores, axis=1)  # [F]

    # Sub-charts: connected components within each axis chart.
    chart_ids = np.zeros(nf, dtype=np.int64)
    next_id = 0
    for a in range(6):
        sel = chart_axis == a
        if not sel.any():
            continue
        labels = _face_components(faces[sel], verts.shape[0])
        chart_ids[sel] = next_id + labels
        next_id += labels.max() + 1
    n_charts = next_id

    # Per chart: project, collect UVs, duplicate vertices.
    vt_list: list[np.ndarray] = []
    vmap_list: list[np.ndarray] = []
    ft = np.zeros((nf, 3), dtype=np.int64)
    rects = []  # (w, h) per chart in world units
    chart_data = []
    base = 0
    for c in range(n_charts):
        fsel = np.nonzero(chart_ids == c)[0]
        a = chart_axis[fsel[0]]
        ua, va = _UV_AXES[a]
        vids = np.unique(faces[fsel].reshape(-1))
        local = {v: i for i, v in enumerate(vids)}
        uv = verts[vids][:, [ua, va]]
        # Mirror u for negative-facing charts so texture is not flipped.
        if a % 2 == 1:
            uv = uv.copy()
            uv[:, 0] = -uv[:, 0]
        uv -= uv.min(axis=0)
        w, h = uv.max(axis=0) + 1e-12
        rects.append((w, h))
        chart_data.append((fsel, vids, uv, base))
        for j, fi in enumerate(fsel):
            ft[fi] = [base + local[v] for v in faces[fi]]
        base += len(vids)

    # Shelf packing (charts sorted by height).
    order = np.argsort([-r[1] for r in rects])
    total_area = sum(w * h for w, h in rects)
    scale_guess = 1.0 / np.sqrt(total_area * 1.4 + 1e-12)
    pad = padding

    def try_pack(scale):
        placements = [None] * n_charts
        x = y = shelf_h = 0.0
        for ci in order:
            w, h = rects[ci][0] * scale + pad, rects[ci][1] * scale + pad
            if w > 1.0:
                return None
            if x + w > 1.0:
                y += shelf_h
                x = 0.0
                shelf_h = 0.0
            if y + h > 1.0:
                return None
            placements[ci] = (x, y)
            shelf_h = max(shelf_h, h)
            x += w
        return placements

    scale = scale_guess
    placements = try_pack(scale)
    while placements is None and scale > 1e-9:
        scale *= 0.9
        placements = try_pack(scale)
    assert placements is not None, "UV packing failed"

    vt = np.zeros((base, 2), dtype=np.float32)
    vmapping = np.zeros(base, dtype=np.int64)
    for c, (fsel, vids, uv, b) in enumerate(chart_data):
        x0, y0 = placements[c]
        vt[b : b + len(vids)] = uv * scale + np.array([x0, y0]) + pad / 2
        vmapping[b : b + len(vids)] = vids
    return vmapping, ft.astype(np.int32), vt
