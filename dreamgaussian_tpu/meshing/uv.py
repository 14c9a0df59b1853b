"""UV atlas generation (xatlas replacement, pure numpy/scipy).

The reference unwraps with the external xatlas C++ library
(/root/reference/mesh.py:367-398) and remaps vertices so each UV vertex is
unique (``align_v_to_vt``). This implementation:

1. assigns each face to one of 6 charts by the dominant signed axis of
   its normal, split into connected components (the chart segmentation);
2. flattens each chart with **LSCM** (least-squares conformal maps,
   Levy et al. 2002 — the same energy xatlas' parameterizer minimizes):
   a sparse least-squares solve with the chart's two most distant
   vertices pinned. Charts whose LSCM solution folds (mixed UV triangle
   orientations) or fails fall back to the round-1 box projection, so
   per-chart injectivity for typical closed surfaces is preserved;
3. rescales each chart so UV area matches 3D area (uniform texel
   density) and packs chart rectangles into the unit square with a
   shelf packer;
4. duplicates vertices per chart (xatlas ``vmapping`` equivalent), so
   the result plugs into the same ``align_v_to_vt`` flow.

``atlas_stats`` reports texel utilization and angular distortion —
on a sphere LSCM cuts max angular distortion from ~54 deg (box
projection) to a few degrees.
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


def _face_neighbors(faces: np.ndarray) -> np.ndarray:
    """[F, 3] edge-neighbor face indices (-1 at boundaries)."""
    nf = faces.shape[0]
    edge_owner: dict = {}
    nbr = np.full((nf, 3), -1, np.int64)
    for fi in range(nf):
        f = faces[fi]
        for k in range(3):
            e = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            if e in edge_owner:
                fj, kj = edge_owner.pop(e)
                nbr[fi, k] = fj
                nbr[fj, kj] = fi
            else:
                edge_owner[e] = (fi, k)
    return nbr


def _lscm_chart(pts: np.ndarray, faces_l: np.ndarray) -> np.ndarray | None:
    """LSCM flattening of one chart.

    pts: [V, 3] chart vertices; faces_l: [F, 3] local indices.
    Returns [V, 2] UVs, or None if the system is degenerate or the
    solution folds (caller falls back to box projection).
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    nv = pts.shape[0]
    nf = faces_l.shape[0]
    if nv < 3 or nf < 1:
        return None

    p0 = pts[faces_l[:, 0]]
    p1 = pts[faces_l[:, 1]]
    p2 = pts[faces_l[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    # Per-face orthonormal frame -> 2D triangle coords.
    x_hat = e1 / (np.linalg.norm(e1, axis=1, keepdims=True) + 1e-20)
    nrm = np.cross(e1, e2)
    n_len = np.linalg.norm(nrm, axis=1, keepdims=True)
    ok = n_len[:, 0] > 1e-18
    nrm = nrm / (n_len + 1e-20)
    y_hat = np.cross(nrm, x_hat)
    x1 = np.einsum("ij,ij->i", e1, x_hat)
    x2 = np.einsum("ij,ij->i", e2, x_hat)
    y2 = np.einsum("ij,ij->i", e2, y_hat)
    # 2D corners: q0=(0,0), q1=(x1,0), q2=(x2,y2); 2*area = x1*y2.
    dt = np.maximum(np.abs(x1 * y2), 1e-18)
    inv = 1.0 / np.sqrt(dt)
    # Complex edge weights W_j = (q_{j+2} - q_{j+1}) / sqrt(2 area)
    # (cyclic): the conformality residual per face is sum_j W_j z_j.
    wx = np.stack([(x2 - x1), -x2, x1], axis=1) * inv[:, None]
    wy = np.stack([y2, -y2, np.zeros_like(y2)], axis=1) * inv[:, None]
    wx[~ok] = 0.0
    wy[~ok] = 0.0

    # Pin the two most distant vertices (projected chart diameter).
    d = pts - pts.mean(axis=0)
    i0 = int(np.argmax(np.einsum("ij,ij->i", d, d)))
    i1 = int(np.argmax(np.sum((pts - pts[i0]) ** 2, axis=1)))
    if i0 == i1:
        return None
    pin = np.array([i0, i1])
    span = np.linalg.norm(pts[i1] - pts[i0])
    pin_uv = np.array([[0.0, 0.0], [span, 0.0]])

    free = np.setdiff1d(np.arange(nv), pin)
    col_of = -np.ones(nv, np.int64)
    col_of[free] = np.arange(free.size)

    rows, cols, vals = [], [], []
    brhs = np.zeros(2 * nf)
    for j in range(3):
        vidx = faces_l[:, j]
        fc = col_of[vidx]
        isfree = fc >= 0
        fr = np.nonzero(isfree)[0]
        # Real rows (2t): wx*u - wy*v ; imag rows (2t+1): wy*u + wx*v.
        rows += [2 * fr, 2 * fr, 2 * fr + 1, 2 * fr + 1]
        cols += [2 * fc[fr], 2 * fc[fr] + 1, 2 * fc[fr], 2 * fc[fr] + 1]
        vals += [wx[fr, j], -wy[fr, j], wy[fr, j], wx[fr, j]]
        # Pinned contributions move to the RHS.
        pr = np.nonzero(~isfree)[0]
        if pr.size:
            which = (vidx[pr] == pin[1]).astype(np.int64)
            pu = pin_uv[which, 0]
            pv = pin_uv[which, 1]
            brhs[2 * pr] -= wx[pr, j] * pu - wy[pr, j] * pv
            brhs[2 * pr + 1] -= wy[pr, j] * pu + wx[pr, j] * pv
    A = sp.csr_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(2 * nf, 2 * free.size),
    )
    try:
        # Normal equations + sparse direct solve: the LSCM system is
        # ill-conditioned enough that plain LSQR stalls far from the
        # optimum on charts of a few hundred vertices.
        AtA = (A.T @ A).tocsc()
        Atb = A.T @ brhs
        sol = spla.spsolve(AtA + 1e-12 * sp.eye(AtA.shape[0]), Atb)
    except Exception:
        return None
    uv = np.zeros((nv, 2))
    uv[pin] = pin_uv
    uv[free, 0] = sol[0::2]
    uv[free, 1] = sol[1::2]
    if not np.isfinite(uv).all():
        return None

    # Reject folded solutions (mixed triangle orientations => overlap).
    q0 = uv[faces_l[:, 0]]
    q1 = uv[faces_l[:, 1]]
    q2 = uv[faces_l[:, 2]]
    signed = (q1[:, 0] - q0[:, 0]) * (q2[:, 1] - q0[:, 1]) - (
        q1[:, 1] - q0[:, 1]
    ) * (q2[:, 0] - q0[:, 0])
    signed = signed[ok]
    if signed.size == 0:
        return None
    if (signed > 1e-14).any() and (signed < -1e-14).any():
        return None
    if (signed < 0).sum() > (signed > 0).sum():
        uv[:, 1] = -uv[:, 1]  # uniform flip: un-mirror
    # Uniform texel density: scale UV area to 3D area.
    area3d = 0.5 * np.sum(n_len[ok, 0])
    area_uv = 0.5 * np.sum(np.abs(signed))
    if area_uv < 1e-18 or area3d < 1e-18:
        return None
    uv *= np.sqrt(area3d / area_uv)
    return uv


def atlas_stats(
    verts: np.ndarray, faces: np.ndarray,
    vmapping: np.ndarray, ft: np.ndarray, vt: np.ndarray,
) -> dict:
    """Quality metrics: texel utilization + angular distortion (deg)."""
    verts = np.asarray(verts, np.float64)
    vt = np.asarray(vt, np.float64)
    p = verts[np.asarray(vmapping)][np.asarray(ft)]   # [F, 3, 3]
    q = vt[np.asarray(ft)]                            # [F, 3, 2]

    def angles(tri):
        out = []
        for i in range(3):
            a = tri[:, (i + 1) % 3] - tri[:, i]
            b = tri[:, (i + 2) % 3] - tri[:, i]
            num = np.einsum("ij,ij->i", a, b)
            den = (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
                   + 1e-20)
            out.append(np.degrees(np.arccos(np.clip(num / den, -1, 1))))
        return np.stack(out, axis=1)

    a3 = angles(p)
    a2 = angles(q)
    dev = np.abs(a3 - a2)
    area_uv = 0.5 * np.abs(
        (q[:, 1, 0] - q[:, 0, 0]) * (q[:, 2, 1] - q[:, 0, 1])
        - (q[:, 1, 1] - q[:, 0, 1]) * (q[:, 2, 0] - q[:, 0, 0])
    )
    return {
        "max_angle_dev_deg": float(dev.max()),
        "mean_angle_dev_deg": float(dev.mean()),
        "texel_utilization": float(area_uv.sum()),
    }


def unwrap(
    verts: np.ndarray, faces: np.ndarray, padding: float = 0.01,
    method: str = "lscm",
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

    # Majority smoothing over the face-adjacency graph: absorb small
    # islands of one chart enclosed in another. Interior holes make a
    # chart multiply-connected, which LSCM cannot flatten without heavy
    # distortion — the raw argmax segmentation of a marching-cubes
    # sphere has Euler characteristic ~-7 per chart from such pinholes.
    nbr = _face_neighbors(faces)
    for _ in range(16):
        nb_chart = np.where(nbr >= 0, chart_axis[nbr], -1)  # [F, 3]
        votes = np.zeros((nf, 6), np.int32)
        for k in range(3):
            valid = nb_chart[:, k] >= 0
            votes[valid, nb_chart[valid, k]] += 1
        best = votes.argmax(axis=1)
        bestv = votes.max(axis=1)
        own = votes[np.arange(nf), chart_axis]
        # Switch when outvoted AND the face doesn't face away from the
        # winning chart's axis (keeps the box fallback injective).
        switch = (
            (bestv >= 2) & (bestv > own)
            & (axis_scores[np.arange(nf), best] > 0)
            & (best != chart_axis)
        )
        if not switch.any():
            break
        chart_axis[switch] = best[switch]

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
        vids = np.unique(faces[fsel].reshape(-1))
        local = {v: i for i, v in enumerate(vids)}
        uv = None
        if method == "lscm":
            faces_l = np.array(
                [[local[v] for v in faces[fi]] for fi in fsel], np.int64
            )
            uv = _lscm_chart(verts[vids], faces_l)
        if uv is None:  # box-projection fallback (always injective here)
            ua, va = _UV_AXES[a]
            uv = verts[vids][:, [ua, va]].copy()
            # Mirror u for negative-facing charts (un-flip the texture).
            if a % 2 == 1:
                uv[:, 0] = -uv[:, 0]
        uv = uv - uv.min(axis=0)
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
