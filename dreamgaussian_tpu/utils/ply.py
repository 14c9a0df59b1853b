"""Self-contained PLY reader/writer (binary little-endian + ascii).

Replaces the ``plyfile`` dependency. The Gaussian checkpoint layout is
byte-compatible with the GS-standard PLY written by the reference
(/root/reference/gs_renderer.py:384-415): a single ``vertex`` element with
float32 properties x,y,z,nx,ny,nz,f_dc_*,f_rest_*,opacity,scale_*,rot_*.
"""

from __future__ import annotations

import io
from typing import Mapping

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_INV_DTYPES = {"f4": "float", "f8": "double", "i4": "int", "u4": "uint",
               "i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort"}


def write_ply(path: str, elements: Mapping[str, np.ndarray], binary: bool = True) -> None:
    """Write elements {name: structured array} to a PLY file."""
    with open(path, "wb") as f:
        fmt = "binary_little_endian" if binary else "ascii"
        header = ["ply", f"format {fmt} 1.0"]
        for name, arr in elements.items():
            assert arr.dtype.names, f"element {name} must be a structured array"
            header.append(f"element {name} {len(arr)}")
            for prop in arr.dtype.names:
                base = arr.dtype[prop]
                if base.subdtype is not None:  # list property unsupported in writer
                    raise ValueError("nested property shapes unsupported; flatten first")
                ply_t = _INV_DTYPES[base.str[1:]]
                header.append(f"property {ply_t} {prop}")
        header.append("end_header")
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for arr in elements.values():
            if binary:
                f.write(arr.astype(arr.dtype.newbyteorder("<")).tobytes())
            else:
                for row in arr:
                    f.write((" ".join(str(v) for v in row) + "\n").encode("ascii"))


def read_ply(path: str) -> dict[str, np.ndarray]:
    """Read a PLY file -> {element name: structured numpy array}.

    Supports ascii and binary_little_endian with scalar properties (list
    properties are supported for ascii 'face' elements, returned as an
    int32 [F, K] array under key '<element>_indices').
    """
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header")
    if header_end < 0:
        raise ValueError(f"not a PLY file: {path}")
    header_end = data.find(b"\n", header_end) + 1
    header_lines = data[:header_end].decode("ascii", errors="replace").splitlines()

    fmt = None
    elements: list[tuple[str, int, list]] = []  # (name, count, [(prop, dtype|list)])
    for line in header_lines:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append((parts[4], ("list", _PLY_DTYPES[parts[2]],
                                                   _PLY_DTYPES[parts[3]])))
            else:
                elements[-1][2].append((parts[2], _PLY_DTYPES[parts[1]]))

    body = data[header_end:]
    out: dict[str, np.ndarray] = {}
    if fmt == "ascii":
        text_rows = body.decode("ascii").split("\n")
        row_i = 0
        for name, count, props in elements:
            if any(isinstance(t, tuple) for _, t in props):
                # list properties: parse row-wise (e.g. face vertex_indices)
                rows = []
                for _ in range(count):
                    vals = text_rows[row_i].split()
                    row_i += 1
                    k = int(vals[0])
                    rows.append([int(v) for v in vals[1:1 + k]])
                out[name + "_indices"] = np.asarray(rows, dtype=np.int32)
            else:
                dtype = np.dtype([(p, "<" + t) for p, t in props])
                rows = []
                for _ in range(count):
                    vals = text_rows[row_i].split()
                    row_i += 1
                    rows.append(tuple(float(v) for v in vals))
                out[name] = np.array(rows, dtype=dtype)
    elif fmt == "binary_little_endian":
        offset = 0
        for name, count, props in elements:
            if any(isinstance(t, tuple) for _, t in props):
                # Binary list property: assume fixed arity 3 (triangle faces).
                assert len(props) == 1, "mixed list/scalar binary element unsupported"
                _, (_, cnt_t, idx_t) = props[0]
                cnt_size = np.dtype(cnt_t).itemsize
                idx_size = np.dtype(idx_t).itemsize
                rows = []
                for _ in range(count):
                    k = int(np.frombuffer(body, dtype="<" + cnt_t, count=1, offset=offset)[0])
                    offset += cnt_size
                    rows.append(np.frombuffer(body, dtype="<" + idx_t, count=k, offset=offset))
                    offset += k * idx_size
                out[name + "_indices"] = np.asarray(rows, dtype=np.int32)
            else:
                dtype = np.dtype([(p, "<" + t) for p, t in props])
                arr = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
                offset += dtype.itemsize * count
                out[name] = arr.copy()
    else:
        raise ValueError(f"unsupported PLY format: {fmt}")
    return out


def structured_from_columns(columns: Mapping[str, np.ndarray]) -> np.ndarray:
    """Build a float32 structured array from named 1-D columns."""
    n = len(next(iter(columns.values())))
    dtype = np.dtype([(name, "<f4") for name in columns])
    arr = np.empty(n, dtype=dtype)
    for name, col in columns.items():
        arr[name] = np.asarray(col, dtype=np.float32).reshape(n)
    return arr


def write_ply_with_faces(
    path: str, vertices: np.ndarray, faces: np.ndarray
) -> None:
    """Write a binary mesh PLY: structured vertex element + triangle faces
    (``property list uchar int vertex_indices``)."""
    faces = np.ascontiguousarray(faces, dtype="<i4")
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {len(vertices)}"]
        for prop in vertices.dtype.names:
            ply_t = _INV_DTYPES[vertices.dtype[prop].str[1:]]
            header.append(f"property {ply_t} {prop}")
        header += [
            f"element face {len(faces)}",
            "property list uchar int vertex_indices",
            "end_header",
        ]
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(vertices.astype(vertices.dtype.newbyteorder("<")).tobytes())
        counts = np.full((len(faces), 1), 3, dtype=np.uint8)
        rows = np.empty(len(faces), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
        rows["n"] = counts[:, 0]
        rows["idx"] = faces
        f.write(rows.tobytes())
