"""Mesh writers: binary PLY (the reference's shape_utils.py export format) and OBJ
(SynBody_dataset.py:19-36 writeOBJ equivalent). No plyfile/trimesh dependency."""

from __future__ import annotations

import struct

import numpy as np


def write_ply(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Binary little-endian PLY with float32 vertices and int32 face indices."""
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(tris)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.tobytes())
        counts = np.full((len(tris), 1), 3, np.uint8)
        # interleave count byte + 3 int32s per face
        face_dtype = np.dtype([("n", np.uint8), ("idx", np.int32, (3,))])
        faces = np.empty(len(tris), dtype=face_dtype)
        faces["n"] = counts[:, 0]
        faces["idx"] = tris
        f.write(faces.tobytes())


def read_ply(path: str):
    """Minimal reader for the files write_ply produces (for tests)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        nv = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
        nt = int(next(l for l in lines if l.startswith("element face")).split()[-1])
        verts = np.frombuffer(f.read(nv * 12), np.float32).reshape(nv, 3)
        face_dtype = np.dtype([("n", np.uint8), ("idx", np.int32, (3,))])
        faces = np.frombuffer(f.read(nt * face_dtype.itemsize), face_dtype)
        return verts, faces["idx"].copy()


def write_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
