"""Scene-format loaders (PLY ascii/binary, STL ascii/binary, OFF): each
format writes a known box mesh and must load back to identical geometry.
Reference capability: assimp multi-format import
(``core/src/scene_data_loader.cpp:100``)."""

import struct

import numpy as np
import pytest

from wayverb_tpu.core.geometry import Box, box_scene
from wayverb_tpu.core.scene import (load_off, load_ply, load_scene,
                                    load_stl)

BOX = Box((0, 0, 0), (1.0, 2.0, 3.0))


def _box_arrays():
    soup = box_scene(BOX)
    return np.asarray(soup.vertices), np.asarray(soup.triangles)


def _assert_same_geometry(soup, verts, tris):
    got_v = np.asarray(soup.vertices)
    got_t = np.asarray(soup.triangles)
    assert got_t.shape == tris.shape
    # vertex order may differ (STL welds); compare the triangle corner sets
    ref = np.sort(verts[tris].reshape(len(tris), -1), axis=0)
    got = np.sort(got_v[got_t].reshape(len(got_t), -1), axis=0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ply_ascii_roundtrip(tmp_path):
    verts, tris = _box_arrays()
    p = tmp_path / "box.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\ncomment box\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    scene = load_ply(str(p))
    _assert_same_geometry(scene.soup, verts, tris)


def test_ply_binary_roundtrip(tmp_path):
    verts, tris = _box_arrays()
    p = tmp_path / "box.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(verts.astype("<f4").tobytes())
        for t in tris:
            f.write(struct.pack("<B3i", 3, *t))
    scene = load_ply(str(p))
    _assert_same_geometry(scene.soup, verts, tris)


def test_stl_binary_roundtrip(tmp_path):
    verts, tris = _box_arrays()
    p = tmp_path / "box.stl"
    with open(p, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(struct.pack("<3f", 0, 0, 0))
            for vi in t:
                f.write(verts[vi].astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))
    scene = load_stl(str(p))
    _assert_same_geometry(scene.soup, verts, tris)
    # welding: a closed box has exactly 8 distinct corners
    assert np.asarray(scene.soup.vertices).shape == (8, 3)


def test_stl_ascii_roundtrip(tmp_path):
    verts, tris = _box_arrays()
    p = tmp_path / "box.stl"
    with open(p, "w") as f:
        f.write("solid box\n")
        for t in tris:
            f.write("facet normal 0 0 0\nouter loop\n")
            for vi in t:
                v = verts[vi]
                f.write(f"vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("endloop\nendfacet\n")
        f.write("endsolid box\n")
    scene = load_stl(str(p))
    _assert_same_geometry(scene.soup, verts, tris)


def test_off_roundtrip(tmp_path):
    verts, tris = _box_arrays()
    p = tmp_path / "box.off"
    with open(p, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {len(tris)} 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    scene = load_off(str(p))
    _assert_same_geometry(scene.soup, verts, tris)


def test_load_scene_dispatch_and_unknown(tmp_path):
    with pytest.raises(ValueError, match="unsupported scene format"):
        load_scene(str(tmp_path / "scene.xyz"))


def test_loaded_scene_is_simulation_ready(tmp_path):
    """A loaded PLY box must classify/voxelise like the programmatic one."""
    verts, tris = _box_arrays()
    p = tmp_path / "box.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
    scene = load_scene(str(p))
    from wayverb_tpu.waveguide.descriptor import (
        compute_adjusted_boundary, descriptor_for_box, grid_spacing)
    from wayverb_tpu.waveguide.setup import classify_inside_scene
    dx = grid_spacing(340.0, 1.0 / 3333.33)
    adjusted = compute_adjusted_boundary(
        BOX, np.asarray(BOX.centre()), dx)
    desc = descriptor_for_box(adjusted, dx)
    inside = classify_inside_scene(desc, scene.soup)
    vol = inside.sum() * dx ** 3
    np.testing.assert_allclose(vol, 6.0, rtol=0.15)   # 1×2×3 box


class TestPlyAdviceFixes:
    def test_ascii_ply_shuffled_property_order(self, tmp_path):
        """Coordinates must be mapped BY NAME even when declared (z, x, y)
        plus an extra leading property (ADVICE r3)."""
        from wayverb_tpu.core.scene import load_scene
        p = tmp_path / "shuffled.ply"
        p.write_text(
            "ply\nformat ascii 1.0\n"
            "element vertex 3\n"
            "property float confidence\n"
            "property float z\nproperty float x\nproperty float y\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0.9 30 10 20\n"
            "0.9 31 11 21\n"
            "0.9 32 12 22\n"
            "3 0 1 2\n")
        sc = load_scene(str(p))
        v = np.asarray(sc.soup.vertices)
        np.testing.assert_allclose(v[0], [10, 20, 30])
        np.testing.assert_allclose(v[2], [12, 22, 32])

    def test_binary_ply_skipped_list_element_raises(self, tmp_path):
        """A skipped element containing a list property must raise, not
        silently desynchronize the stream (ADVICE r3)."""
        import struct
        from wayverb_tpu.core.scene import load_scene
        p = tmp_path / "listskip.ply"
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element custom 1\n"
            "property list uchar int stuff\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n").encode()
        body = struct.pack("<Bi", 1, 7)
        body += struct.pack("<9f", *range(9))
        body += struct.pack("<B3i", 3, 0, 1, 2)
        p.write_bytes(header + body)
        with pytest.raises(ValueError, match="list property"):
            load_scene(str(p))


DAE_DOC = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_geometries>
  <geometry id="box" name="box">
   <mesh>
    <source id="box-pos">
     <float_array id="box-pos-array" count="12">
       0 0 0  2 0 0  2 1 0  0 1 0</float_array>
    </source>
    <vertices id="box-vtx">
     <input semantic="POSITION" source="#box-pos"/>
    </vertices>
    <triangles material="wall" count="1">
     <input semantic="VERTEX" source="#box-vtx" offset="0"/>
     <input semantic="NORMAL" source="#box-pos" offset="1"/>
     <p>0 0 1 1 2 2</p>
    </triangles>
    <polylist material="floor" count="1">
     <input semantic="VERTEX" source="#box-vtx" offset="0"/>
     <vcount>4</vcount>
     <p>0 1 2 3</p>
    </polylist>
   </mesh>
  </geometry>
 </library_geometries>
</COLLADA>
"""


class TestDae:
    def test_triangles_polylist_and_materials(self, tmp_path):
        path = tmp_path / "room.dae"
        path.write_text(DAE_DOC)
        sd = load_scene(str(path))
        tris = np.asarray(sd.soup.triangles)
        # 1 <triangles> + quad fan-triangulated into 2
        assert tris.shape == (3, 3)
        assert sd.material_names == ["wall", "floor"]
        surf = np.asarray(sd.soup.surfaces)
        assert surf.tolist() == [0, 1, 1]
        v = np.asarray(sd.soup.vertices)
        # interleaved vertex/normal offsets decoded: triangle 0 uses
        # vertices 0,1,2 of the positions block
        np.testing.assert_allclose(v[tris[0]],
                                   [[0, 0, 0], [2, 0, 0], [2, 1, 0]])

    def test_unknown_ext_lists_dae(self, tmp_path):
        with pytest.raises(ValueError, match="dae"):
            load_scene(str(tmp_path / "x.3ds"))


DXF_DOC = "\n".join([
    "0", "SECTION", "2", "ENTITIES",
    # quad on layer "wall"
    "0", "3DFACE", "8", "wall",
    "10", "0", "20", "0", "30", "0",
    "11", "2", "21", "0", "31", "0",
    "12", "2", "22", "1", "32", "0",
    "13", "0", "23", "1", "33", "0",
    # triangle (corner 3 == corner 2) on layer "floor"
    "0", "3DFACE", "8", "floor",
    "10", "0", "20", "0", "30", "1",
    "11", "2", "21", "0", "31", "1",
    "12", "2", "22", "1", "32", "1",
    "13", "2", "23", "1", "33", "1",
    "0", "ENDSEC", "0", "EOF",
]) + "\n"


class TestDxf:
    def test_3dface_quads_and_layers(self, tmp_path):
        path = tmp_path / "room.dxf"
        path.write_text(DXF_DOC)
        sd = load_scene(str(path))
        tris = np.asarray(sd.soup.triangles)
        assert tris.shape == (3, 3)       # quad -> 2, triangle -> 1
        assert sd.material_names == ["wall", "floor"]
        assert np.asarray(sd.soup.surfaces).tolist() == [0, 0, 1]
        v = np.asarray(sd.soup.vertices)
        np.testing.assert_allclose(v[tris[0]],
                                   [[0, 0, 0], [2, 0, 0], [2, 1, 0]])


def _fbx_node(name, props, children=b"", wide=False):
    """Encode one binary-FBX node record (test-local writer)."""
    prop_blob = b"".join(props)
    name_b = name.encode()
    sentinel = b"\x00" * (25 if wide else 13)
    body = bytes([len(name_b)]) + name_b + prop_blob + children + \
        (sentinel if children else b"")
    hdr_fmt = "<QQQ" if wide else "<III"
    hdr_len = struct.calcsize(hdr_fmt)
    # end offset is filled relative to the stream start by the caller
    return hdr_fmt, hdr_len, len(props), len(prop_blob), body


def _fbx_doc(version=7400):
    import zlib
    wide = version >= 7500

    def node(name, props, children=b""):
        hdr_fmt, hdr_len, np_, plen, body = _fbx_node(name, props,
                                                      children, wide)
        return hdr_fmt, hdr_len, np_, plen, body

    def emit(stream_off, name, props, children_fn=None):
        hdr_fmt = "<QQQ" if wide else "<III"
        hdr_len = struct.calcsize(hdr_fmt)
        name_b = name.encode()
        prop_blob = b"".join(props)
        inner_off = stream_off + hdr_len + 1 + len(name_b) + len(prop_blob)
        children = b""
        if children_fn:
            for cname, cprops, cgrand in children_fn:
                children += emit(inner_off + len(children), cname, cprops,
                                 cgrand)
            children += b"\x00" * (25 if wide else 13)
        end = inner_off + len(children)
        return struct.pack(hdr_fmt, end, len(props), len(prop_blob)) + \
            bytes([len(name_b)]) + name_b + prop_blob + children

    def darr(values):
        raw = struct.pack(f"<{len(values)}d", *values)
        return b"d" + struct.pack("<III", len(values), 0, 0) + raw

    def iarr(values, compress=False):
        import zlib as z
        raw = struct.pack(f"<{len(values)}i", *values)
        if compress:
            comp = z.compress(raw)
            return b"i" + struct.pack("<III", len(values), 1,
                                      len(comp)) + comp
        return b"i" + struct.pack("<III", len(values), 0, 0) + raw

    verts = [0, 0, 0, 2, 0, 0, 2, 1, 0, 0, 1, 0]
    # one quad as a polygon: indices 0 1 2 3 with the last complemented
    polys = [0, 1, 2, ~3]
    header = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I",
                                                               version)
    geom = emit(len(header), "Objects", [],
                [("Geometry", [],
                  [("Vertices", [darr(verts)], None),
                   ("PolygonVertexIndex", [iarr(polys, compress=True)],
                    None)])])
    return header + geom + b"\x00" * (25 if wide else 13)


class TestFbx:
    def test_binary_fbx_quad(self, tmp_path):
        path = tmp_path / "room.fbx"
        path.write_bytes(_fbx_doc())
        sd = load_scene(str(path))
        tris = np.asarray(sd.soup.triangles)
        assert tris.shape == (2, 3)          # quad fan -> 2 triangles
        v = np.asarray(sd.soup.vertices)
        np.testing.assert_allclose(v[tris[0]],
                                   [[0, 0, 0], [2, 0, 0], [2, 1, 0]])
        assert sd.material_names == ["geometry_0"]

    def test_ascii_fbx_rejected(self, tmp_path):
        path = tmp_path / "room.fbx"
        path.write_text("; FBX 7.4.0 project file (ASCII)")
        with pytest.raises(ValueError, match="binary"):
            load_scene(str(path))
