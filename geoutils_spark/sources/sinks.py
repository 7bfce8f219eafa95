"""Partitioned sinks: per-cell and per-leaf parquet layouts.

Reference semantics re-expressed as ``write.partitionBy``:

* S5 — one output per S2 cell named ``s2_<hex16>``
  (/root/reference/osms2split/src/s2splitter.cpp:54-72): here a hive-style
  ``cell_hex=s2_<hex16>/`` directory per cell; the mutexed per-cell buffers
  (s2splitter.h:58-64) become shuffle partitions.
* S6/S7 — per-leaf files with nodes-before-ways ordering via two-file
  consolidation (osmsplitwriter.cpp:17-67): here ``partitionBy(leaf)`` +
  ``sortWithinPartitions(entity_kind)`` — ordering inside one parquet
  partition replaces the sidecar-append trick.

Iceberg note (SURVEY.md §7 risk register): no Iceberg jars ship in this
sandbox, so the table-IO layer is parquet + hive partitions; the partition
columns (cell_hex / leaf, optionally warc_ts bucket) are exactly the Iceberg
partition spec the north rule names, and ``.format("iceberg")`` is a config
switch away on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geoutils_spark.functions import cells as C


CELL_PREFIX = "s2_"


def with_cell_token(df: DataFrame, lon: str, lat: str, level: int,
                    out: str = "cell_hex", backend: str = "mercator") -> DataFrame:
    """Add the reference's filename token ``s2_<hex16>`` for the row's cell.

    ``backend='s2'`` uses TRUE S2 ids (functions/s2cells.py), producing the
    exact tokens the reference writes as osms2split filenames
    (s2splitter.cpp:60-72 — e.g. ``s2_48761cb000000000``);
    ``'mercator'`` keeps the engine's native single-face index."""
    if backend == "s2":
        from geoutils_spark.functions import s2cells as S2

        df = S2.with_s2_cell(df, lon, lat, level, "__cell")
        hexcol = S2.s2_hex_col(F.col("__cell"))
    else:
        df = C.with_cell(df, lon, lat, level, "__cell")
        hexcol = C.cell_to_hex_col(F.col("__cell"))
    df = df.withColumn(out, F.concat(F.lit(CELL_PREFIX), hexcol))
    return df.drop("__cell")


def write_partitioned_by_cell(df: DataFrame, path: str, level: int,
                              lon: str = "lon", lat: str = "lat",
                              mode: str = "overwrite") -> None:
    """S5 sink: one hive partition per cell, shuffled so exactly one task
    owns each cell (no lock analog needed)."""
    out = with_cell_token(df, lon, lat, level)
    (
        out.repartition(F.col("cell_hex"))
        .write.mode(mode).partitionBy("cell_hex").parquet(path)
    )


def write_partitioned_by_leaf(df: DataFrame, path: str, leaf: str = "leaf",
                              entity_kind: str | None = None,
                              mode: str = "overwrite") -> None:
    """S6/S7 sink: per-leaf partitions; optional nodes-before-ways ordering
    inside each partition (the consolidation ordering, osmsplitwriter.cpp:50-67)."""
    out = df.repartition(F.col(leaf))
    if entity_kind is not None:
        out = out.sortWithinPartitions(entity_kind)
    out.write.mode(mode).partitionBy(leaf).parquet(path)


def write_obj_meshes(meshes: DataFrame, out_dir: str,
                     group_col: str | None = None) -> None:
    """S8 geometry-export sink: extruded meshes -> Wavefront OBJ files.

    The reference exports scenes through assimp (obj/fbx/gltf/dae,
    /root/reference/osm2assimp/assimpwriter.cpp:193-234); OBJ is the one
    format that is pure text and dependency-free, so it is the native
    export here (fbx/gltf would be the assimp-equivalent seam). Input is
    the ``extrude_polygons`` mesh schema (way_id, vx, vy, vz, faces).

    Layout: one ``.obj`` per output partition, one ``o way_<id>`` object
    per mesh with vertex indices rebased per file (A6 index-rebase
    semantics, but per-file). ``group_col`` (e.g. a cell token from
    ``with_cell_token``) routes meshes so one task owns one file —
    tile-artifact export at scale with zero driver involvement.

    Attribute-bearing meshes (MESH_ATTR_SCHEMA: nx/ny/nz normals, tu/tv/tw
    UVs — reference geometry.h:56-63) additionally emit ``vn`` and 3-component
    ``vt`` lines (OBJ allows an optional w; the reference packs featureId
    there) and index faces as ``v/vt/vn`` (or ``v//vn`` when the mesh has
    no UV set); normals/UVs share the position index since the layout is
    per-vertex 1:1.
    """
    import os

    df = meshes
    has_attrs = "nx" in meshes.columns
    if group_col is None:
        group_col = "__grp"
        df = df.withColumn(group_col, F.lit("scene"))
    df = df.repartition(F.col(group_col))
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        handles = {}
        offsets = {}
        toffsets = {}  # vt indices count separately: UV-less meshes skip vt
        try:
            for r in rows:
                g = r[group_col]
                if g not in handles:
                    handles[g] = open(os.path.join(out_dir, f"{g}.obj"), "w")
                    offsets[g] = 0
                    toffsets[g] = 0
                    handles[g].write("# geoutils_spark OBJ export\n")
                f = handles[g]
                base = offsets[g]
                tbase = toffsets[g]
                f.write(f"o way_{r['way_id']}\n")
                for x, y, z in zip(r["vx"], r["vy"], r["vz"]):
                    f.write(f"v {x!r} {y!r} {z!r}\n")
                has_uv = False
                if has_attrs:
                    has_uv = len(r["tu"]) > 0
                    for x, y, z in zip(r["nx"], r["ny"], r["nz"]):
                        f.write(f"vn {x!r} {y!r} {z!r}\n")
                    if has_uv:
                        for u, v, w in zip(r["tu"], r["tv"], r["tw"]):
                            f.write(f"vt {u!r} {v!r} {w!r}\n")
                for face in r["faces"]:
                    if has_attrs and has_uv:
                        f.write("f " + " ".join(
                            f"{base + i + 1}/{tbase + i + 1}/{base + i + 1}"
                            for i in face) + "\n")
                    elif has_attrs:
                        f.write("f " + " ".join(
                            f"{base + i + 1}//{base + i + 1}"
                            for i in face) + "\n")
                    else:
                        f.write("f " + " ".join(
                            str(base + i + 1) for i in face) + "\n")
                offsets[g] = base + len(r["vx"])
                if has_uv:
                    toffsets[g] = tbase + len(r["tu"])
        finally:
            for f in handles.values():
                f.close()

    df.foreachPartition(write_partition)


def write_s2_split_pbf(nodes: DataFrame, ways: DataFrame, out_dir: str,
                       level: int) -> list[str]:
    """The complete osms2split tool: one ``s2_<hex16>.osm.pbf`` file per
    level-``level`` TRUE-S2 cell, each containing every node of every way
    that covers the cell (deduped per cell) followed by those ways — the
    reference's exact output contract including filenames
    (/root/reference/osms2split/src/s2splitter.cpp:54-72 filenames,
    91-135 per-way cell cover + per-cell node dedup).

    Plan: resolve way nodes (J1 join), assign per-node S2 cells,
    dedupe (cell, node) and (cell, way), shuffle BY CELL so exactly one
    task owns each output file (the lock-free S6 shape), and write pbf via
    the dependency-free codec. Returns the written file names.

    Scale note: nodes is the LARGEST OSM table at planet scale, so the
    ref->node resolution joins are deliberately NOT broadcast-hinted — a
    shuffled join on ``ref`` is the correct planet plan, and AQE converts
    it to broadcast at runtime whenever the node side is actually small
    (fixture scale), so nothing is lost locally.
    """
    import os

    from geoutils_spark.functions import s2cells as S2

    os.makedirs(out_dir, exist_ok=True)
    resolved = (
        ways.select(F.col("id").alias("way_id"), "refs", "tags",
                    F.explode("refs").alias("ref"))
        .join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), on="ref")
    )
    resolved = S2.with_s2_cell(resolved, "lon", "lat", level, "__cell")
    resolved = resolved.withColumn(
        "cell_hex", F.concat(F.lit(CELL_PREFIX),
                             S2.s2_hex_col(F.col("__cell"))))
    # a way belongs to EVERY cell any of its nodes touches; within a cell,
    # nodes write once (distinct) — s2splitter.cpp:110-127 semantics
    # dropDuplicates on key columns only: MapType tags are not orderable,
    # so a full-row distinct would fail — the keys identify the row anyway
    way_cells = resolved.select("cell_hex", "way_id", "refs", "tags") \
        .dropDuplicates(["cell_hex", "way_id"])
    # nodes needed per cell = all nodes of all member ways (not only the
    # in-cell ones — the reference writes the full way node set it has)
    cell_nodes = (
        way_cells.select("cell_hex", F.explode("refs").alias("ref")).distinct()
        .join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), on="ref")
    )
    return _write_grouped_pbf(cell_nodes.withColumnRenamed("cell_hex", "grp"),
                              way_cells.withColumnRenamed("cell_hex", "grp"),
                              out_dir)


def _write_grouped_pbf(cell_nodes: DataFrame, way_cells: DataFrame,
                       out_dir: str) -> list[str]:
    """Shared grouped sink: (grp, ref, lon, lat) nodes + (grp, way_id, refs,
    tags) ways -> one ``<grp>.osm.pbf`` per group, nodes-then-ways (the S7
    consolidation ordering), one task per group (lock-free S6)."""
    import os

    from geoutils_spark.sources.osmpbf import write_osm_pbf

    os.makedirs(out_dir, exist_ok=True)
    n = cell_nodes.select("grp", F.col("ref").alias("id"), "lon", "lat") \
        .withColumn("__kind", F.lit(0))
    w = way_cells.select("grp", F.col("way_id").alias("id"), "refs", "tags") \
        .withColumn("__kind", F.lit(1))
    union = n.unionByName(w, allowMissingColumns=True) \
        .repartition(F.col("grp")) \
        .sortWithinPartitions("grp", "__kind", "id")

    def write_partition(rows):
        cur = None
        nbuf: list[tuple] = []
        wbuf: list[tuple] = []

        def flush():
            if cur is not None and (nbuf or wbuf):
                write_osm_pbf(os.path.join(out_dir, f"{cur}.osm.pbf"),
                              nbuf, wbuf)

        for r in rows:
            if r["grp"] != cur:
                flush()
                cur = r["grp"]
                nbuf, wbuf = [], []
            if r["__kind"] == 0:
                nbuf.append((r["id"], r["lon"], r["lat"]))
            else:
                wbuf.append((r["id"], list(r["refs"]), dict(r["tags"])))
        flush()

    union.foreachPartition(write_partition)
    return sorted(f for f in os.listdir(out_dir) if f.endswith(".osm.pbf"))


def write_leaf_split_pbf(nodes: DataFrame, ways: DataFrame, out_dir: str,
                         plan) -> list[str]:
    """The complete osmsplit tool: one ``<leaf>.osm.pbf`` per split-plan
    leaf (filenames ``{prefix}{binary path}`` — the reference's 2^L files
    ``test[01]{4}.osm.pbf``, /root/reference/test.py:63-74). A way routes
    to EVERY leaf its node-bbox overlaps (filesForBox,
    osmsplitconfig.cpp:128-154; way pass osmsplitwriter.cpp:150-180), with
    its full node set; per-leaf nodes dedupe. Node-resolution joins are
    un-hinted (shuffle at planet scale, AQE-broadcast when small) — see
    ``write_s2_split_pbf``.
    """
    from geoutils_spark.operators.partitioner import leaf_names_for_bbox_col

    resolved = (
        ways.select(F.col("id").alias("way_id"), "refs", "tags",
                    F.explode("refs").alias("ref"))
        .join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), on="ref")
    )
    boxed = resolved.groupBy("way_id").agg(
        F.first("refs").alias("refs"), F.first("tags").alias("tags"),
        F.min("lon").alias("__minx"), F.min("lat").alias("__miny"),
        F.max("lon").alias("__maxx"), F.max("lat").alias("__maxy"),
    )
    boxed = boxed.withColumn(
        "grp",
        F.explode(leaf_names_for_bbox_col(
            plan, F.col("__minx"), F.col("__miny"),
            F.col("__maxx"), F.col("__maxy"))))
    way_cells = boxed.select("grp", "way_id", "refs", "tags")
    cell_nodes = (
        way_cells.select("grp", F.explode("refs").alias("ref")).distinct()
        .join(nodes.select(F.col("id").alias("ref"), "lon", "lat"), on="ref")
    )
    written = _write_grouped_pbf(cell_nodes, way_cells, out_dir)
    # the reference pre-creates one writer file per leaf before streaming
    # (osmsplitwriter.cpp:17-48), so a leaf no way routed to still yields a
    # (header-only) file — its test asserts all 2^L files exist. Backfill
    # driver-side: bounded at the leaf count.
    import os

    from geoutils_spark.sources.osmpbf import write_osm_pbf

    for leaf in plan.leaves():
        fn = f"{leaf.name}.osm.pbf"
        if fn not in written:
            write_osm_pbf(os.path.join(out_dir, fn), [], [])
    return sorted(f for f in os.listdir(out_dir) if f.endswith(".osm.pbf"))


def write_svg_polygons(df: DataFrame, out_dir: str, ring: str = "ring",
                       group_col: str | None = None,
                       scale: float = 10.0) -> None:
    """G11 SVG debug render — the reference's ``writeSvg``
    (/root/reference/osm2assimp/utils.cpp:230-258, ground.cpp:104-116):
    one ``.svg`` per group with a ``<polygon points=...>`` per ring,
    coordinates shifted by the group bbox min (padded by 1 unit) and
    multiplied by ``scale``, stroke white / fill none, no y-flip (the
    reference doesn't flip either). ``ring`` is array<struct<lon,lat>>.

    Same one-task-per-file grouped shape as the OBJ sink; the group bbox
    rides along as window aggregates so the writer is a single pass."""
    import os

    from pyspark.sql import Window

    if group_col is None:
        group_col = "__grp"
        df = df.withColumn(group_col, F.lit("debug"))
    xs = F.transform(F.col(ring), lambda p: p["lon"])
    ys = F.transform(F.col(ring), lambda p: p["lat"])
    df = df.withColumn("__rminx", F.array_min(xs)) \
           .withColumn("__rminy", F.array_min(ys)) \
           .withColumn("__rmaxx", F.array_max(xs)) \
           .withColumn("__rmaxy", F.array_max(ys))
    w = Window.partitionBy(group_col)
    df = (df.withColumn("__minx", F.min("__rminx").over(w) - 1.0)
            .withColumn("__miny", F.min("__rminy").over(w) - 1.0)
            .withColumn("__maxx", F.max("__rmaxx").over(w) + 1.0)
            .withColumn("__maxy", F.max("__rmaxy").over(w) + 1.0))
    df = df.repartition(F.col(group_col))
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        handles = {}
        try:
            for r in rows:
                g = r[group_col]
                if g not in handles:
                    vw = (r["__maxx"] - r["__minx"]) * scale
                    vh = (r["__maxy"] - r["__miny"]) * scale
                    f = open(os.path.join(out_dir, f"{g}.svg"), "w")
                    f.write(f'<svg viewBox="0 0 {vw} {vh}" '
                            f'xmlns="http://www.w3.org/2000/svg">\n')
                    handles[g] = f
                f = handles[g]
                pts = " ".join(
                    f"{(p['lon'] - r['__minx']) * scale},"
                    f"{(p['lat'] - r['__miny']) * scale}"
                    for p in r[ring])
                f.write(f'<polygon points="{pts}" fill="none" '
                        f'stroke="white" />\n')
        finally:
            for f in handles.values():
                f.write("</svg>\n")
                f.close()

    df.foreachPartition(write_partition)


def write_gltf_meshes(meshes: DataFrame, out_dir: str,
                      group_col: str | None = None) -> None:
    """S8 sink, glTF 2.0 flavor: one ``.gltf`` per group — the modern
    interchange format among the reference's assimp export targets
    (obj/fbx/gltf/dae, assimpwriter.cpp:16-28). glTF 2.0 is an open JSON +
    binary-buffer spec, so the writer is dependency-free: one embedded
    base64 buffer per file holding float32 POSITION + uint32 indices, one
    mesh node per way. Same grouped one-task-per-file shape as the OBJ
    sink.

    Attribute-bearing meshes (MESH_ATTR_SCHEMA) add NORMAL and — when the
    mesh carries a UV set — TEXCOORD_0 accessors. glTF mandates VEC2
    texcoords, so the reference's featureId channel (UV.z) is dropped
    here; the OBJ sink preserves it, and way_id carries the same value.
    Faces with >3 vertices (attribute-layout n-gon caps, ribbon quads)
    are fan-triangulated on write — primitive mode 4 is triangles-only."""
    import base64
    import json
    import os
    import struct as _st

    df = meshes
    has_attrs = "nx" in meshes.columns
    if group_col is None:
        group_col = "__grp"
        df = df.withColumn(group_col, F.lit("scene"))
    df = df.repartition(F.col(group_col))
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        scenes: dict[str, list] = {}
        for r in rows:
            scenes.setdefault(r[group_col], []).append(r)
        for grp, ms in scenes.items():
            buf = bytearray()
            accessors, views, meshes_js, nodes_js = [], [], [], []
            for m in ms:
                pos = b"".join(_st.pack("<fff", x, y, z)
                               for x, y, z in zip(m["vx"], m["vy"], m["vz"]))
                tris = [(f[0], f[k], f[k + 1])
                        for f in m["faces"] for k in range(1, len(f) - 1)]
                idx = b"".join(_st.pack("<I", i) for t in tris for i in t)
                pview = len(views)
                views.append({"buffer": 0, "byteOffset": len(buf),
                              "byteLength": len(pos), "target": 34962})
                buf.extend(pos)
                iview = len(views)
                views.append({"buffer": 0, "byteOffset": len(buf),
                              "byteLength": len(idx), "target": 34963})
                buf.extend(idx)
                pacc = len(accessors)
                accessors.append({
                    "bufferView": pview, "componentType": 5126,
                    "count": len(m["vx"]), "type": "VEC3",
                    "min": [min(m["vx"]), min(m["vy"]), min(m["vz"])],
                    "max": [max(m["vx"]), max(m["vy"]), max(m["vz"])],
                })
                iacc = len(accessors)
                accessors.append({"bufferView": iview, "componentType": 5125,
                                  "count": 3 * len(tris), "type": "SCALAR"})
                attrs = {"POSITION": pacc}
                if has_attrs:
                    nrm = b"".join(
                        _st.pack("<fff", x, y, z)
                        for x, y, z in zip(m["nx"], m["ny"], m["nz"]))
                    nview = len(views)
                    views.append({"buffer": 0, "byteOffset": len(buf),
                                  "byteLength": len(nrm), "target": 34962})
                    buf.extend(nrm)
                    attrs["NORMAL"] = len(accessors)
                    accessors.append({"bufferView": nview,
                                      "componentType": 5126,
                                      "count": len(m["nx"]), "type": "VEC3"})
                    if len(m["tu"]) > 0:
                        uv = b"".join(_st.pack("<ff", u, v)
                                      for u, v in zip(m["tu"], m["tv"]))
                        tview = len(views)
                        views.append({"buffer": 0, "byteOffset": len(buf),
                                      "byteLength": len(uv),
                                      "target": 34962})
                        buf.extend(uv)
                        attrs["TEXCOORD_0"] = len(accessors)
                        accessors.append({"bufferView": tview,
                                          "componentType": 5126,
                                          "count": len(m["tu"]),
                                          "type": "VEC2"})
                meshes_js.append({
                    "name": f"way_{m['way_id']}",
                    "primitives": [{"attributes": attrs,
                                    "indices": iacc, "mode": 4}],
                })
                nodes_js.append({"mesh": len(meshes_js) - 1,
                                 "name": f"way_{m['way_id']}"})
            gltf = {
                "asset": {"version": "2.0", "generator": "geoutils_spark"},
                "scene": 0,
                "scenes": [{"nodes": list(range(len(nodes_js)))}],
                "nodes": nodes_js,
                "meshes": meshes_js,
                "accessors": accessors,
                "bufferViews": views,
                "buffers": [{
                    "byteLength": len(buf),
                    "uri": "data:application/octet-stream;base64,"
                           + base64.b64encode(bytes(buf)).decode(),
                }],
            }
            with open(os.path.join(out_dir, f"{grp}.gltf"), "w") as f:
                json.dump(gltf, f)

    df.foreachPartition(write_partition)


def write_dae_meshes(meshes: DataFrame, out_dir: str,
                     group_col: str | None = None) -> None:
    """S8 sink, Collada 1.4.1 flavor: one ``.dae`` per group — the last of
    the reference's assimp export targets that is an open plain-text spec
    (obj/fbx/gltf/dae, /root/reference/osm2assimp/assimpwriter.cpp:16-28;
    fbx stays the documented closed-binary seam). Collada is pure XML, so
    the writer is dependency-free: one ``<geometry>`` per way holding a
    float ``<source>`` + ``<triangles>`` primitive, one ``<node>``
    instancing it in the visual scene. Faces with >3 vertices are
    fan-triangulated on write (Collada ``<triangles>`` is triangles-only;
    the OBJ sink preserves polygons verbatim). Same grouped
    one-task-per-file shape as the OBJ/glTF sinks; timestamps are fixed so
    output is byte-deterministic for a given grouping.

    Attribute-bearing meshes (MESH_ATTR_SCHEMA) add a per-vertex NORMAL
    source sharing the position index stream (layouts are 1:1). UVs stay
    with the OBJ/glTF sinks — Collada texcoords need materials/effects
    plumbing that this debug-grade exporter deliberately omits.
    """
    import os
    from xml.sax.saxutils import escape as _xesc

    df = meshes
    has_attrs = "nx" in meshes.columns
    if group_col is None:
        group_col = "__grp"
        df = df.withColumn(group_col, F.lit("scene"))
    df = df.repartition(F.col(group_col))
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(rows):
        handles = {}
        nodes = {}
        body_ok = False
        try:
            for r in rows:
                g = r[group_col]
                if g not in handles:
                    f = open(os.path.join(out_dir, f"{g}.dae"), "w")
                    handles[g] = f
                    nodes[g] = []
                    f.write('<?xml version="1.0" encoding="utf-8"?>\n')
                    f.write('<COLLADA xmlns="http://www.collada.org/2005/'
                            '11/COLLADASchema" version="1.4.1">\n')
                    f.write('  <asset>\n'
                            '    <contributor><authoring_tool>geoutils_spark'
                            '</authoring_tool></contributor>\n'
                            '    <created>1970-01-01T00:00:00</created>\n'
                            '    <modified>1970-01-01T00:00:00</modified>\n'
                            '    <unit name="meter" meter="1"/>\n'
                            '    <up_axis>Z_UP</up_axis>\n'
                            '  </asset>\n')
                    f.write('  <library_geometries>\n')
                f = handles[g]
                wid = _xesc(str(r["way_id"]))
                nodes[g].append(wid)
                nv = len(r["vx"])
                tris = []
                for face in r["faces"]:
                    for k in range(1, len(face) - 1):
                        tris.append((face[0], face[k], face[k + 1]))
                coords = " ".join(
                    f"{x!r} {y!r} {z!r}"
                    for x, y, z in zip(r["vx"], r["vy"], r["vz"]))
                norm_src = norm_input = ""
                if has_attrs:
                    norms = " ".join(
                        f"{x!r} {y!r} {z!r}"
                        for x, y, z in zip(r["nx"], r["ny"], r["nz"]))
                    norm_src = (
                        f'        <source id="way_{wid}-nrm">\n'
                        f'          <float_array id="way_{wid}-nrm-array" '
                        f'count="{3 * nv}">{norms}</float_array>\n'
                        f'          <technique_common>\n'
                        f'            <accessor source="#way_{wid}-nrm-array" '
                        f'count="{nv}" stride="3">\n'
                        f'              <param name="X" type="float"/>\n'
                        f'              <param name="Y" type="float"/>\n'
                        f'              <param name="Z" type="float"/>\n'
                        f'            </accessor>\n'
                        f'          </technique_common>\n'
                        f'        </source>\n')
                    norm_input = (
                        f'          <input semantic="NORMAL" '
                        f'source="#way_{wid}-nrm" offset="0"/>\n')
                f.write(f'    <geometry id="way_{wid}-mesh" name="way_{wid}">\n'
                        f'      <mesh>\n'
                        f'        <source id="way_{wid}-pos">\n'
                        f'          <float_array id="way_{wid}-pos-array" '
                        f'count="{3 * nv}">{coords}</float_array>\n'
                        f'          <technique_common>\n'
                        f'            <accessor source="#way_{wid}-pos-array" '
                        f'count="{nv}" stride="3">\n'
                        f'              <param name="X" type="float"/>\n'
                        f'              <param name="Y" type="float"/>\n'
                        f'              <param name="Z" type="float"/>\n'
                        f'            </accessor>\n'
                        f'          </technique_common>\n'
                        f'        </source>\n'
                        + norm_src +
                        f'        <vertices id="way_{wid}-vtx">\n'
                        f'          <input semantic="POSITION" '
                        f'source="#way_{wid}-pos"/>\n'
                        f'        </vertices>\n'
                        f'        <triangles count="{len(tris)}">\n'
                        f'          <input semantic="VERTEX" '
                        f'source="#way_{wid}-vtx" offset="0"/>\n'
                        + norm_input +
                        f'          <p>'
                        + " ".join(f"{a} {b} {c}" for a, b, c in tris)
                        + '</p>\n'
                        f'        </triangles>\n'
                        f'      </mesh>\n'
                        f'    </geometry>\n')
            body_ok = True
        finally:
            # Footers ONLY on the success path: a task that dies
            # mid-partition must leave a structurally INVALID (truncated)
            # file, not a valid-looking silently-incomplete one. Handles
            # always close, even when a footer write itself raises
            # mid-dict (first such error re-raised after all closes).
            footer_err = None
            for g, f in handles.items():
                try:
                    if body_ok:
                        f.write('  </library_geometries>\n')
                        f.write('  <library_visual_scenes>\n'
                                '    <visual_scene id="Scene" name="Scene">\n')
                        for wid in nodes[g]:
                            f.write(f'      <node id="way_{wid}" '
                                    f'name="way_{wid}">'
                                    f'<instance_geometry url="#way_{wid}-mesh"/>'
                                    f'</node>\n')
                        f.write('    </visual_scene>\n'
                                '  </library_visual_scenes>\n'
                                '  <scene><instance_visual_scene url="#Scene"/>'
                                '</scene>\n'
                                '</COLLADA>\n')
                except Exception as e:  # noqa: BLE001 — refired below
                    footer_err = footer_err or e
                finally:
                    f.close()
            if body_ok and footer_err is not None:
                raise footer_err

    df.foreachPartition(write_partition)
