"""OSM PBF parser / writer / distributed-read / way-assembly tests.

Reference analog: `extensions/cli/osm/.../parser/OsmPbfParser.java:197-259`
(delta DenseNodes + keys_vals layout) and
`mapreduce/Convert/OsmProvider/OsmProvider.java:138-212` (way assembly).
"""
from __future__ import annotations

import os

from geowave_spark.table import osm


def _fixture(tmp_path, n_nodes=25, with_tags=True):
    nodes = []
    for i in range(n_nodes):
        lon_nano = (i * 7_919_000 % 360_000_000_000) - 180_000_000_000
        lat_nano = (i * 104_729_000 % 180_000_000_000) - 90_000_000_000
        # granularity 100 requires nanodegree multiples of 100
        lon_nano -= lon_nano % 100
        lat_nano -= lat_nano % 100
        tags = {"name": f"n{i}", "amenity": "cafe"} if (with_tags and i % 3 == 0) else {}
        nodes.append((i + 1, lon_nano, lat_nano, tags))
    ways = [
        (101, [1, 2, 3, 4], {"highway": "residential"}),
        (102, [5, 6, 7, 5], {"building": "yes"}),  # closed ring
        (103, [8, 9], {}),
    ]
    rels = [
        (201, [(101, "outer", "way"), (1, "admin_centre", "node")],
         {"type": "multipolygon"}),
    ]
    path = os.path.join(tmp_path, "fixture.pbf")
    osm.write_osm_pbf(path, nodes, ways, rels, block_size=10)
    return path, nodes, ways, rels


def test_roundtrip_local_decode(tmp_path):
    path, nodes, ways, rels = _fixture(str(tmp_path))
    index = osm.osm_block_index(path)
    assert index[0][3] == "OSMHeader"
    data_blocks = [b for b in index if b[3] == "OSMData"]
    assert len(data_blocks) >= 3  # 25 nodes / block_size 10 + way block
    got_nodes, got_ways, got_rels = [], [], []
    with open(path, "rb") as fh:
        for _p, off, size, _t in data_blocks:
            fh.seek(off)
            n, w, r = osm.decode_primitive_block(fh.read(size))
            got_nodes += n
            got_ways += w
            got_rels += r
    assert len(got_nodes) == len(nodes)
    for (nid, lon, lat, tags), (gid, glon, glat, gtags) in zip(nodes, got_nodes):
        assert (nid, lon, lat) == (gid, glon, glat)
        if tags:
            import json
            assert json.loads(gtags) == tags
        else:
            assert gtags is None
    assert [(w[0], w[1]) for w in got_ways] == [(w[0], w[1]) for w in ways]
    assert got_rels[0][0] == 201
    assert got_rels[0][1] == [(101, "outer", "way"), (1, "admin_centre", "node")]


def test_negative_coordinates_delta_encoding(tmp_path):
    # descending ids and sign-crossing coords exercise zigzag + delta
    nodes = [(10, -179_000_000_000, -89_000_000_000, {}),
             (11, 179_000_000_000, 89_000_000_000, {}),
             (12, -100, 100, {})]
    path = os.path.join(str(tmp_path), "neg.pbf")
    osm.write_osm_pbf(path, nodes, [], [])
    blocks = [b for b in osm.osm_block_index(path) if b[3] == "OSMData"]
    with open(path, "rb") as fh:
        fh.seek(blocks[0][1])
        got, _, _ = osm.decode_primitive_block(fh.read(blocks[0][2]))
    assert [(g[0], g[1], g[2]) for g in got] == [(n[0], n[1], n[2]) for n in nodes]


def test_distributed_read_and_way_assembly(spark, tmp_path):
    path, nodes, ways, _rels = _fixture(str(tmp_path))
    dfs = osm.read_osm_pbf(spark, path)
    assert dfs["nodes"].count() == len(nodes)
    assert dfs["ways"].count() == len(ways)
    assert dfs["relations"].count() == 1

    lines = osm.ways_to_lines(dfs["nodes"], dfs["ways"]).collect()
    by_id = {r.id: r for r in lines}
    assert by_id[101].n_nodes == 4 and not by_id[101].closed
    assert by_id[102].n_nodes == 4 and by_id[102].closed
    assert by_id[103].n_nodes == 2 and not by_id[103].closed
    # wkt coordinates are the node coords in ref order
    lon1 = nodes[0][1] / 1e9
    assert by_id[101].wkt.startswith(f"LINESTRING ({lon1} ")
    assert by_id[101].tags == '{"highway": "residential"}'


def test_block_parallelism_plan(spark, tmp_path):
    # one FILE becomes many independent block tasks (the planet-file story)
    path, _n, _w, _r = _fixture(str(tmp_path), n_nodes=100)
    index = [b for b in osm.osm_block_index(path) if b[3] == "OSMData"]
    assert len(index) >= 10  # block_size=10
    dfs = osm.read_osm_pbf(spark, path)
    assert dfs["nodes"].rdd.getNumPartitions() > 1


def test_relations_to_multipolygons(spark, tmp_path):
    """Multipolygon relation: closed outer ring, an inner ring split into
    two OPEN member ways (exercises endpoint stitching incl. a reversed
    leg), plus a second stand-alone outer — reference analog
    `OsmProvider.java` relation conversion + `OSMRelationMapper.java`."""
    import json

    # grid of nanodegree coords (multiples of 100 for granularity)
    def nd(v):
        return v * 1_000_000_000

    nodes = [
        # outer square (0,0)-(10,10), ids 1-4
        (1, nd(0), nd(0), {}), (2, nd(10), nd(0), {}),
        (3, nd(10), nd(10), {}), (4, nd(0), nd(10), {}),
        # inner square (2,2)-(4,4), ids 5-8
        (5, nd(2), nd(2), {}), (6, nd(4), nd(2), {}),
        (7, nd(4), nd(4), {}), (8, nd(2), nd(4), {}),
        # second outer triangle far away, ids 9-11
        (9, nd(50), nd(50), {}), (10, nd(52), nd(50), {}),
        (11, nd(51), nd(52), {}),
    ]
    ways = [
        (100, [1, 2, 3, 4, 1], {}),          # closed outer
        (101, [5, 6, 7], {}),                # inner half (open)
        (102, [5, 8, 7], {}),                # inner other half (open, reversed fit)
        (103, [9, 10, 11, 9], {}),           # second outer, no holes
    ]
    rels = [
        (300, [(100, "outer", "way"), (101, "inner", "way"),
               (102, "inner", "way"), (103, "outer", "way")],
         {"type": "multipolygon", "name": "mp"}),
    ]
    path = os.path.join(str(tmp_path), "mp.pbf")
    osm.write_osm_pbf(path, nodes, ways, rels)
    dfs = osm.read_osm_pbf(spark, path)
    out = osm.relations_to_multipolygons(
        dfs["nodes"], dfs["ways"], dfs["relations"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.id == 300
    assert r.n_outer == 2 and r.n_inner == 1
    assert json.loads(r.tags)["type"] == "multipolygon"
    assert r.wkt.startswith("MULTIPOLYGON (")
    # the hole must be nested inside the (0,0)-(10,10) shell's part
    shell_part = [p for p in r.wkt.split("((")[1:] if "10.0 10.0" in p][0]
    assert shell_part.count("(") >= 1  # carries its hole ring
    assert "2.0 2.0" in shell_part
    # the triangle part carries no hole
    tri_part = [p for p in r.wkt.split("((")[1:] if "51.0 52.0" in p][0]
    assert "2.0 2.0" not in tri_part
