"""Filter parsing parity + end-to-end extract plan."""

import pytest

from osmquadtree_rust_spark.functions.parse import bbox_from_str, bbox_from_tile
from osmquadtree_rust_spark.operators.merge import CREATE, DELETE, MODIFY
from osmquadtree_rust_spark.plans import extract as EX


def test_bbox_from_str_syntaxes():
    assert bbox_from_str("-10000,-20000,30000,40000") == (-10000, -20000, 30000, 40000)
    assert bbox_from_str("-1.0,-2.0,3.0,4.0") == (
        -10000000,
        -20000000,
        30000000,
        40000000,
    )
    # float rounding is half-away-from-zero (coordinate_as_integer)
    assert bbox_from_str("0.00000005,-0.00000005,1.0,2.0")[:2] == (1, -1)
    t = bbox_from_str("tile:1,1,2")
    assert t[0] < t[2] and t[1] < t[3]
    assert bbox_from_str("tile:1,1,2:0.5") != t
    with pytest.raises(ValueError):
        bbox_from_str("nope")


def test_extract_end_to_end(spark):
    nodes0 = spark.createDataFrame(
        [(i, i * 10000000, 0, 0) for i in range(1, 7)],
        "id long, lon long, lat long, changetype int",
    )
    # snapshot 2 moves node 1 out of the region and deletes node 3
    nodes1 = spark.createDataFrame(
        [(1, 900000000, 0, MODIFY), (3, 30000000, 0, DELETE)],
        "id long, lon long, lat long, changetype int",
    )
    ways = spark.createDataFrame(
        [(101, [1, 2], 0), (102, [3, 4], 0), (103, [5, 6], 0), (104, [2, 5], 0)],
        "id long, refs array<long>, changetype int",
    )
    rels = spark.createDataFrame(
        [(201, [{"mem_type": 1, "mem_ref": 104}], 0)],
        "id long, members array<struct<mem_type:int, mem_ref:long>>, changetype int",
    )
    out = EX.extract(
        [nodes0, nodes1], [ways], [rels], "5000000,-1,35000000,1", global_sort=True
    )
    # region covers nodes 1,2,3 originally; after changes: node 1 moved
    # away, node 3 deleted -> in-region = {2}; ways touching: 101, 104;
    # exnodes = {1, 5}; rel 201 via way 104
    assert sorted(r.id for r in out["ways"].collect()) == [101, 104]
    assert sorted(r.id for r in out["nodes"].collect()) == [1, 2, 5]
    assert sorted(r.id for r in out["relations"].collect()) == [201]

    blocks = EX.regroup_blocks(out["nodes"], block_size=2).collect()
    assert {r.block for r in blocks} == {0, 1}


def test_timestamp_parse_roundtrip():
    from osmquadtree_rust_spark.functions.parse import (
        date_string,
        parse_timestamp,
        timestamp_string,
        timestamp_string_alt,
    )

    t = parse_timestamp("2020-06-01T12:34:56")
    assert parse_timestamp("2020-06-01T12:34:56Z") == t
    assert parse_timestamp("2020-06-01T12-34-56") == t
    assert parse_timestamp("20200601") == t - (12 * 3600 + 34 * 60 + 56)
    assert timestamp_string(t) == "2020-06-01T12:34:56"
    assert timestamp_string_alt(t) == "2020-06-01T12-34-56"
    assert date_string(t) == "20200601"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_timestamp("June 1st")


def test_zoom_ladder():
    from osmquadtree_rust_spark.functions.parse import EARTH_WIDTH, zoom

    # quadtree.rs:33: zoom(0) spans the world in 256px; halves per level
    assert zoom(0) == 2.0 * EARTH_WIDTH / 256.0
    for z in range(1, 19):
        assert abs(zoom(z) * 2.0 - zoom(z - 1)) < 1e-9
