"""compareelements-style diff + OSC parsing."""

from osmquadtree_rust_spark.operators import compare as CMP
from osmquadtree_rust_spark.operators.merge import CREATE, DELETE, MODIFY
from osmquadtree_rust_spark.sources import osc as OSC


def test_compare_datasets(spark):
    left = spark.createDataFrame(
        [(1, 10, 20, "a", 100), (2, 11, 21, "b", 200), (3, 12, 22, "c", 300),
         (4, 13, 23, "d", 400), (5, 14, 24, "e", 500)],
        "id long, lon long, lat long, tag string, qt long",
    )
    right = spark.createDataFrame(
        [(1, 10, 20, "a", 100),      # same
         (2, 99, 21, "b", 200),      # data differs
         (3, 12, 22, "X", 300),      # tags differ
         (5, 14, 24, "e", 999),      # qt differs
         (6, 15, 25, "f", 600)],     # only right
        "id long, lon long, lat long, tag string, qt long",
    )
    diff = CMP.compare_datasets(
        left, right, keys=("id",),
        data_cols=("lon", "lat"), tag_cols=("tag",), qt_col="qt",
    )
    cls = {r.id: r.cls for r in diff.collect()}
    assert cls == {
        1: CMP.SAME,
        2: CMP.DIFFERENT_DATA,
        3: CMP.DIFFERENT_TAGS,
        4: CMP.ONLY_LEFT,
        5: CMP.DIFFERENT_QUADTREE,
        6: CMP.ONLY_RIGHT,
    }
    summary = {r.cls: r.n for r in CMP.compare_summary(diff).collect()}
    assert summary[CMP.SAME] == 1 and summary[CMP.ONLY_RIGHT] == 1


OSC_XML = """<?xml version='1.0'?>
<osmChange version="0.6">
 <create>
  <node id="1" version="1" lat="51.5000001" lon="-0.1000001"><tag k="amenity" v="pub"/></node>
  <way id="10" version="1"><nd ref="1"/><nd ref="2"/><tag k="highway" v="path"/></way>
 </create>
 <modify>
  <node id="1" version="2" lat="51.6" lon="-0.2"/>
  <relation id="20" version="3"><member type="way" ref="10" role="outer"/><member type="node" ref="1" role=""/></relation>
 </modify>
 <delete>
  <node id="5" version="4" lat="0" lon="0"/>
 </delete>
</osmChange>
"""


def test_parse_osc_dedup_and_types(spark):
    parsed = OSC.parse_osc(OSC_XML)
    nodes = {r["id"]: r for r in parsed["nodes"]}
    # node 1: version 2 (modify) wins over version 1 (create)
    assert nodes[1]["version"] == 2 and nodes[1]["changetype"] == MODIFY
    assert nodes[1]["lon"] == -2000000 and nodes[1]["lat"] == 516000000
    assert nodes[5]["changetype"] == DELETE
    assert parsed["ways"][0]["refs"] == [1, 2]
    mems = parsed["relations"][0]["members"]
    assert mems[0]["mem_type"] == 1 and mems[0]["mem_ref"] == 10
    assert mems[0]["role"] == "outer"

    ndf, wdf, rdf = OSC.osc_to_dfs(spark, OSC_XML)
    assert ndf.count() == 2 and wdf.count() == 1 and rdf.count() == 1


def test_fixed_point_rounding():
    # round half away from zero, like coordinate_as_integer
    assert OSC._as_fixed("51.5000001") == 515000001
    assert OSC._as_fixed("-0.1000001") == -1000001
    assert OSC._as_fixed("0.00000005") == 1
    assert OSC._as_fixed("-0.00000005") == -1


def test_iter_elements_flat(spark):
    from osmquadtree_rust_spark.operators.compare import iter_elements_flat

    nodes = spark.createDataFrame([(i, i * 10) for i in (5, 1, 3)], "id long, v long")
    ways = spark.createDataFrame([(i, [i]) for i in (9, 2)], "id long, refs array<long>")
    rels = spark.createDataFrame([(7, "x")], "id long, tag string")
    got = [(t, r.id) for t, r in iter_elements_flat(nodes, ways, rels)]
    assert got == [
        ("node", 1), ("node", 3), ("node", 5),
        ("way", 2), ("way", 9),
        ("relation", 7),
    ]
