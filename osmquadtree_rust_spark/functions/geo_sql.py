"""Dialect-neutral SQL generators for geometry predicates.

Emits the same expression text for Spark SQL and DuckDB so engine and
oracle share exact float semantics.
"""

from __future__ import annotations


def pnpoly_sql(vertsx, vertsy, px: str, py: str) -> str:
    """Crossing-number point-in-polygon for a FIXED polygon (degrees),
    exact branch semantics of the reference pnpoly
    (src/mergechanges/filter_elements.rs:89-129).

    px/py are SQL expressions yielding degrees as DOUBLE.
    """
    n = len(vertsx)
    terms = []
    for i in range(n):
        j = n - 1 if i == 0 else i - 1
        vxi, vyi = repr(float(vertsx[i])), repr(float(vertsy[i]))
        vxj, vyj = repr(float(vertsx[j])), repr(float(vertsy[j]))
        terms.append(
            f"(CASE WHEN (({vyi} > ({py})) != ({vyj} > ({py}))) "
            f"AND (({px}) < ({vxj} - {vxi}) * (({py}) - {vyi}) / ({vyj} - {vyi}) + {vxi}) "
            f"THEN 1 ELSE 0 END)"
        )
    return f"((({' + '.join(terms)}) % 2) = 1)"


def bbox_contains_point_sql(bbox, lon: str, lat: str) -> str:
    a, b, c, d = bbox
    return f"(({lon}) >= {a} AND ({lat}) >= {b} AND ({lon}) <= {c} AND ({lat}) <= {d})"
