"""Independent scalar oracle for tile grouping (quadtreetree.rs:60-397).

A from-scratch, dict-based, recursive re-implementation of the
reference's QuadtreeTree build / find_within / find_tree_groups / find —
sharing NO code with osmquadtree_rust_spark.operators.tiles (which is a
vectorized path-compressed build).  tests/test_tiles.py asserts both
produce identical groups and routing on random histograms, closing the
oracle-independence loop for the tile_assignment gate.
"""

from __future__ import annotations


def _round(qt: int, level: int) -> int:
    if (qt & 31) <= level:
        return qt
    q = (qt >> (63 - 2 * level)) << (63 - 2 * level)
    return q + level


class Node:
    __slots__ = ("qt", "weight", "total", "children", "parent")

    def __init__(self, qt: int, parent: "Node | None"):
        self.qt = qt
        self.weight = 0
        self.total = 0
        self.children: dict[int, Node] = {}
        self.parent = parent


class OracleTree:
    """Insertion-order add()-built prefix tree (quadtreetree.rs:178-209)."""

    def __init__(self):
        self.root = Node(0, None)

    def add(self, qt: int, w: int) -> None:
        assert qt >= 0
        node = self.root
        for i in range(qt & 31):
            node.total += w
            v = (qt >> (61 - 2 * i)) & 3
            if v not in node.children:
                node.children[v] = Node(_round(qt, i + 1), node)
            node = node.children[v]
        node.weight += w
        node.total += w

    def total_weight(self) -> int:
        return self.root.total

    def find(self, qt: int) -> int:
        """Deepest weighted ancestor-or-self of qt, else root cell 0
        (quadtreetree.rs:110-142)."""
        node = self.root
        path = [node]
        for i in range(qt & 31):
            v = (qt >> (61 - 2 * i)) & 3
            if v not in node.children:
                break
            node = node.children[v]
            path.append(node)
        for n in reversed(path):
            if n.weight > 0:
                return n.qt
        return self.root.qt

    def _remove(self, qt: int) -> int:
        """Detach deepest node on qt's path, fixing ancestor totals
        (quadtreetree.rs:144-176)."""
        node = self.root
        for i in range(qt & 31):
            v = (qt >> (61 - 2 * i)) & 3
            if v not in node.children:
                break
            node = node.children[v]
        w = node.total
        node.weight = 0
        node.total = 0
        node.children = {}
        p = node.parent
        if p is not None:
            for v, c in list(p.children.items()):
                if c is node:
                    del p.children[v]
            while p is not None:
                p.total -= w
                p = p.parent
        return w

    def _find_within(self, mintarget: int, maxtarget: int, absmin: int):
        """Recursive preorder sweep (quadtreetree.rs:306-355)."""
        res = []
        if self.total_weight() < mintarget:
            res.append((0, self.total_weight()))
            return res

        def visit(node: Node):
            if node.total < mintarget:
                return
            small_children = all(
                c.total <= absmin for c in node.children.values()
            )
            if node.weight > 0 and (
                node.total <= maxtarget
                or node.total == node.weight
                or small_children
            ):
                res.append((node.qt, node.total))
                return
            for v in range(4):
                if v in node.children:
                    visit(node.children[v])

        visit(self.root)
        return res

    def find_tree_groups(self, target: int, absmin: int):
        """quadtreetree.rs:357-397 incl. the +-50 relaxation; returns the
        sorted (cell, weight) group list."""
        mintarget, maxtarget = target - 50, target + 50
        groups = []
        while self.total_weight() > 0:
            vv = self._find_within(mintarget, maxtarget, absmin)
            if not vv:
                mintarget = max(absmin, mintarget - 50)
                maxtarget += 50
            else:
                for a, _ in vv:
                    groups.append((a, self._remove(a)))
        groups.sort()
        return groups
