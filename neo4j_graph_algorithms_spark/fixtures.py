"""Reference test graphs transcribed as edge lists (FIXTURES.md).

Vertex names map to ids in listed creation order, 0-based, exactly as
the reference's Cypher CREATE statements order them.
"""

from __future__ import annotations


def _ids(names: str) -> dict[str, int]:
    return {n: i for i, n in enumerate(names.split())}


# F1 — PageRank fixture (tests/.../impl/PageRankTest.java:64-103).
# Vertices a..j carry :Label1; the projection under test keeps only
# TYPE1 edges among them (TYPE2 edges excluded).
PAGERANK_IDS = _ids("a b c d e f g h i j")
PAGERANK_EDGES = [
    ("b", "c"), ("c", "b"),
    ("d", "a"), ("d", "b"),
    ("e", "b"), ("e", "d"), ("e", "f"),
    ("f", "b"), ("f", "e"),
]
PAGERANK_GOLDEN_40 = {  # d=0.85, 40 iterations, tol 1e-2 (PageRankTest.java:133-142)
    "a": 0.243007, "b": 1.9183995, "c": 1.7806315, "d": 0.21885, "e": 0.243007,
    "f": 0.21885, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15,
}
PAGERANK_GOLDEN_20 = {  # proc defaults, tol 0.1 (PageRankProcIntegrationTest.java:113-122)
    "a": 0.243, "b": 1.844, "c": 1.777, "d": 0.218, "e": 0.243,
    "f": 0.218, "g": 0.150, "h": 0.150, "i": 0.150, "j": 0.150,
}

# F2 — PageRank wiki graph with dangling node (PageRankWikiTest.java:61-142).
WIKI_IDS = _ids("a b c d e f g h i j k")
WIKI_EDGES = [
    ("b", "c"), ("c", "b"),
    ("d", "a"), ("d", "b"),
    ("e", "b"), ("e", "d"), ("e", "f"),
    ("f", "b"), ("f", "e"),
    ("g", "b"), ("g", "e"),
    ("h", "b"), ("h", "e"),
    ("i", "b"), ("i", "e"),
    ("j", "e"), ("k", "e"),
]
WIKI_GOLDEN_40 = {
    "a": 0.3040965, "b": 3.5658695, "c": 3.180981, "d": 0.3625935,
    "e": 0.7503465, "f": 0.3625935, "g": 0.15, "h": 0.15, "i": 0.15,
    "j": 0.15, "k": 0.15,
}

# F3 — UnionFind fixture (UnionFindProcIntegrationTest.java:54-79).
WCC_IDS = _ids("nA nB nC nD nE nF nG nH nI nJ")
WCC_EDGES = [  # (src, dst, cost); None = property absent → load default
    ("nA", "nB", None), ("nB", "nC", None), ("nC", "nD", None),
    ("nD", "nE", 4.2),
    ("nE", "nF", None), ("nF", "nG", None),
    ("nH", "nI", None),
]
WCC_EXPECT_SIZES = [7, 2, 1]                # full graph
# threshold tests load with weightProperty:'cost', defaultValue:10.0
# (UnionFindProcIntegrationTest.java:154,165)
WCC_EXPECT_SIZES_T5 = [4, 3, 2, 1]          # threshold=5.0 splits the 4.2 edge
WCC_EXPECT_SIZES_T314 = [7, 2, 1]           # threshold=3.14 keeps it (>=)

# F4 — 16 disjoint 10-node line graphs (UnionFindsTest.java:32-90).
def wcc_lines_fixture(sets: int = 16, set_size: int = 10):
    edges = []
    for s in range(sets):
        base = s * set_size
        for i in range(set_size - 1):
            edges.append((base + i, base + i + 1))
    vertices = list(range(sets * set_size))
    return vertices, edges


# F5 — Label propagation fixture
# (LabelPropagationProcIntegrationTest.java:49-63).  Nodes 0..11;
# a=0 (:A), b=1 (:B); leaves 2..6 attach to a, 7..11 to b.
# vertices: (id, label_class, partition, node_weight)
LP_VERTICES = [
    (0, "A", 42, 1.0),
    (1, "B", 42, 1.0),
    (2, "A", 1, 1.0),
    (3, "A", 1, 2.0),
    (4, "A", 1, 1.0),
    (5, "A", 1, 1.0),
    (6, "A", 2, 8.0),
    (7, "B", 1, 1.0),
    (8, "B", 1, 2.0),
    (9, "B", 1, 1.0),
    (10, "B", 1, 1.0),
    (11, "B", 2, 8.0),
]
LP_EDGES = [(0, t) for t in (2, 3, 4, 5, 6)] + [(1, t) for t in (7, 8, 9, 10, 11)]

# F6 — Triangle fixture (TriangleProcTest.java:44-106); creation order
# a,f,c,e,i,b,h,d,g → ids.
TRI_IDS = {"a": 0, "f": 1, "c": 2, "e": 3, "i": 4, "b": 5, "h": 6, "d": 7, "g": 8}
TRI_EDGES_NAMED = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "h"),
    ("d", "e"), ("e", "f"), ("f", "d"),
    ("b", "d"),
    ("g", "h"), ("h", "i"), ("i", "g"),
]
TRI_EDGES = [(TRI_IDS[s], TRI_IDS[t]) for s, t in TRI_EDGES_NAMED]
TRI_TRIANGLES_NAMED = [{"a", "b", "c"}, {"d", "e", "f"}, {"g", "h", "i"}]

# F7 — Clustering coefficient wiki fixture
# (ClusteringCoefficientWikiTest.java:60-103).
CC_IDS = _ids("a b c d")
CC_EDGES = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "d")]
CC_EXPECTED = {"a": 1.0 / 3.0, "b": 1.0, "c": 0.0, "d": 1.0}
CC_EXPECTED_AVG = 0.583  # ±0.01


def named_edges_to_ids(edges, ids):
    out = []
    for e in edges:
        if len(e) == 2:
            out.append((ids[e[0]], ids[e[1]]))
        else:
            out.append((ids[e[0]], ids[e[1]], e[2]))
    return out
