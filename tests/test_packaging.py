"""The --py-files artifact must be importable on its own (what
executors see after spark-submit ships the zip)."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from build_pyfiles import build  # noqa: E402


def test_zip_imports_standalone(tmp_path):
    zip_path = build(str(tmp_path))
    code = (
        "import sys; sys.path.insert(0, {z!r}); "
        "import neo4j_graph_algorithms_spark as m; "
        "from neo4j_graph_algorithms_spark import driver_queries; "
        "from neo4j_graph_algorithms_spark.operators import scc, mst, msbfs; "
        "print(m.__version__)"
    ).format(z=zip_path)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        # an empty cwd ensures the repo checkout itself is not importable
        cwd=str(tmp_path),
        check=True,
    )
    assert out.stdout.strip()
