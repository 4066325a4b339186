"""Build the spark-submit artifact: a zip of the package for
``--py-files`` plus an example job script (north rule: "the whole
engine ships as spark-submit --py-files jobs").

Usage:
    python tools/build_pyfiles.py [--out dist/]

Produces ``dist/neo4j_graph_algorithms_spark.zip``; submit with

    spark-submit \
      --py-files dist/neo4j_graph_algorithms_spark.zip \
      jobs/pagerank_job.py --edges s3://.../edges --out s3://.../scores

The zip contains only the package (no tests/tools), importable from
executors exactly as from the repo checkout.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "neo4j_graph_algorithms_spark"


def build(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, f"{PACKAGE}.zip")
    src_root = os.path.join(REPO, PACKAGE)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(src_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist"))
    args = ap.parse_args()
    path = build(args.out)
    print(path)
