"""spark-submit packaging: the --py-files zip must be importable on its own
(what every executor does with the artifact)."""

from __future__ import annotations

import subprocess
import sys


def test_pyfiles_zip_is_self_contained(tmp_path):
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        f"find ai_knowledge_graph_spark -name '*.py' | zip -q {zip_path} -@",
        shell=True, check=True, cwd="/root/repo",
    )
    # import from the zip ONLY (empty cwd, zip first on sys.path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import ai_knowledge_graph_spark.pipeline as p\n"
        "import ai_knowledge_graph_spark.operators.extraction\n"
        "import ai_knowledge_graph_spark.operators.standardize\n"
        "import ai_knowledge_graph_spark.operators.inference\n"
        "import ai_knowledge_graph_spark.lineage\n"
        "print('zip-import-ok', hasattr(p, 'run_pipeline'))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zip_path)],
        capture_output=True, text=True, cwd=str(tmp_path), check=True,
    )
    assert "zip-import-ok True" in out.stdout


def test_submit_entry_help():
    out = subprocess.run(
        [sys.executable, "scripts/submit_pipeline.py", "--help"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0
    assert "--checkpoint-dir" in out.stdout


def test_generate_graph_cli_test_mode(tmp_path):
    """Local CLI parity entry (main.py:240-317): --test renders sample data."""
    import os

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [
            sys.executable, "scripts/generate_graph.py", "--test",
            "--output", str(tmp_path / "kg.html"),
            "--json-output", str(tmp_path / "kg.json"),
        ],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Extracted 21 triples" in out.stdout
    import json

    triples = json.loads((tmp_path / "kg.json").read_text())
    assert len(triples) == 21
    assert (tmp_path / "kg.html").read_text().startswith("<!DOCTYPE html>")
