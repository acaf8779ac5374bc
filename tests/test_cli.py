"""CLI tests — the operational surface, driven in-process (no
subprocess: the shared test session is reused via getOrCreate)."""

import json
import os

from nessus_client_etl_scripts_spark.__main__ import main
from nessus_client_etl_scripts_spark.pipeline import fixtures


def _land(spark, path):
    os.makedirs(path)
    runs = f"{path}/runs"
    scans = f"{path}/scans"
    os.makedirs(runs), os.makedirs(scans)
    for s in (0, 1):
        for r in (0, 1):
            doc = fixtures.scan_run_doc(s, r)
            with open(f"{runs}/run_{s}_{r}.json", "w") as f:
                json.dump(doc, f)
    # scan listing docs (with history) as JSON
    for row in fixtures.scan_docs(spark).toJSON().collect():
        d = json.loads(row)
        with open(f"{scans}/scan_{d['id']}.json", "w") as f:
            f.write(row)
    return scans, runs


def test_cli_normalize_and_query(spark, tmp_path, capsys):
    scans, runs = _land(spark, str(tmp_path / "land"))
    silver = str(tmp_path / "silver")

    assert (
        main(
            [
                "normalize",
                "--run-docs", runs,
                "--silver-root", silver,
                "--scan-docs", scans,
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "'scan_run': 4" in out

    assert (
        main(
            ["query", "--silver-root", silver, "scan-stats", "--scan-id", "1"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "rows: 1" in out


def test_cli_export(spark, tmp_path, capsys):
    scans, runs = _land(spark, str(tmp_path / "land"))
    lake = str(tmp_path / "lake")
    rc = main(
        [
            "export",
            "--scan-docs", scans,
            "--run-docs", runs,
            "--lake-root", lake,
            "--deployment-id", "dep-cli",
            "--mode", "lookback",
            "--lookback-days", "1000000",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "'scan_run': 4" in out
    assert os.path.isdir(f"{lake}/scan_run/deployment_id=dep-cli")


def test_cli_compact(spark, tmp_path, capsys):
    from nessus_client_etl_scripts_spark.__main__ import main

    src, dst = str(tmp_path / "s"), str(tmp_path / "d")
    spark.range(1000).repartition(20).write.parquet(src)
    rc = main(["compact", "--src", src, "--dst", dst, "--target-mb", "64"])
    assert rc == 0
    assert "files_before" in capsys.readouterr().out
    assert spark.read.parquet(dst).count() == 1000
