"""The analyze CLI's report: derived CSVs plus the reference visualizer's
PNG set (`Stage 1/Visualization/mm_perf_visualizer.py:51-102`,
`Stage 3/Visualization/mm_perf_parallel_visualizer.py:77-148`), rendered
by the dependency-free rasterizer in plots.py."""

import struct
import sys

import numpy as np
import pandas as pd
import pytest

from matrix_multiplication_bigdata_ind_assignments_spark import plots


def _png_dims(path):
    with open(path, "rb") as f:
        head = f.read(24)
    assert head[:8] == b"\x89PNG\r\n\x1a\n", "bad PNG signature"
    w, h = struct.unpack(">II", head[16:24])
    return w, h


def test_write_png_signature_and_dims(tmp_path):
    img = np.zeros((10, 20, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    plots.write_png(p, img)
    assert _png_dims(p) == (20, 10)


def test_render_report_writes_full_plot_set(tmp_path):
    rows = []
    for lang in ("python", "pyspark"):
        for size in (64, 256):
            for threads in (1, 4):
                t = (100.0 if lang == "python" else 20.0) * (size / 64) ** 3 / threads
                rows.append(
                    dict(lang=lang, algo="basic", size=size, threads=threads,
                         avg_time_ms=t, rss_mb=10.0 + size,
                         speedup=float(threads), efficiency=1.0)
                )
    written = plots.render_report(pd.DataFrame(rows), str(tmp_path))
    names = {p.rsplit("/", 1)[1] for p in written}
    assert {"mm_perf_time.png", "mm_perf_memory.png"} <= names
    # thread sweep present → per-size parallel plots too
    for n in (64, 256):
        for stem in ("parallel_speedup", "parallel_efficiency", "parallel_time"):
            assert f"{stem}_{n}.png" in names
    for p in written:
        w, h = _png_dims(p)
        assert w > 100 and h > 100


def test_analyze_cli_end_to_end(tmp_path, monkeypatch):
    """analyze --out writes derived metrics CSVs and non-empty PNGs."""
    csv = tmp_path / "results_python.csv"
    lines = ["lang,algo,size,threads,repeats,avg_time_ms,rss_mb,extra"]
    for size, t1 in ((64, 100.0), (128, 800.0)):
        for threads in (1, 2, 4):
            lines.append(f"python,basic,{size},{threads},3,{t1 / threads},50.0,x")
    csv.write_text("\n".join(lines) + "\n")

    out = tmp_path / "report"
    from matrix_multiplication_bigdata_ind_assignments_spark.__main__ import main

    monkeypatch.setattr(sys, "argv", ["mmbd", "analyze", str(csv), "--out", str(out)])
    assert main() == 0
    assert (out / "mm_perf_time.png").stat().st_size > 0
    assert (out / "mm_perf_memory.png").stat().st_size > 0
    assert (out / "parallel_speedup_64.png").stat().st_size > 0
    assert any((out / "derived_metrics").glob("*.csv"))


def test_too_many_series_dropped_loudly(tmp_path, capsys):
    series = [(f"s{i}", [1.0, 2.0], [1.0, float(i + 1)]) for i in range(10)]
    p = str(tmp_path / "many.png")
    plots.line_chart(p, series, "t", "x", "y")
    assert _png_dims(p)[0] > 0
    assert "dropped" in capsys.readouterr().out


def test_analyze_reads_heterogeneous_reference_schemas(tmp_path, monkeypatch):
    """The reference's own CSVs disagree per stage/language (no algo or
    threads columns, memory column name varies); analyze must normalize
    and union them (mirrors Stage 1 visualizer's mem_map)."""
    (tmp_path / "results_c.csv").write_text(
        "lang,size,repeats,avg_time_ms,rss_now_mb,rss_peak_mb,allocated_mb\n"
        "c,64,3,0.183,3.85,3.85,0.09\nc,128,3,1.4,3.9,4.0,0.1\n"
    )
    (tmp_path / "results_python.csv").write_text(
        "lang,size,repeats,avg_time_ms,psutil_rss_mb_now,psutil_vms_mb_now,psutil_peak_rss_mb,tracemalloc_peak_mib\n"
        "python,64,3,71.5,22.1,13.7,23.7,0.52\npython,128,3,580.1,22.9,13.9,24.1,0.6\n"
    )
    (tmp_path / "results_java_par.csv").write_text(
        "lang,size,threads,repeats,avg_time_ms,speedup,efficiency,memory_mb\n"
        "java,64,1,3,29.0,1.0,1.0,6.05\njava,64,4,3,9.1,1.0,0.25,7.2\n"
    )
    out = tmp_path / "report"
    from matrix_multiplication_bigdata_ind_assignments_spark.__main__ import main

    monkeypatch.setattr(
        sys, "argv", ["mmbd", "analyze", str(tmp_path / "results_*.csv"), "--out", str(out)]
    )
    assert main() == 0
    assert (out / "mm_perf_time.png").stat().st_size > 0
    assert (out / "mm_perf_memory.png").stat().st_size > 0  # all three mem col variants coalesced
    import pandas as pd

    csvs = list((out / "derived_metrics").glob("*.csv"))
    pdf = pd.concat([pd.read_csv(c) for c in csvs])
    assert set(pdf["lang"]) == {"c", "python", "java"}
    assert set(pdf["algo"]) == {"basic"}  # defaulted where the column was absent
    assert pdf["rss_mb"].notna().all()
    # derived speedup over the java thread sweep is REAL, not the broken 1.0
    jv = pdf[(pdf["lang"] == "java") & (pdf["threads"] == 4)]
    assert abs(float(jv["speedup"].iloc[0]) - 29.0 / 9.1) < 0.01


def test_run_cli_writes_harness_csv_then_analyze_consumes_it(tmp_path, monkeypatch):
    """The reference user journey end-to-end: `run` benchmarks a kernel and
    writes the harness-schema CSV; `analyze` consumes that same file."""
    out_csv = tmp_path / "results_pyspark.csv"
    from matrix_multiplication_bigdata_ind_assignments_spark.__main__ import main

    monkeypatch.setattr(
        sys,
        "argv",
        ["mmbd", "run", "64", "--algo", "basic", "-r", "1",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(out_csv)],
    )
    assert main() == 0
    lines = out_csv.read_text().strip().split("\n")
    assert lines[0] == (
        "lang,algo,size,threads,repeats,avg_time_ms,rss_mb,"
        "exec_peak_mb,shuffle_read_mb,shuffle_write_mb,extra"
    )
    cells = lines[1].split(",")
    assert cells[0] == "pyspark" and cells[1] == "basic" and int(cells[2]) == 64
    assert float(cells[5]) > 0  # a real timing

    report = tmp_path / "report"
    monkeypatch.setattr(sys, "argv", ["mmbd", "analyze", str(out_csv), "--out", str(report)])
    assert main() == 0
    assert any((report / "derived_metrics").glob("*.csv"))


def test_run_cli_records_per_node_resources(tmp_path, monkeypatch):
    """`run` must emit per-executor peak memory + shuffle read/write per
    benched size (VERDICT r11 item 8 — the Stage-4 per-node resource
    reporting), and `analyze` must carry those columns into the derived
    table; the reference-shaped fixture corpus, which lacks them, must
    keep q_analyze_derived's schema (and oracle) unchanged."""
    import csv as csvmod

    out_csv = tmp_path / "results_pyspark.csv"
    from matrix_multiplication_bigdata_ind_assignments_spark.__main__ import main

    monkeypatch.setattr(
        sys,
        "argv",
        ["mmbd", "run", "64", "--algo", "basic", "-r", "1",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(out_csv)],
    )
    assert main() == 0
    with open(out_csv) as f:
        rows = list(csvmod.DictReader(f))
    assert rows
    for col in ("exec_peak_mb", "shuffle_read_mb", "shuffle_write_mb"):
        assert col in rows[0], col
    # shuffle bytes are a plan property — the COO join must move >0 MB
    assert float(rows[0]["shuffle_write_mb"]) > 0

    out = tmp_path / "report"
    monkeypatch.setattr(sys, "argv", ["mmbd", "analyze", str(out_csv), "--out", str(out)])
    assert main() == 0
    derived_csv = next((out / "derived_metrics").glob("*.csv"))
    with open(derived_csv) as f:
        dcols = f.readline().strip().split(",")
    for col in ("exec_peak_mb", "shuffle_read_mb", "shuffle_write_mb"):
        assert col in dcols, col

    # reference-shaped corpus: schema unchanged (no node columns)
    from matrix_multiplication_bigdata_ind_assignments_spark import registry

    registry._load_all()
    from matrix_multiplication_bigdata_ind_assignments_spark.session import get_spark

    spark = get_spark("tests", cpus=8)
    df = registry.REGISTRY["q_analyze_derived"].fn(spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "lang", "algo", "size", "threads", "avg_time_ms", "rss_mb",
        "speedup", "efficiency",
    ]
