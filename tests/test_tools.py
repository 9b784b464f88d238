"""Smoke tests for the data tools (import health + resume/report logic)."""

import csv
import importlib.util
import os
import sys


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_download_tool_filename_and_resume(tmp_path):
    dl = _load(os.path.join(ROOT, "tools/data/download.py"), "dl_tool")
    # crc32-prefixed, filesystem-safe names (reference data/download_data.py:72-77)
    n1 = dl._filename("http://x.com/a/b/photo.jpg?size=big")
    n2 = dl._filename("http://x.com/a/b/photo.jpg")
    assert n1.endswith("_photo.jpg") and n1 != n2
    assert "/" not in n1 and "?" not in n1

    # resume: rows present in the report are skipped
    out = tmp_path / "imgs"
    out.mkdir()
    report = out / "downloaded_train_report.tsv"
    with open(report, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow([0, "f0", "cap0", "u0", 200])
        w.writerow([2, "", "cap2", "u2", 408])
    tsv = tmp_path / "src.tsv"
    tsv.write_text("cap0\tu0\ncap1\tREFUSED://u1\ncap2\tu2\n")
    dl.main(["--tsv", str(tsv), "--out", str(out), "--split", "train",
             "--workers", "1"])
    with open(report, newline="") as f:
        rows = list(csv.reader(f, delimiter="\t"))
    # only row 1 was attempted on resume (and failed: bogus scheme -> 408)
    assert [int(r[0]) for r in rows] == [0, 2, 1]
    assert rows[2][4] == "408"


def test_translate_tool_imports():
    tr = _load(os.path.join(ROOT, "tools/data/translate.py"), "tr_tool")
    assert tr.LANGS == ("en_XX", "fr_XX", "es_XX", "de_DE")
    assert callable(tr.main) and callable(tr.load_model)


def test_bench_loader_imports():
    bl = _load(os.path.join(ROOT, "tools/bench_loader.py"), "bl_tool")
    assert callable(bl.main)
