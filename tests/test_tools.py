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


def test_translate_mtranslate_variant(tmp_path):
    """The ray/mtranslate translation variant (reference
    data/translate_cc12m_captions_mTranslate.py) end-to-end on the offline
    identity backend: per-row fan-out, train/val split, JSON schema.

    Driven as a subprocess: the tool's spawn pool pickles its worker function
    by module name, which requires the script to actually be __main__ (an
    importlib-loaded copy under a synthetic name would hang the pool's task
    handler on the child-side ModuleNotFoundError)."""
    import json
    import subprocess

    tool = os.path.join(ROOT, "tools/data/translate_mtranslate.py")
    tsv = tmp_path / "images-list-clean.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["image_file", "caption", "url"])
        for i in range(10):
            w.writerow([f"img{i}.jpg", f"a caption {i}", f"http://x/{i}"])
    env = dict(os.environ, JAX_PLATFORMS="cpu")  # tool never imports jax; belt+braces
    proc = subprocess.run(
        [sys.executable, tool, "--tsv", str(tsv), "--out", str(tmp_path),
         "--backend", "identity", "--lang_list", "fr", "es", "de",
         "--workers", "2", "--val_split", "0.2"],
        capture_output=True, text=True, timeout=120, env=env)
    assert proc.returncode == 0, proc.stderr
    train = json.loads((tmp_path / "train.json").read_text())
    val = json.loads((tmp_path / "val.json").read_text())
    # 10 inputs x (en + 3 langs), split 8/2
    assert len(train) == 8 * 4 and len(val) == 2 * 4
    by_lang = {}
    for row in train + val:
        assert set(row) == {"image_file", "caption", "url", "lang_id"}
        by_lang.setdefault(row["lang_id"], []).append(row)
    assert set(by_lang) == {"en", "fr", "es", "de"}
    # English rows pass through untranslated; others are backend-tagged
    assert all(r["caption"].startswith("a caption") for r in by_lang["en"])
    assert all(r["caption"].startswith("fr:a caption") for r in by_lang["fr"])
    # no input row was lost or duplicated across the split
    files = sorted(r["image_file"] for r in train + val if r["lang_id"] == "en")
    assert files == sorted(f"img{i}.jpg" for i in range(10))


def test_bench_loader_imports():
    bl = _load(os.path.join(ROOT, "tools/bench_loader.py"), "bl_tool")
    assert callable(bl.main)
