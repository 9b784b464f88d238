"""Data pipeline tests: tokenizer protocol, TSV dataset, loader determinism
and resumability."""

import numpy as np

from mic_tpu.data.dataset import CaptionDataset
from mic_tpu.data.loader import CaptionLoader
from mic_tpu.data.tokenizer import SimpleTokenizer
import pytest


def test_simple_tokenizer_format_and_roundtrip(tmp_path):
    tk = SimpleTokenizer()
    out = tk.encode_targets(["A red cat", "le chat rouge"], ["en_XX", "fr_XX"], 8)
    ids, mask = out["input_ids"], out["attention_mask"]
    # mBART-50 target layout: [lang_code] tokens [eos] [pad]*
    assert ids[0, 0] == tk.lang_code_to_id["en_XX"]
    assert ids[1, 0] == tk.lang_code_to_id["fr_XX"]
    assert ids[0, int(mask[0].sum()) - 1] == tk.eos_token_id
    assert np.all(ids[0, int(mask[0].sum()):] == tk.pad_token_id)
    assert tk.decode(ids[0]) == "a red cat"

    # persistence round-trip
    path = tmp_path / "tok.json"
    tk.save(str(path))
    tk2 = SimpleTokenizer.load(str(path))
    assert tk2.decode(ids[1]) == "le chat rouge"
    out2 = tk2.encode_targets(["le chat rouge"], ["fr_XX"], 8)
    np.testing.assert_array_equal(out2["input_ids"][0], ids[1])


def test_truncation_keeps_eos():
    tk = SimpleTokenizer()
    out = tk.encode_targets(["one two three four five six"], ["en_XX"], 4)
    ids = out["input_ids"][0]
    assert ids[-1] == tk.eos_token_id
    assert out["attention_mask"][0].sum() == 4


def make_tsv(tmp_path, n=10):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    langs = ["en_XX", "fr_XX"]
    for i in range(n):
        name = f"i{i}.png"
        Image.fromarray(np.zeros((20, 30, 3), np.uint8)).save(img_dir / name)
        rows.append(f"{name}\tcaption {i}\turl\t{langs[i % 2]}")
    # one row with a missing image: must be filtered out
    rows.append("missing.png\tnope\turl\ten_XX")
    tsv = tmp_path / "d.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    return str(tsv), str(img_dir)


def test_dataset_filters_and_splits(tmp_path):
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    assert len(ds) == 10  # missing.png dropped
    by_lang = ds.split_by_language()
    assert set(by_lang) == {"en_XX", "fr_XX"}
    assert len(by_lang["en_XX"]) == 5


def test_loader_batches_and_determinism(tmp_path):
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()

    def collect(seed):
        loader = CaptionLoader(
            ds, tk, batch_size=4, image_size=24, max_length=6, seed=seed
        )
        return list(loader.epoch_iterator(epoch=0))

    b1, b2 = collect(1), collect(1)
    assert len(b1) == 2  # drop_last: 10 // 4
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["labels"], y["labels"])
        np.testing.assert_array_equal(x["pixel_values"], y["pixel_values"])
    assert b1[0]["pixel_values"].shape == (4, 24, 24, 3)
    assert b1[0]["pixel_values"].dtype == np.uint8
    # decoder shift: pad-prepended labels
    np.testing.assert_array_equal(
        b1[0]["decoder_input_ids"][:, 1:], b1[0]["labels"][:, :-1]
    )
    assert np.all(b1[0]["decoder_input_ids"][:, 0] == tk.pad_token_id)

    b3 = collect(2)
    assert any(
        not np.array_equal(x["labels"], y["labels"]) for x, y in zip(b1, b3)
    )


def test_loader_resume_mid_epoch(tmp_path):
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()
    loader = CaptionLoader(ds, tk, batch_size=2, image_size=24, max_length=6, seed=3)
    it = loader.epoch_iterator(epoch=0)
    first_two = [next(it), next(it)]
    del first_two
    saved = loader.state()
    assert saved == {"epoch": 0, "next_batch": 2}

    loader2 = CaptionLoader(ds, tk, batch_size=2, image_size=24, max_length=6, seed=3)
    loader2.set_state(saved)
    resumed = list(loader2.epoch_iterator())
    full = list(
        CaptionLoader(ds, tk, batch_size=2, image_size=24, max_length=6, seed=3)
        .epoch_iterator(epoch=0)
    )
    assert len(resumed) == len(full) - 2
    for x, y in zip(resumed, full[2:]):
        np.testing.assert_array_equal(x["labels"], y["labels"])


@pytest.mark.slow
def test_loader_multiprocess_matches_sync(tmp_path):
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()
    tk.encode_targets([f"caption {i}" for i in range(10)], ["en_XX"] * 10, 6)
    tk.freeze()  # vocab must be fixed before forking workers
    kw = dict(batch_size=4, image_size=24, max_length=6, seed=1)
    sync = list(CaptionLoader(ds, tk, **kw).epoch_iterator(epoch=0))
    par_loader = CaptionLoader(ds, tk, num_workers=2, **kw)
    par = list(par_loader.epoch_iterator(epoch=0))
    par_loader.close()
    for x, y in zip(sync, par):
        np.testing.assert_array_equal(x["labels"], y["labels"])
        np.testing.assert_array_equal(x["pixel_values"], y["pixel_values"])


@pytest.mark.slow
def test_loader_bounded_prefetch_window(tmp_path):
    """The pool path keeps at most num_workers+prefetch batches in flight and
    still yields every batch in order; resume position stays exact."""
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()
    tk.encode_targets([f"caption {i}" for i in range(10)], ["en_XX"] * 10, 6)
    tk.freeze()
    kw = dict(batch_size=2, image_size=24, max_length=6, seed=1)
    sync = list(CaptionLoader(ds, tk, **kw).epoch_iterator(epoch=0))
    par_loader = CaptionLoader(ds, tk, num_workers=2, prefetch=3, **kw)
    it = par_loader.epoch_iterator(epoch=0)
    got = [next(it)]
    assert par_loader.state()["next_batch"] == 1
    got.extend(it)
    par_loader.close()
    assert len(got) == len(sync)
    for x, y in zip(sync, got):
        np.testing.assert_array_equal(x["labels"], y["labels"])
        np.testing.assert_array_equal(x["pixel_values"], y["pixel_values"])


@pytest.mark.slow
def test_unfrozen_tokenizer_fit_frozen_before_workers(tmp_path):
    """Regression: an unfrozen SimpleTokenizer handed to a multiprocess
    loader must be deterministically fit+frozen up front. Without it, each
    spawn worker grows its own pickled copy in batch-arrival order and the
    same word gets different ids across workers (scrambled targets —
    observed as language-mixed captions on the 4-language TPU validation
    run). Worker-produced ids must decode with the MAIN-process tokenizer
    back to the original captions."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    caps = ["a red square", "un carre rouge", "ein rotes quadrat",
            "un cuadrado rojo"]
    for i in range(16):
        name = f"i{i}.png"
        Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(img_dir / name)
        rows.append(f"{name}\t{caps[i % 4]}\turl\ten_XX")
    tsv = tmp_path / "d.tsv"
    tsv.write_text("\n".join(rows))

    ds = CaptionDataset(str(tsv), str(img_dir))
    tk = SimpleTokenizer()
    loader = CaptionLoader(
        ds, tk, batch_size=4, image_size=20, max_length=8,
        shuffle=True, seed=3, num_workers=2,
    )
    assert not tk.needs_fit  # frozen by the loader before any worker ran
    decoded = []
    for batch in loader.epoch_iterator(epoch=0):
        decoded.extend(tk.batch_decode(batch["labels"]))
    loader.close()
    assert sorted(set(decoded)) == sorted(set(caps))
