"""Conceptual-Captions image downloader with resume (host-side data tool).

Capability parity with reference data/download_data.py (multiprocessing image
fetcher, shelve-based chunk resume, crc32-named files, content validation,
per-split report TSV) rebuilt cleanly:

- thread pool per chunk (downloads are IO-bound; threads beat the reference's
  256 *processes* on memory),
- resume via an append-only report TSV: already-reported rows are skipped on
  restart (no shelve),
- files named <crc32(url)>_<basename> like the reference (data/
  download_data.py:72-77), validated by actually decoding with PIL rather
  than trusting mimetypes.

Usage:
  python tools/data/download.py --tsv cc12m.tsv --out images/ \
      --split train --workers 64 [--limit N]
TSV columns: caption \t url   (CC12M layout).
"""

from __future__ import annotations

import argparse
import csv
import io
import os
import zlib
from concurrent.futures import ThreadPoolExecutor

MAX_BYTES = 20 * 1024 * 1024


def _filename(url: str) -> str:
    base = url.split("/")[-1].split("?")[0][-40:] or "img"
    safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in base)
    return f"{zlib.crc32(url.encode()) & 0xFFFFFFFF:08x}_{safe}"


def _validate(data: bytes) -> None:
    """Raise if ``data`` is not a decodable image.  JPEG payloads go through
    the native off-GIL validator when the library is built (full entropy
    decode at 1/8 DCT scale — mic_validate_jpeg, native/fast_decode.cc), so
    the download thread pool scales across cores instead of serializing on
    PIL's GIL-held decode; everything else (PNG, grayscale JPEG fallbacks)
    still PIL-decodes."""
    if data[:3] == b"\xff\xd8\xff":
        try:
            from mic_tpu.data.native import validate_jpeg
        except ImportError:  # run outside the repo root
            validate_jpeg = lambda _: None  # noqa: E731
        if validate_jpeg(data):
            return
        # native unavailable, or it says corrupt — let PIL arbitrate (its
        # error is what callers catch)
    from PIL import Image

    Image.open(io.BytesIO(data)).convert("RGB")


def fetch_one(row_id: int, caption: str, url: str, out_dir: str):
    import requests

    name = _filename(url)
    path = os.path.join(out_dir, name)
    try:
        if not os.path.exists(path):
            resp = requests.get(
                url, timeout=10, stream=True,
                headers={"User-Agent": "cc-downloader/1.0"},
            )
            resp.raise_for_status()
            data = resp.raw.read(MAX_BYTES + 1, decode_content=True)
            if len(data) > MAX_BYTES:
                raise ValueError("too large")
            _validate(data)
            with open(path, "wb") as f:
                f.write(data)
        return (row_id, name, caption, url, 200)
    except Exception:
        return (row_id, "", caption, url, 408)  # reference's failure marker


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tsv", required=True, help="caption \\t url TSV")
    parser.add_argument("--out", required=True, help="image output directory")
    parser.add_argument("--split", default="train")
    parser.add_argument("--workers", type=int, default=64)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    report_path = os.path.join(args.out, f"downloaded_{args.split}_report.tsv")

    done: set[int] = set()
    if os.path.exists(report_path):  # resume: skip already-reported rows
        with open(report_path, newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if row:
                    done.add(int(row[0]))
        print(f"resuming: {len(done)} rows already processed")

    todo = []
    with open(args.tsv, newline="") as f:
        for i, row in enumerate(csv.reader(f, delimiter="\t")):
            if args.limit is not None and i >= args.limit:
                break
            if i in done or len(row) < 2:
                continue
            todo.append((i, row[0], row[1]))

    ok = fail = 0
    with open(report_path, "a", newline="") as rep, ThreadPoolExecutor(
        args.workers
    ) as pool:
        writer = csv.writer(rep, delimiter="\t")
        futures = [
            pool.submit(fetch_one, i, cap, url, args.out) for i, cap, url in todo
        ]
        for n, fut in enumerate(futures):
            row = fut.result()
            writer.writerow(row)
            ok += row[4] == 200
            fail += row[4] != 200
            if (n + 1) % 1000 == 0:
                rep.flush()
                print(f"{n+1}/{len(todo)} ok={ok} fail={fail}")
    print(f"done: ok={ok} fail={fail} report={report_path}")


if __name__ == "__main__":
    main()
