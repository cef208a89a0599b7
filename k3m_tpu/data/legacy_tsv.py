"""Legacy TSV feature files: writer/reader + record-store serializer.

Parity targets:
  * `2_generate_tsv_ali.py` — RoI-feature TSV writer. One row per image:
    FIELDNAMES = [image_id, image_w, image_h, num_boxes, boxes, features,
    cls_prob] with boxes/features/cls_prob base64-encoded float32 buffers
    (:34,146-157). The reference writes `str(base64.b64encode(...))`, i.e.
    the literal string "b'...'", and its readers strip with `[2:-1]`
    (:222-226, 3_generate_lmdb_ali.py:92-99). We write the same quirky
    framing so reference tooling can consume our TSVs, and read both the
    quirky and the clean framing.
  * `3_generate_lmdb_ali.py` — joins TSV features with caption/pv/category
    from `df_{split}.csv` keyed by image_id (:66-72) and serializes records
    [features, cls_prob, boxes, num_boxes, image_h, image_w, image_id,
    caption, pv, category] (:100). Our sink is the K3MR record store
    (k3m_tpu/data/records.py) instead of tensorpack LMDB.

The RoI extractor itself is the JAX Faster R-CNN (k3m_tpu/vision/frcnn.py);
`generate_tsv` below drives it over an image list.
"""

from __future__ import annotations

import base64
import csv
import logging
import os
import sys
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from k3m_tpu.data.records import RecordWriter

logger = logging.getLogger(__name__)

FIELDNAMES = ["image_id", "image_w", "image_h", "num_boxes", "boxes",
              "features", "cls_prob"]


def _b64(arr: np.ndarray) -> str:
    # reference quirk: str(bytes) -> "b'...'" (2_generate_tsv_ali.py:153-156)
    return str(base64.b64encode(np.ascontiguousarray(arr, np.float32)
                                .tobytes()))


def _unb64(s: str, dtype=np.float32) -> np.ndarray:
    if s.startswith("b'") and s.endswith("'"):
        s = s[2:-1]
    return np.frombuffer(base64.b64decode(s), dtype=dtype)


def detection_to_row(det: Dict) -> Dict[str, str]:
    """Pack one extractor output (boxes/features/cls_prob ndarrays) into a
    TSV row matching get_detections_from_image's return (:146-157)."""
    return {
        "image_id": str(det["image_id"]),
        "image_h": str(int(det["image_h"])),
        "image_w": str(int(det["image_w"])),
        "num_boxes": str(int(det["num_boxes"])),
        "boxes": _b64(np.asarray(det["boxes"])),
        "features": _b64(np.asarray(det["features"])),
        "cls_prob": _b64(np.asarray(det["cls_prob"])),
    }


def write_tsv(rows: Iterable[Dict], outfile: str) -> int:
    n = 0
    with open(outfile, "w", encoding="utf-8", newline="") as f:
        writer = csv.DictWriter(f, delimiter="\t", fieldnames=FIELDNAMES)
        for det in rows:
            writer.writerow(detection_to_row(det))
            n += 1
    return n


def read_tsv(path: str) -> Iterator[Dict]:
    """Decode a feature TSV back to ndarray records (ref read_tsv :211-233)."""
    csv.field_size_limit(500 * 1024 * 1024)
    with open(path, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t", fieldnames=FIELDNAMES)
        for row in reader:
            n = int(row["num_boxes"])
            yield {
                "image_id": row["image_id"],
                "image_h": int(row["image_h"]),
                "image_w": int(row["image_w"]),
                "num_boxes": n,
                "boxes": _unb64(row["boxes"]).reshape(n, 4),
                "features": _unb64(row["features"]).reshape(n, 2048),
                "cls_prob": _unb64(row["cls_prob"]).reshape(n, 1601),
            }


def generate_tsv(image_ids: Iterable[Tuple[str, str]], image_dir: str,
                 outfile: str,
                 extractor: Optional[Callable] = None,
                 weights_path: Optional[str] = None,
                 batch_size: int = 4) -> int:
    """Run the JAX RoI extractor over (image_id, image_file) pairs and write
    the TSV (ref generate_tsv :176-208). Per-image failures are logged and
    skipped, matching the reference's try/except-continue. With
    batch_size > 1 a BatchedExtractor amortizes device round trips over
    image batches."""
    if extractor is None:
        if batch_size > 1:
            from k3m_tpu.vision.frcnn import make_batched_extractor
            extractor = make_batched_extractor(weights_path,
                                               batch_size=batch_size)
        else:
            from k3m_tpu.vision.frcnn import make_extractor
            extractor = make_extractor(image_dir, weights_path)

    def detections():
        if hasattr(extractor, "map"):
            items = ({"item_image_name": f, "image_id": i}
                     for i, f in image_ids)
            for item, det in extractor.map(items, image_dir=image_dir):
                if det is not None:
                    yield dict(det, image_id=item["image_id"])
            return
        for image_id, image_file in image_ids:
            try:
                det = extractor({"item_image_name": image_file})
            except Exception:
                logger.exception("[ERROR] image_id: %s", image_id)
                continue
            if det is not None:
                yield dict(det, image_id=image_id)

    return write_tsv(detections(), outfile)


def load_caption_index(df_csv: str) -> Dict[str, Tuple[str, str, str]]:
    """image_id -> (pv, caption, category) from a df CSV. Accepts both the
    reference's column names (image_id/caption/pv/category,
    3_generate_lmdb_ali.py:66-72) and ours (item_id/title/pv/category,
    k3m_tpu/data/index.py)."""
    out: Dict[str, Tuple[str, str, str]] = {}
    with open(df_csv, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            key = row.get("image_id") or row.get("item_id") or ""
            caption = row.get("caption") if "caption" in row else row.get("title", "")
            out[str(key)] = (row.get("pv", ""), caption or "",
                             row.get("category", ""))
    return out


def serialize_tsv_to_records(tsv_paths: List[str], df_csv: str,
                             output: str) -> int:
    """3_generate_lmdb_ali equivalent: TSV + df CSV -> K3MR records with the
    legacy field layout [features, cls_prob, boxes, num_boxes, image_h,
    image_w, image_id, caption, pv, category] (:100)."""
    index = load_caption_index(df_csv)
    n = 0
    with RecordWriter(output) as w:
        for path in tsv_paths:
            for det in read_tsv(path):
                joined = index.get(str(det["image_id"]))
                if joined is None:
                    continue
                pv, caption, category = joined
                w.write(dict(det, caption=caption, pv=pv, category=category))
                n += 1
    return n


def main(argv=None):
    import argparse

    from k3m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    ap = argparse.ArgumentParser(
        description="Legacy-path feature TSV tools (2_/3_ equivalents)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("extract", help="images -> feature TSV")
    g.add_argument("--image_list", required=True,
                   help="json of [[image_id, image_file], ...] or a directory")
    g.add_argument("--image_dir", required=True)
    g.add_argument("--weights", default=None)
    g.add_argument("--output", required=True)
    g.add_argument("--batch_size", type=int, default=4,
                   help="images per device call (1 = per-image path)")
    s = sub.add_parser("serialize", help="TSV + df csv -> K3MR records")
    s.add_argument("--tsv", nargs="+", required=True)
    s.add_argument("--df_csv", required=True)
    s.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    if args.cmd == "extract":
        import json
        if os.path.isdir(args.image_list):
            pairs = [(os.path.splitext(p)[0], p)
                     for p in sorted(os.listdir(args.image_list))]
        else:
            with open(args.image_list, "r", encoding="utf-8") as f:
                pairs = [tuple(x) for x in json.load(f)]
        n = generate_tsv(pairs, args.image_dir, args.output,
                         weights_path=args.weights,
                         batch_size=args.batch_size)
        print(f"wrote {n} rows -> {args.output}")
    else:
        n = serialize_tsv_to_records(args.tsv, args.df_csv, args.output)
        print(f"wrote {n} records -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
