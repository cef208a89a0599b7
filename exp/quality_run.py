"""End-to-end learning demonstration (QUALITY.md): the reference's own
de-facto validation (SURVEY §4) driven through the real CLIs on the TPU.

  1. bundled 499-sample corpus -> feature records (zero-box fallback)
  2. category-based item-alignment pairs (same leaf category = aligned)
  3. pretrain.py, 5 epochs, reference hyperparams (run_pretrain.sh)
  4. finetune.py --do_train --do_eval --do_pred from the pretrained ckpt
  5. assemble QUALITY.md: per-epoch pretrain losses + threshold-sweep F1

Usage: python exp/quality_run.py [workdir]  (defaults /tmp/k3m_quality)
       python exp/quality_run.py --extract [workdir]
           the REAL-extractor variant (VERDICT r2 item 5): deterministic
           synthetic product images -> `prepare --extract_features` through
           the on-chip JAX Faster R-CNN (make_batched_extractor) -> pretrain
           on those records -> assert the masked-RoI KL loss learns. Closes
           the vision->records->training seam end-to-end the way the
           reference's data_prepare.py:496-516 drives detectron2.
       python exp/quality_run.py --fixbugs [workdir]
           rerun pretrain with config.fix_reference_bugs=true and append a
           replicated-vs-fixed loss table to QUALITY.md (VERDICT r2 item 8).
"""
import ast
import itertools
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
MODE_EXTRACT = "--extract" in sys.argv
MODE_FIXBUGS = "--fixbugs" in sys.argv
WORK = ARGS[0] if ARGS else "/tmp/k3m_quality"
RAW = "/root/reference/data/raw_multidata_of_product_preatrain.small_{}"


def _dup(item):
    """Simulated duplicate listing: same product, different seller copy —
    title truncated to ~70% and pv segments rotated. Learnable alignment
    signal with non-trivial surface divergence."""
    out = dict(item)
    t = item["title"]
    out["title"] = t[: max(4, int(len(t) * 0.7))]
    segs = item["pv"].split("#;#")
    out["pv"] = "#;#".join(segs[1:] + segs[:1]) if len(segs) > 1 else item["pv"]
    out["item_id"] = f"{item['item_id']}_dup"
    return out


def _synthetic_rois(item, proj, rng, n_boxes=6, n_cls=1601, dim=2048):
    """Learnable stand-in for real detector output (no product images ship
    with the corpus): every region of an item carries a class drawn near a
    category-derived base class; features are a fixed projection of the
    class plus noise and cls_prob is peaked on it. A masked region's
    cls_prob is then predictable from sibling regions + title text, so the
    masked-RoI KL loss (visual_target=0) has real signal to learn."""
    import numpy as np
    base = (hash(item["category"]) % (n_cls - 2)) + 1   # skip background 0
    classes = [(base + rng.integers(0, 3)) % (n_cls - 1) + 1
               for _ in range(n_boxes)]
    cls_prob = np.full((n_boxes, n_cls), 0.2 / (n_cls - 1), np.float32)
    for i, c in enumerate(classes):
        cls_prob[i, c] = 0.8
    feats = (proj[np.asarray(classes)]
             + 0.05 * rng.standard_normal((n_boxes, dim))).astype(np.float32)
    x1 = rng.uniform(0, 60, n_boxes)
    y1 = rng.uniform(0, 60, n_boxes)
    boxes = np.stack([x1, y1, x1 + rng.uniform(20, 40, n_boxes),
                      y1 + rng.uniform(20, 40, n_boxes)], 1).astype(np.float32)
    return dict(image_h=100, image_w=100, num_boxes=n_boxes,
                boxes=boxes, features=feats, cls_prob=cls_prob)


def build_data():
    from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
    from k3m_tpu.data.records import write_records
    import numpy as np
    os.makedirs(f"{WORK}/data", exist_ok=True)
    feats = {}
    items = {}
    roi_rng = np.random.default_rng(42)
    proj = roi_rng.standard_normal((1601, 2048)).astype(np.float32)
    for split in ("train", "valid"):
        raw = list(parse_raw_tsv(RAW.format(split)))
        items[split] = raw
        recs = list(build_feature_records(
            raw, extractor=lambda it: _synthetic_rois(it, proj, roi_rng),
            image_dir="synthetic"))
        feats[split] = {str(r["item_id"]): r for r in recs}
        write_records(f"{WORK}/data/{split}_feat.k3mr", iter(recs))

    def pair_records(src_items, feat_map, rng):
        dup_feats = {}
        for it in src_items:
            d = _dup(it)
            base = feat_map[str(it["item_id"])]
            rec = dict(base)
            rec.update(item_id=d["item_id"], title=d["title"], pv=d["pv"])
            dup_feats[d["item_id"]] = rec
        ids = [str(it["item_id"]) for it in src_items]
        out = []
        for i, it in enumerate(src_items):
            iid = str(it["item_id"])
            out.append(dict(label=1.0, item1=feat_map[iid],
                            item2=dup_feats[f"{iid}_dup"]))
            j = int(rng.integers(0, len(ids) - 1))
            other = ids[j if j < i else j + 1]
            out.append(dict(label=0.0, item1=feat_map[iid],
                            item2=feat_map[other]))
        return out

    rng = np.random.default_rng(0)
    splits = dict(train=items["train"], valid=items["valid"][:50],
                  test=items["valid"][50:])
    for split, src in splits.items():
        feat = feats["train"] if split == "train" else feats["valid"]
        pairs = pair_records(src, feat, rng)
        write_records(f"{WORK}/data/{split}_item_alignment.k3mr", iter(pairs))
        print(f"{split}: {len(pairs)} pairs", flush=True)


def build_images(items, img_dir, seed=11):
    """Deterministic synthetic product photos, category-correlated: each
    category gets a base hue; every item draws 3-6 solid shapes in jittered
    category colors on a tinted background. RoI features extracted from
    these by the (deterministic) JAX FRCNN therefore correlate with
    category/title, giving the masked-RoI loss real signal — the same role
    product photos play for the reference."""
    import hashlib

    import cv2
    import numpy as np
    os.makedirs(img_dir, exist_ok=True)
    for it in items:
        h = int(hashlib.md5(str(it["item_id"]).encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed + h)
        ch = int(hashlib.md5(it["category"].encode()).hexdigest()[:6], 16)
        base = np.array([(ch >> 16) & 255, (ch >> 8) & 255, ch & 255],
                        np.int32)
        img = np.full((240, 320, 3), 255, np.uint8)
        img[:] = (255 - base // 4).astype(np.uint8)
        for _ in range(int(rng.integers(3, 7))):
            x1, y1 = int(rng.integers(0, 240)), int(rng.integers(0, 160))
            w, hgt = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            color = tuple(int(c) for c in
                          np.clip(base + rng.integers(-30, 31, 3), 0, 255))
            if rng.random() < 0.5:
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + hgt), color, -1)
            else:
                cv2.circle(img, (x1 + w // 2, y1 + hgt // 2), w // 2,
                           color, -1)
        name = it["image_url"].split("/")[-1] or f"{it['item_id']}.jpg"
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            name += ".jpg"
        cv2.imwrite(os.path.join(img_dir, name), img)


def main_extract(n_items=96, epochs=4):
    """--extract: real JAX FRCNN drives the quality pipeline end-to-end."""
    from k3m_tpu.data.prepare import parse_raw_tsv
    os.makedirs(f"{WORK}/data_x", exist_ok=True)
    items = list(parse_raw_tsv(RAW.format("train")))[:n_items]
    # images named by url basename (the extractor's lookup rule); items
    # also need a truncated raw TSV so prepare sees exactly these
    raw_path = f"{WORK}/data_x/raw_{n_items}.tsv"
    with open(RAW.format("train"), encoding="utf-8", errors="ignore") as f:
        lines = [ln for ln in f if len(ln.strip().split("\t")) == 5]
    with open(raw_path, "w", encoding="utf-8") as f:
        f.writelines(lines[:n_items])
    img_dir = f"{WORK}/images"
    build_images(items, img_dir)

    # on-chip batched extraction through the SAME CLI surface the reference
    # uses (data_prepare.py:496-516); random-init R101-C4 weights (no caffe
    # pkl ships here) are still a fixed deterministic feature map, so the
    # extracted cls_prob soft labels correlate with image content
    run([sys.executable, "-m", "k3m_tpu.data.prepare",
         "--input", raw_path, "--output", f"{WORK}/data_x/train_feat.k3mr",
         "--image_dir", img_dir, "--extract_features",
         "--extract_batch_size", "4"], f"{WORK}/extract.log")

    pre_out = f"{WORK}/pretrain_extract_out"
    run([sys.executable, "pretrain.py", "--data_dir", f"{WORK}/data_x",
         "--output_dir", pre_out, "--file_name", "{}_feat.k3mr",
         "--config_file", "bert_base_6layer_6conect.json",
         "--train_batch_size", "48", "--learning_rate", "1e-4",
         "--num_train_epochs", str(epochs), "--micro_steps", "2", "--bf16",
         "--use_image", "--warmup_proportion", "0.1", "--log_steps", "1"],
        f"{WORK}/pretrain_extract.log")
    assemble_extract(n_items, epochs)


def assemble_extract(n_items, epochs):
    """Append the real-extractor section to QUALITY.md."""
    mfile = f"{WORK}/pretrain_extract_out/metrics.jsonl"
    rows = [json.loads(ln) for ln in open(mfile)] if os.path.exists(mfile) \
        else []
    xlog = open(f"{WORK}/extract.log").read() \
        if os.path.exists(f"{WORK}/extract.log") else ""
    wrote = re.search(r"wrote (\d+) records", xlog)
    lines = ["", "## Real extractor (on-chip JAX Faster R-CNN)", "",
             f"`python exp/quality_run.py --extract` — {n_items} "
             "deterministic synthetic product images (category-correlated "
             "shapes/colors) -> `prepare --extract_features "
             "--extract_batch_size 4` through `make_batched_extractor` "
             "(R101-C4 + RPN + RoIAlign + adaptive NMS, all JAX, on the "
             "TPU) -> K3MR records -> `pretrain.py --use_image` "
             f"{epochs} epochs. "
             f"Extraction: `{wrote.group(0) if wrote else 'see log'}`.", ""]
    if rows:
        lines += ["| step | loss | masked_img_loss (KL) |", "|---|---|---|"]
        for r in rows:
            lines.append(f"| {r.get('step', '?')} | "
                         f"{r.get('loss', float('nan')):.3f} | "
                         f"{r.get('masked_img_loss', float('nan')):.4f} |")
        first = rows[0].get("masked_img_loss")
        last = rows[-1].get("masked_img_loss")
        if first and last:
            lines += ["", f"masked-RoI KL: {first:.4f} -> {last:.4f} "
                          f"({'LEARNS' if last < first else 'no improvement'}"
                          ") — the vision->records->training seam is closed "
                          "with the real extractor in the loop."]
    _append_quality(lines)


def _append_quality(lines):
    path = os.path.join(REPO, "QUALITY.md")
    existing = open(path).read() if os.path.exists(path) else "# QUALITY\n"
    marker = lines[1] if len(lines) > 1 else None
    if marker and marker in existing:   # regenerating: replace the section
        existing = existing.split(marker)[0].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(existing.rstrip() + "\n" + "\n".join(lines) + "\n")
    print("QUALITY.md updated", flush=True)


def main_fixbugs(epochs=5):
    """--fixbugs: demonstrate config.fix_reference_bugs end-to-end
    (VERDICT r2 item 8). Train the standard quality pretrain twice —
    replicated-bugs (default) and fixed — and append a per-epoch loss
    table. The four replicated sites: inverted LPM margin sign
    (model/structure.py), cosine-probs using item1 twice
    (model/alignment.py), stale zero-pv aggregator state
    (model/structure.py:113-128), roberta position-id offset
    (model/layers.py:280-287)."""
    if not os.path.exists(f"{WORK}/data/train_feat.k3mr"):
        build_data()
    outs = {}
    for variant, extra in (("replicated", []),
                           ("fixed", ["--fix_reference_bugs"])):
        out = f"{WORK}/pretrain_{variant}_out"
        run([sys.executable, "pretrain.py", "--data_dir", f"{WORK}/data",
             "--output_dir", out, "--file_name", "{}_feat.k3mr",
             "--config_file", "bert_base_6layer_6conect.json",
             "--train_batch_size", "96", "--learning_rate", "1e-4",
             "--num_train_epochs", str(epochs), "--micro_steps", "3",
             "--bf16", "--use_image", "--warmup_proportion", "0.1",
             "--log_steps", "2", "--do_eval"] + extra,
            f"{WORK}/pretrain_{variant}.log")
        outs[variant] = out
    assemble_fixbugs(outs, epochs)


def assemble_fixbugs(outs, epochs):
    tables = {}
    for variant, out in outs.items():
        log = open(f"{WORK}/pretrain_{variant}.log").read()
        vals = re.findall(r"epoch (\d+) eval: ({.*})", log)
        rows = {}
        for e, d in vals:
            try:
                # literal_eval, not eval: the value is scraped from a log
                # file — treat it as data, never as code
                rows[int(e)] = ast.literal_eval(d)
            except Exception:
                pass
        tables[variant] = rows
    lines = ["", "## fix_reference_bugs: replicated vs fixed semantics", "",
             "`python exp/quality_run.py --fixbugs` — identical data/"
             "hyperparams/seed, only `config.fix_reference_bugs` differs. "
             "Replicated bugs (default, bit-parity with the reference): "
             "inverted LPM margin sign, cosine-probs item1-twice, stale "
             "zero-pv aggregator state, roberta position-id offset. "
             "Fixed semantics must learn at least as well:", "",
             "| epoch | val_loss (replicated) | val_loss (fixed) | "
             "val_loss_struc (repl) | val_loss_struc (fixed) |",
             "|---|---|---|---|---|"]
    eps = sorted(set(tables.get("replicated", {})) |
                 set(tables.get("fixed", {})))
    for e in eps:
        r = tables.get("replicated", {}).get(e, {})
        x = tables.get("fixed", {}).get(e, {})
        lines.append(
            f"| {e} | {r.get('val_loss', float('nan')):.4f} | "
            f"{x.get('val_loss', float('nan')):.4f} | "
            f"{r.get('val_loss_struc', float('nan')):.4f} | "
            f"{x.get('val_loss_struc', float('nan')):.4f} |")
    if eps:
        e = eps[-1]
        r = tables["replicated"].get(e, {}).get("val_loss")
        x = tables["fixed"].get(e, {}).get("val_loss")
        if r is not None and x is not None:
            verdict = "fixed <= replicated" if x <= r * 1.02 else \
                "fixed LAGS replicated — investigate"
            lines += ["", f"Final-epoch val_loss: replicated {r:.4f} vs "
                          f"fixed {x:.4f} ({verdict})."]
    _append_quality(lines)


def run(cmd, log):
    print("+", " ".join(cmd), flush=True)
    with open(log, "w") as f:
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, env={**os.environ})
    if r.returncode:
        print(open(log).read()[-3000:])
        raise SystemExit(f"failed: {cmd}")


def main():
    build_data()
    pre_out = f"{WORK}/pretrain_out"
    run([sys.executable, "pretrain.py", "--data_dir", f"{WORK}/data",
         "--output_dir", pre_out, "--file_name", "{}_feat.k3mr",
         "--config_file", "bert_base_6layer_6conect.json",
         "--train_batch_size", "96", "--learning_rate", "1e-4",
         "--num_train_epochs", "5", "--micro_steps", "3", "--bf16",
         "--use_image",   # run_pretrain.sh:20 — without it the masked-RoI
                          # loss is hard-zeroed no matter what the data has
         "--warmup_proportion", "0.1", "--log_steps", "2", "--do_eval"],
        f"{WORK}/pretrain.log")
    # export the final epoch's params as a reference-format .bin — the same
    # pretrain->finetune handoff the reference uses (torch.save per epoch,
    # from_pretrained partial load)
    latest = json.load(open(f"{pre_out}/latest.json"))["epoch"]
    bin_path = f"{pre_out}/pytorch_model.bin"
    run([sys.executable, "-m", "k3m_tpu.train.convert", "export",
         "--params", f"{pre_out}/epoch_{latest}/params.msgpack",
         "--out", bin_path], f"{WORK}/export.log")
    ft_out = f"{WORK}/finetune_out"
    run([sys.executable, "finetune.py", "--data_dir", f"{WORK}/data",
         "--output_dir", ft_out,
         "--file_train", "train_item_alignment.k3mr",
         "--file_valid", "valid_item_alignment.k3mr",
         "--file_test", "test_item_alignment.k3mr",
         "--pretrained_model_path", bin_path,
         "--do_train", "--do_eval", "--do_pred",
         "--train_batch_size", "32", "--learning_rate", "5e-5",
         "--num_train_epochs", "6", "--bf16", "--log_steps", "5"],
        f"{WORK}/finetune.log")
    assemble()


def assemble():
    lines = ["# QUALITY — end-to-end learning on the real chip",
             "",
             "Full pipeline driven through the CLIs on 1x TPU v5e: bundled "
             "499-sample corpus -> `prepare` feature records (synthetic "
             "category-correlated RoI features — no product images ship "
             "with the corpus — so the masked-RoI KL loss has real signal; "
             "see `exp/quality_run.py:_synthetic_rois`) -> "
             "`pretrain.py` (reference hyperparams: batch 96, lr 1e-4, "
             "bf16, 5 epochs) -> `finetune.py` item alignment "
             "(category-derived pairs) -> threshold-sweep eval -> "
             "`--do_pred` jsonl. Logs: exp/quality artifacts in the run "
             "workdir; regenerate with `python exp/quality_run.py`.",
             "", "## Pretrain loss (per epoch)", ""]
    mfile = f"{WORK}/pretrain_out/metrics.jsonl"
    rows = []
    if os.path.exists(mfile):
        for ln in open(mfile):
            rows.append(json.loads(ln))
    if rows:
        keys = ["loss", "masked_lm_loss", "masked_img_loss",
                "masked_lm_loss_pv", "loss_struc"]
        lines.append("| step | " + " | ".join(keys) + " |")
        lines.append("|" + "---|" * (len(keys) + 1))
        for r in rows:
            lines.append("| {} | ".format(r.get("step", "?")) + " | ".join(
                f"{r.get(k, float('nan')):.3f}" for k in keys) + " |")
    log = open(f"{WORK}/pretrain.log").read()
    ep = re.findall(r"epoch (\d+) step (\d+) loss ([\d.]+)", log)
    if ep:
        lines += ["", "Last logged step per epoch:", ""]
        last = {}
        for e, s, v in ep:
            last[int(e)] = (int(s), float(v))
        lines.append("| epoch | step | loss |")
        lines.append("|---|---|---|")
        for e in sorted(last):
            lines.append(f"| {e} | {last[e][0]} | {last[e][1]:.3f} |")
    vals = re.findall(r"epoch (\d+) eval: ({.*})", log)
    if vals:
        lines += ["", "Validation (epoch -> val_loss):", ""]
        for e, d in vals:
            lines.append(f"- epoch {e}: `{d}`")
    lines += ["", "## Item-alignment threshold sweep (valid)", ""]
    ft = open(f"{WORK}/finetune.log").read()
    rows = re.findall(r"\[Epoch-(\d+)\] threshold=([\d.]+) precision=([\d.]+)"
                      r" recall=([\d.]+) f1=([\d.]+)", ft)
    if rows:
        lines += ["Validation F1 at threshold 0.5 per finetune epoch "
                  "(learning dynamics):", "",
                  "| epoch | precision | recall | f1 |", "|---|---|---|---|"]
        for e, t, p, r, f1 in rows:
            if t == "0.5":
                lines.append(f"| {e} | {p} | {r} | {f1} |")
        last_epoch = max(int(e) for e, *_ in rows)
        lines += ["", f"Final epoch ({last_epoch}) full sweep:"]
        lines += ["", "| threshold | precision | recall | f1 |",
                  "|---|---|---|---|"]
        for e, t, p, r, f1 in rows:
            if int(e) == last_epoch:
                lines.append(f"| {t} | {p} | {r} | {f1} |")
        best = max((float(f1), int(e), float(t)) for e, t, _, _, f1 in rows)
        lines += ["", f"Best F1 across epochs: {best[0]:.4f} "
                      f"(epoch {best[1]}, threshold {best[2]})"]
    preds = [f for f in os.listdir(f"{WORK}/finetune_out")
             if f.startswith("deepAI_result")] \
        if os.path.isdir(f"{WORK}/finetune_out") else []
    lines += ["", f"Prediction output: `{preds}`", ""]
    with open(os.path.join(REPO, "QUALITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("QUALITY.md written", flush=True)


if __name__ == "__main__":
    if MODE_EXTRACT:
        main_extract()
    elif MODE_FIXBUGS:
        main_fixbugs()
    else:
        main()
