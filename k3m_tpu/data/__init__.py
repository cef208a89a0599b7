"""Data subsystem: offline preparation + online fixed-shape batch pipeline.

Replaces the reference's tensorpack/LMDB/ZeroMQ stack
(vilbert_k3m/datasets/concept_cap_dataset_struc.py, data_prepare.py,
0_...3_*.py scripts) with a seeded numpy preprocessing core, a sharded
mmap record store, and a threaded prefetching loader that emits fixed-shape
numpy batches ready for TPU transfer.
"""

from k3m_tpu.data.preprocess import PretrainPreprocessor, PairPreprocessor  # noqa: F401
from k3m_tpu.data.records import RecordWriter, RecordReader  # noqa: F401
from k3m_tpu.data.pipeline import PretrainLoader, AlignmentLoader  # noqa: F401
