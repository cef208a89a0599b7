"""Flax model zoo for K3M: streams, co-attention, tri-pass encoder, heads.

Mirrors the capabilities of reference `vilbert_k3m/vilbert_k3m.py` with a
TPU-first design (static shapes, fused attention, vectorized structure
aggregation).
"""

from k3m_tpu.model.layers import (  # noqa: F401
    BertEmbeddings,
    ImageEmbeddings,
    TextLayer,
    ImageLayer,
)
from k3m_tpu.model.coattention import ConnectionLayer, ConnectionLayerTwoText  # noqa: F401
from k3m_tpu.model.encoder import TriStreamEncoder  # noqa: F401
from k3m_tpu.model.pretrain import K3MForPretraining  # noqa: F401
from k3m_tpu.model.alignment import K3MForItemAlignment  # noqa: F401
